"""CLI argument surface (ref: madeleine/utils/process_args.py:6-95).

Keeps the reference's flag names so launch scripts port unchanged, mapping onto
MadeleineConfig. Flags the reference parses but never uses (--early_stopping,
--scheduler, --opt, --num_workers for training) are accepted for compatibility;
--seed and --weight_decay are actually honored here (the reference hardcodes
seed 42 and torch's default decay).
"""

from __future__ import annotations

import argparse
from typing import Optional, Sequence

from madeleine_tpu.config import MadeleineConfig


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Configurations for MADELEINE-TPU")
    # ----> set up
    p.add_argument("--data_root_dir", type=str, default=None)
    p.add_argument("--dataset", type=str, default="ACROBAT")
    p.add_argument("--csv_fpath", type=str, default=None)
    p.add_argument("--results_dir", type=str, default="results")
    p.add_argument("--cohort", type=str, default="brca")
    # ----> training
    p.add_argument("--patch_embedding_dim", type=int, default=512)
    p.add_argument("--max_epochs", type=int, default=100)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--early_stopping", action="store_true", default=False)
    p.add_argument("--opt", type=str, default="adamW")
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--n_subsamples", type=int, default=-1)
    p.add_argument("--scheduler", type=str, default=None)
    p.add_argument("--num_workers", type=int, default=1)
    p.add_argument("--weight_decay", type=float, default=0.01)
    p.add_argument("--temperature", type=float, default=0.001)
    p.add_argument("--warmup", action="store_true", default=False)
    p.add_argument("--warmup_epochs", type=int, default=5)
    p.add_argument("--end_learning_rate", type=float, default=1e-8)
    p.add_argument("--num_gpus", type=int, default=1,
                   help="compat alias; use --mesh_shape for TPU device count")
    p.add_argument("--precision", type=str, default="bfloat16")
    # ----> model
    p.add_argument("--wsi_encoder", type=str, default="abmil")
    p.add_argument("--activation", type=str, default="softmax")
    p.add_argument("--wsi_encoder_hidden_dim", type=int, default=512)
    p.add_argument("--n_heads", type=int, default=4)
    p.add_argument("--add_stain_encoding", action="store_true", default=False)
    # ----> losses
    p.add_argument("--symmetric_cl", action="store_true", default=False)
    p.add_argument("--global_loss", type=str, default="-1")
    p.add_argument("--local_loss", type=str, default="-1")
    p.add_argument("--intra_modality_loss", type=str, default="-1")
    p.add_argument("--local_loss_weight", type=float, default=1.0)
    # ----> logging
    p.add_argument("--log_ml", action="store_true")
    p.add_argument("--wandb_project_name", type=str, default="MADELEINE")
    p.add_argument("--wandb_entity", type=str, default="madeleine")
    # ----> inference / resume
    p.add_argument("--pretrained", type=str, default=None)
    # ----> TPU-native extensions
    p.add_argument("--mesh_shape", type=int, default=None,
                   help="data-parallel device count (default: all devices)")
    p.add_argument("--profile_dir", type=str, default=None)
    p.add_argument("--no_remat", dest="remat", action="store_false",
                   help="keep embedder residuals (faster when HBM allows)")
    p.add_argument("--no_modality_scan", dest="modality_scan",
                   action="store_false",
                   help="joint [bs*n_mod] embedder batch instead of the "
                        "sequential modality scan (faster when it fits HBM; "
                        "pair with --no_remat)")
    p.add_argument("--checkpoint_every", type=int, default=0)
    p.add_argument("--resume", type=str, default=None,
                   help="orbax train-state dir to resume from")
    p.add_argument("--downstream_dir", type=str, default=None,
                   help="dir of bag files for post-train slide extraction")
    p.add_argument("--native_loader", type=str, default="auto",
                   choices=["auto", "on", "off"],
                   help="C++ mmap batch assembler over .bag files "
                        "(auto: when .bag files are present)")
    return p


def get_config(argv: Optional[Sequence[str]] = None) -> MadeleineConfig:
    args = build_parser().parse_args(argv)
    d = vars(args).copy()
    cfg = MadeleineConfig.from_dict(d)
    cfg.finalize()
    # carry non-config extras on the object for the CLI layer
    cfg._extras = {k: d[k] for k in ("resume", "downstream_dir", "num_gpus",
                                     "early_stopping", "opt", "scheduler",
                                     "wandb_project_name", "wandb_entity",
                                     "native_loader")}
    return cfg
