"""End-to-end mini-pretrain through the real CLI (SURVEY §4 plan): synthetic
2-stain cohort, a few epochs on CPU, artifacts + resume verified."""

import json
import os
import subprocess
import sys

import numpy as np
import pandas as pd
import pytest

from madeleine_tpu.data.io import write_bag

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _make_cohort(tmp_path, n_cases=12, d=16):
    rng = np.random.default_rng(0)
    feat_dir = tmp_path / "feats_h5"
    feat_dir.mkdir()
    rows = []
    for i in range(n_cases):
        sid = f"case{i}"
        labels = {"HE": 1, "HER2": int(rng.random() < 0.8),
                  "PGR": int(rng.random() < 0.8), "KI67": 1, "ER": 1}
        for m, lab in labels.items():
            if lab:
                n = int(rng.integers(40, 120))
                write_bag(str(feat_dir / f"{sid}_{m}.h5"),
                          rng.standard_normal((n, d)).astype(np.float32))
        rows.append({"slide_id": sid, **labels, "split": "train"})
    csv = tmp_path / "ACROBAT.csv"
    pd.DataFrame(rows).to_csv(csv, index=False)
    # downstream bags
    down = tmp_path / "downstream" / "patch_embeddings"
    down.mkdir(parents=True)
    for i in range(4):
        write_bag(str(down / f"d{i}.h5"),
                  rng.standard_normal((int(rng.integers(30, 90)), d)
                                      ).astype(np.float32))
    return str(csv), str(feat_dir), str(tmp_path / "downstream")


def _run_pretrain(tmp_path, csv, feats, down, extra=()):
    env = dict(os.environ, MADELEINE_TPU_PLATFORM="cpu", JAX_PLATFORMS="cpu")
    cmd = [
        sys.executable, os.path.join(REPO, "bin", "pretrain.py"),
        "--dataset", "ACROBAT", "--csv_fpath", csv, "--data_root_dir", feats,
        "--results_dir", str(tmp_path / "results"),
        "--patch_embedding_dim", "16", "--wsi_encoder_hidden_dim", "16",
        "--n_heads", "2", "--batch_size", "6", "--n_subsamples", "32",
        "--max_epochs", "2", "--warmup", "--warmup_epochs", "1",
        "--global_loss", "info-nce", "--local_loss", "got",
        "--temperature", "0.01", "--symmetric_cl", "--precision", "float32",
        "--mesh_shape", "1", "--downstream_dir", down,
        "--checkpoint_every", "1",
        *extra,
    ]
    return subprocess.run(cmd, capture_output=True, text=True, env=env,
                          timeout=600)


@pytest.mark.slow
def test_pretrain_cli_end_to_end(tmp_path):
    csv, feats, down = _make_cohort(tmp_path)
    r = _run_pretrain(tmp_path, csv, feats, down)
    assert r.returncode == 0, r.stderr[-3000:]
    assert "Done with training" in r.stdout

    # artifacts in the hashed results dir
    results_root = tmp_path / "results"
    (run_dir,) = list(results_root.iterdir())
    names = {p.name for p in run_dir.iterdir()}
    assert {"config.json", "model_config.txt", "model.pt",
            "model_config.json", "downstream.pkl", "train_state"} <= names

    cfg = json.load(open(run_dir / "config.json"))
    assert cfg["MODALITIES"][0] == "HE"

    # downstream pkl schema
    import pickle
    res = pickle.load(open(run_dir / "downstream.pkl", "rb"))
    assert set(res) == {"embeds", "slide_ids"}
    assert res["embeds"].shape == (4, 16)

    # the exported model.pt loads through the torch bridge
    from madeleine_tpu.models.factory import (load_torch_state_dict,
                                              state_dict_to_params)
    params = state_dict_to_params(load_torch_state_dict(str(run_dir / "model.pt")))
    assert "wsi_embedders" in params

    # ---- resume continues from the saved epoch -------------------------
    r2 = _run_pretrain(tmp_path, csv, feats, down,
                       extra=("--max_epochs", "3",
                              "--resume", str(run_dir / "train_state")))
    assert r2.returncode == 0, r2.stderr[-3000:]
    assert "Resumed from" in r2.stdout
    assert "at epoch 2" in r2.stdout


@pytest.mark.slow
def test_pretrain_cli_joint_batch_mode(tmp_path):
    """--no_modality_scan --no_remat drives the joint [bs*n_mod] embedder
    path through the real entry point (the fast production config)."""
    csv, feats, down = _make_cohort(tmp_path, n_cases=8)
    r = _run_pretrain(tmp_path, csv, feats, down,
                      extra=("--no_modality_scan", "--no_remat",
                             "--max_epochs", "1"))
    assert r.returncode == 0, r.stderr[-3000:]
    assert "Done with training" in r.stdout
    results_root = tmp_path / "results"
    (run_dir,) = list(results_root.iterdir())
    cfg = json.load(open(run_dir / "config.json"))
    assert cfg["modality_scan"] == "False" or cfg["modality_scan"] is False
    assert cfg["remat"] == "False" or cfg["remat"] is False
