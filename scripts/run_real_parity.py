#!/usr/bin/env python
"""One-shot runbook for the network-gated parity north stars (BASELINE.md).

Attempts, in order:
  1. download the published ``MahmoodLab/madeleine`` weights
     (ref: /root/reference/madeleine/models/factory.py:16-39);
  2. if the weights land: run the <=1e-4 slide-embedding parity check against
     the reference torch implementation on a fixed synthetic bag;
  3. if ``--bcnb_dir`` holds BCNB patch embeddings: extract slide embeddings
     and run linear probing end-to-end (ref: /root/reference/README.md:69-75).

Every attempt appends a dated outcome line to BASELINE.md, so the gated
targets flip to measured the moment the environment allows — no judgment
calls (round-2 verdict item 7). Safe to re-run; it never overwrites results.
"""

import argparse
import datetime
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = os.environ.get("MADELEINE_REFERENCE", "/root/reference")
sys.path.insert(0, REPO)


def record(line: str) -> None:
    stamp = datetime.date.today().isoformat()
    with open(os.path.join(REPO, "BASELINE.md"), "a") as f:
        f.write(f"\n> parity-runbook {stamp}: {line}\n")
    print(f"[recorded] {line}")


def try_download(local_dir: str) -> bool:
    cfg = os.path.join(local_dir, "model_config.json")
    ckpt = os.path.join(local_dir, "model.pt")
    if os.path.exists(cfg) and os.path.exists(ckpt):
        print("* weights already present")
        return True
    os.makedirs(local_dir, exist_ok=True)
    try:
        from huggingface_hub import snapshot_download

        snapshot_download(repo_id="MahmoodLab/madeleine", local_dir=local_dir)
    except Exception as e:
        record(f"HF download FAILED ({type(e).__name__}: {e}) — "
               "published-weight parity still network-gated")
        return False
    return os.path.exists(cfg) and os.path.exists(ckpt)


def run_parity(local_dir: str) -> bool:
    """<=1e-4 parity of encode_he between the reference torch model and our
    bridged JAX model, both loading the PUBLISHED model.pt."""
    import json

    import jax.numpy as jnp

    from madeleine_tpu.models import madeleine as mtm
    from madeleine_tpu.models.factory import create_model_from_pretrained

    cfg, params, dtype = create_model_from_pretrained(local_dir,
                                                      download=False)

    sys.path.insert(0, REFERENCE)
    import torch
    from argparse import Namespace

    from madeleine.models import Model as ref_model

    with open(os.path.join(local_dir, "model_config.json")) as f:
        ref_cfg = Namespace(**json.load(f))
    model = ref_model.MADELEINE(config=ref_cfg,
                                stain_encoding=getattr(
                                    ref_cfg, "add_stain_encoding", False))
    sd = torch.load(os.path.join(local_dir, "model.pt"),
                    map_location="cpu", weights_only=True)
    sd = {k.removeprefix("module."): v for k, v in sd.items()}
    model.load_state_dict(sd, strict=True)
    model.eval()

    rng = np.random.default_rng(0)
    bag = rng.standard_normal((4096, cfg.patch_embedding_dim)).astype(
        np.float32)
    with torch.no_grad():
        want = model.encode_he(torch.from_numpy(bag)[None]).numpy()
    got = np.asarray(mtm.encode(params, cfg, jnp.asarray(bag)[None]),
                     np.float32)
    diff = float(np.max(np.abs(got - want)))
    ok = diff <= 1e-4
    record(f"published-weight encode_he parity: max|diff|={diff:.2e} "
           f"({'PASS <=1e-4' if ok else 'FAIL'}), 4096-token synthetic bag")
    return ok


def run_bcnb(hf_dir: str, bcnb_dir: str) -> None:
    """bcnb_dir must hold patch_embeddings/*.h5 (the bin/ CLI contract)."""
    emb_pkl = os.path.join(bcnb_dir, "madeleine_slide_embeddings.pkl")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "bin/extract_slide_embeddings.py"),
         "--local_dir", bcnb_dir, "--model_dir", os.path.dirname(hf_dir),
         "--no_download"],
        check=True)
    subprocess.run(
        [sys.executable, os.path.join(REPO, "bin/run_linear_probing.py"),
         "--slide_embedding_pkl", emb_pkl,
         "--label_path", os.path.join(REPO, "dataset_csv/BCNB/BCNB.csv")],
        check=True)
    record(f"BCNB linear probing ran end-to-end on {bcnb_dir} — compare the "
           "printed AUCs to the BASELINE.md table")


def main() -> int:
    ap = argparse.ArgumentParser()
    # basename MUST be "MADELEINE": bin/extract_slide_embeddings.py resolves
    # the checkpoint at <model_dir>/MADELEINE
    ap.add_argument("--local_dir",
                    default=os.path.join(REPO, "artifacts/models/MADELEINE"))
    ap.add_argument("--bcnb_dir", default=None,
                    help="dir with BCNB patch_embeddings/*.h5 (optional)")
    ap.add_argument("--out_dir",
                    default=os.path.join(REPO, "artifacts/real_parity"))
    args = ap.parse_args()

    if not try_download(args.local_dir):
        return 1
    ok = run_parity(args.local_dir)
    if args.bcnb_dir and os.path.isdir(args.bcnb_dir):
        os.makedirs(args.out_dir, exist_ok=True)
        run_bcnb(args.local_dir, args.bcnb_dir, args.out_dir)
    else:
        print("* no --bcnb_dir with patch embeddings; probing skipped "
              "(data-gated)")
    return 0 if ok else 2


if __name__ == "__main__":
    sys.exit(main())
