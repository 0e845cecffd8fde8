#!/usr/bin/env python
"""Measured HBM high-water mark of the canonical fused train step — via
ballast probing, because the axon device exposes no memory_stats()
(round-5 verdict item 7: validate the save_acts guard's
`saved + 4*x_bytes <= limit - 2 GiB` constants with a measurement).

Method: the child process (a) binary-searches device capacity by allocating
one buffer until RESOURCE_EXHAUSTED, then (b) holds a ballast buffer of G
GiB resident while running ONE canonical-scale fused train step. The
largest G that still completes bounds the step's true peak:

    peak_measured in (capacity - G_ok - step_gib, capacity - G_ok]

Each trial runs in a SUBPROCESS so an OOM kills the child, not the bench
(and the TPU runtime recovers on the next client). The persistent compile
cache makes the repeated step compiles cheap.

Usage: python scripts/bench_hbm_peak.py [--step_gib 0.5] [--views 1]
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def child_capacity(gib: float) -> None:
    """Exit 0 iff a single `gib` GiB buffer materializes on device."""
    import jax
    import jax.numpy as jnp

    n = int(gib * 2**30) // 4
    x = jax.jit(lambda: jnp.zeros((n,), jnp.float32))()
    x.block_until_ready()
    print(f"capacity probe {gib:.2f} GiB: OK", flush=True)


def child_step(ballast_gib: float, n_views: int) -> None:
    """Exit 0 iff the canonical train step completes with `ballast_gib`
    GiB held resident."""
    from madeleine_tpu.utils.platform import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _flagship_cfg
    from madeleine_tpu.models.madeleine import init_madeleine_params
    from madeleine_tpu.train.optim import make_optimizer
    from madeleine_tpu.train.trainer import init_train_state, make_train_step

    ballast = None
    if ballast_gib > 0:
        n = int(ballast_gib * 2**30) // 4
        ballast = jax.jit(lambda: jnp.zeros((n,), jnp.float32))()
        ballast.block_until_ready()

    cfg = _flagship_cfg()
    cfg.remat = False
    cfg.modality_scan = False
    if n_views == 3:
        cfg.intra_modality_loss = "info-nce"
    params = init_madeleine_params(jax.random.PRNGKey(0), cfg,
                                   dtype=jnp.float32)
    tx, _ = make_optimizer(cfg, steps_per_epoch=65)
    state = init_train_state(params, tx)
    step = make_train_step(cfg, tx, donate=False)

    rng = np.random.default_rng(0)
    bs, n_mod, t, d = 65, len(cfg.MODALITIES), 2048, 512
    labels = (rng.random((bs, n_mod)) < 0.85).astype(np.float32)
    labels[:, 0] = 1.0
    batch = {
        "feats": jnp.asarray(
            rng.standard_normal((bs, n_mod, t, d)).astype(np.float32),
            jnp.bfloat16),
        "modality_labels": jnp.asarray(labels),
        "sample_mask": jnp.ones(bs, bool),
    }
    new_state, he, metrics = step(state, batch, jax.random.PRNGKey(1))
    loss = float(metrics["loss"])  # host fetch forces completion (CLAUDE.md)
    assert np.isfinite(loss), loss
    del ballast
    print(f"step with ballast {ballast_gib:.2f} GiB: OK loss={loss:.3f}",
          flush=True)


def _try(mode: str, gib: float, n_views: int, timeout: int = 1500) -> bool:
    r = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--child", mode,
         "--gib", str(gib), "--views", str(n_views)],
        capture_output=True, text=True, timeout=timeout)
    ok = r.returncode == 0
    tag = "OK" if ok else "OOM/fail"
    print(f"  [{mode} {gib:.2f} GiB] {tag}", flush=True)
    if not ok and "RESOURCE_EXHAUSTED" not in r.stdout + r.stderr:
        tail = (r.stdout + r.stderr)[-500:]
        print(f"    (non-OOM failure tail: {tail})", flush=True)
    return ok


def bsearch(mode: str, lo_ok: float, hi_bad: float, n_views: int,
            tol: float = 0.25) -> float:
    """Largest G in [lo_ok, hi_bad] that succeeds, to within tol GiB."""
    while hi_bad - lo_ok > tol:
        mid = (lo_ok + hi_bad) / 2
        if _try(mode, mid, n_views):
            lo_ok = mid
        else:
            hi_bad = mid
    return lo_ok


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", choices=("capacity", "step"), default=None)
    ap.add_argument("--gib", type=float, default=0.0)
    ap.add_argument("--views", type=int, default=1)
    ap.add_argument("--tol", type=float, default=0.25)
    args = ap.parse_args()

    if args.child == "capacity":
        child_capacity(args.gib)
        return 0
    if args.child == "step":
        child_step(args.gib, args.views)
        return 0

    # 1. device capacity (v5e nominally 16 GiB HBM)
    if not _try("capacity", 1.0, 1):
        print("1 GiB probe failed — device unhealthy?")
        return 1
    lo, hi = 1.0, 32.0
    while _try("capacity", hi, 1):
        lo, hi = hi, hi * 2
    cap = bsearch("capacity", lo, hi, 1, args.tol)
    print(f"capacity ~= {cap:.2f} GiB (single-buffer allocatable)")

    # 2. max ballast under the canonical step
    if not _try("step", 0.0, args.views):
        print("canonical step failed with no ballast — investigate first")
        return 1
    g_ok = bsearch("step", 0.0, cap, args.views, args.tol)
    peak = cap - g_ok
    print(json.dumps({
        "metric": "train_step_hbm_peak",
        "n_views": args.views,
        "capacity_gib": round(cap, 2),
        "max_ballast_gib": round(g_ok, 2),
        "peak_gib_upper_bound": round(peak, 2),
        "tol_gib": args.tol,
        "note": "peak <= capacity - max_ballast (+ tol); guard estimate at "
                "this shape: saved 8.89 + 4*x 2.54 = 11.43 GiB "
                "(ops/encoder_train._resolve_save_acts)",
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
