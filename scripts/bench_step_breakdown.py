"""Train-step time breakdown at canonical scale (single chip).

Times value_and_grad of ablated loss variants to attribute the step:
  full          InfoNCE + GOT (the real step, scripts/bench_train_step.py)
  no_got        InfoNCE only (local_loss="-1")
  got_only      GOT only (global_loss off)
  fwd_only      encoder forward (no grad, loss scalarized)

Usage: python scripts/bench_step_breakdown.py [--steps 6] [--no-scan]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _time(fn, args, steps):
    import jax

    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])  # force through the tunnel
    times = []
    for _ in range(steps):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--batch", type=int, default=65)
    ap.add_argument("--tokens", type=int, default=2048)
    ap.add_argument("--no-scan", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_cfg
    from madeleine_tpu.models.madeleine import init_madeleine_params
    from madeleine_tpu.train.trainer import make_train_step, init_train_state
    from madeleine_tpu.train.optim import make_optimizer

    def build(global_loss, local_loss):
        cfg = _flagship_cfg()
        cfg.remat = False
        if args.no_scan:
            cfg.modality_scan = False
        cfg.global_loss = global_loss
        cfg.local_loss = local_loss
        params = init_madeleine_params(jax.random.PRNGKey(0), cfg)
        tx, _ = make_optimizer(cfg, steps_per_epoch=64)
        state = init_train_state(params, tx)
        step = make_train_step(cfg, tx, donate=False)
        return cfg, state, step

    rng = np.random.default_rng(0)
    bs, t, d = args.batch, args.tokens, 512
    cfg0 = _flagship_cfg()
    n_mod = len(cfg0.MODALITIES)
    labels = np.ones((bs, n_mod), np.float32)
    for s in range(1, n_mod):
        labels[:, s] = (rng.random(bs) < 0.8).astype(np.float32)
    batch = {
        "feats": jnp.asarray(rng.standard_normal((bs, n_mod, t, d)),
                             jnp.bfloat16),
        "modality_labels": jnp.asarray(labels),
        "sample_mask": jnp.ones(bs, bool),
    }
    key = jax.random.PRNGKey(0)

    results = {}
    for name, gl, ll in (("full", "info-nce", "got"),
                         ("no_got", "info-nce", "-1"),
                         ("got_only", "-1", "got")):
        cfg, state, step = build(gl, ll)
        results[name] = _time(lambda s=state, st=step: st(s, batch, key), (),
                              args.steps)
        print(f"{name:10s} {results[name]*1e3:8.1f} ms", flush=True)

    # forward-only encoder (no losses, no grad)
    from madeleine_tpu.models import madeleine as mtm
    cfg, state, _ = build("info-nce", "got")

    @jax.jit
    def fwd(params, feats):
        cp = jax.tree.map(lambda p: p.astype(jnp.bfloat16), params)
        s, tk = mtm.forward_train(cp, cfg, feats, rng=key, train=True)
        return jnp.sum(s.astype(jnp.float32)) + jnp.sum(tk.astype(jnp.float32))

    results["fwd_only"] = _time(lambda: fwd(state.params, batch["feats"]), (),
                                args.steps)
    print(f"{'fwd_only':10s} {results['fwd_only']*1e3:8.1f} ms", flush=True)
    print("implied GOT cost:", round((results["full"] - results["no_got"]) * 1e3, 1), "ms")


if __name__ == "__main__":
    main()
