"""Sync-timed canonical-scale train-step benchmark (single chip).

Canonical scale = the reference launch config (ref:
scripts/launch_pretrain_withoutStainEncodings.sh:19-24): batch 65, 5 ACROBAT
stains, 2048 tokens/bag, bf16 compute, InfoNCE(T=0.001, symmetric) + GOT.

Prints per-step wall time (data resident on device; the step chained on the
previous state so the backend cannot overlap iterations) — the number BASELINE.md
records for the pretrain north star.

Usage: python scripts/bench_train_step.py [--steps 10] [--no-remat]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from madeleine_tpu.utils.platform import enable_compilation_cache

enable_compilation_cache()

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--batch", type=int, default=65)
    ap.add_argument("--tokens", type=int, default=2048)
    ap.add_argument("--no-remat", action="store_true")
    ap.add_argument("--no-scan", action="store_true",
                    help="joint [bs*n_mod] embedder batch (cfg.modality_scan=False)")
    ap.add_argument("--n_views", type=int, default=1, choices=(1, 3),
                    help="3 = intra-modality training config (whole bag + two "
                         "half-bag views, ref Model.py:419-440); routes to the "
                         "unfused path unless the fused kernel covers it")
    ap.add_argument("--activation", default="softmax",
                    choices=("softmax", "relu", "sigmoid", "leaky_relu"),
                    help="non-softmax picks the unfused fallback chain")
    ap.add_argument("--profile-dir", default=None)
    ap.add_argument("--memory", action="store_true",
                    help="report the device HBM high-water mark after the "
                         "steps next to the save_acts guard's saved+4*x "
                         "estimate (ops/encoder_train._resolve_save_acts) — "
                         "validates the guard constants with a measurement")
    args = ap.parse_args()
    if args.memory:
        os.environ["MADELEINE_ENCODER_LOG_SAVE_ACTS"] = "1"

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_cfg
    from madeleine_tpu.models.madeleine import init_madeleine_params
    from madeleine_tpu.train.optim import make_optimizer
    from madeleine_tpu.train.trainer import init_train_state, make_train_step

    cfg = _flagship_cfg()
    if args.no_remat:
        cfg.remat = False
    if args.no_scan:
        cfg.modality_scan = False
    if args.n_views == 3:
        # the trainer derives n_views from the intra-modality loss flag
        cfg.intra_modality_loss = "info-nce"
    cfg.activation = args.activation

    params = init_madeleine_params(jax.random.PRNGKey(0), cfg)
    tx, _ = make_optimizer(cfg, steps_per_epoch=64)
    state = init_train_state(params, tx)
    step = make_train_step(cfg, tx, donate=True)

    rng = np.random.default_rng(0)
    bs, n_mod, t, d = args.batch, len(cfg.MODALITIES), args.tokens, 512
    labels = np.ones((bs, n_mod), np.float32)
    # realistic stain availability (ACROBAT is ~70-90% per IHC stain)
    for s in range(1, n_mod):
        labels[:, s] = (rng.random(bs) < 0.8).astype(np.float32)
    batch = {
        "feats": jnp.asarray(rng.standard_normal((bs, n_mod, t, d)),
                             jnp.bfloat16),
        "modality_labels": jnp.asarray(labels),
        "sample_mask": jnp.ones(bs, bool),
    }

    key = jax.random.PRNGKey(0)
    # compile + warmup
    state, he, m = step(state, batch, key)
    np.asarray(he)  # force through the axon tunnel (block_until_ready lies)

    if args.profile_dir:
        jax.profiler.start_trace(args.profile_dir)

    times = []
    for i in range(args.steps):
        t0 = time.perf_counter()
        state, he, m = step(state, batch, jax.random.fold_in(key, i))
        np.asarray(he)
        times.append(time.perf_counter() - t0)

    if args.profile_dir:
        jax.profiler.stop_trace()

    times = np.asarray(times)
    print(f"loss={float(m['loss']):.4f} skipped={bool(m['skipped'])}")
    print(f"step time: median {np.median(times)*1e3:.1f} ms  "
          f"min {times.min()*1e3:.1f} ms  mean {times.mean()*1e3:.1f} ms "
          f"(bs={bs}, {n_mod} stains, {t} tok, remat={cfg.remat}, "
          f"n_views={args.n_views}, activation={cfg.activation})")
    ep = np.median(times) * (4211 // bs + 1)
    print(f"-> est. ACROBAT epoch {ep:.1f} s, 120 epochs {ep*120/60:.1f} min "
          f"on ONE chip")

    if args.memory:
        ms = jax.devices()[0].memory_stats() or {}
        peak = ms.get("peak_bytes_in_use")
        lim = ms.get("bytes_limit")
        if peak:
            print(f"[memory] peak_bytes_in_use={peak/2**30:.2f} GiB "
                  f"limit={(lim or 0)/2**30:.2f} GiB "
                  f"(compare to the [save_acts guard] est_peak line above)")
        else:
            print(f"[memory] memory_stats unavailable on this device: {ms}")


if __name__ == "__main__":
    main()
