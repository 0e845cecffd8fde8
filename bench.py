"""Benchmark: BCNB-style slide encoding throughput on one chip.

Measures slides/sec encoding 4096-token CONCH bags (512-d) through the
flagship MADELEINE encoder (bf16, fused Pallas attention pooling).
Baseline: the BASELINE.json north star of 200 slides/sec/chip at 4k-patch
bags (the reference publishes no throughput; its downstream loop is bs=1
per-slide torch on GPU).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BASELINE_SLIDES_PER_SEC = 200.0  # BASELINE.json target (v5e, 4k bags)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from madeleine_tpu.models import madeleine as mtm
    from madeleine_tpu.models.madeleine import init_madeleine_params
    from __graft_entry__ import _flagship_cfg

    cfg = _flagship_cfg()
    params = init_madeleine_params(jax.random.PRNGKey(0), cfg,
                                   dtype=jnp.bfloat16)

    batch, tokens, d = 256, 4096, 512
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((batch, tokens, d)), jnp.bfloat16)

    @jax.jit
    def encode(params, feats):
        return mtm.encode_he(params, cfg, feats)

    @jax.jit
    def encode_chained(params, feats, carry):
        # fold the previous output into the input so iterations can't be
        # elided or overlapped away by a lazy backend
        feats = feats.at[0, 0, :].add(carry[0].astype(feats.dtype) * 1e-6)
        out = mtm.encode_he(params, cfg, feats)
        return out

    # warmup / compile (fetch to host: the axon tunnel's block_until_ready
    # does not reliably force enqueued work, a np.asarray fetch does)
    carry = encode(params, feats)
    carry = encode_chained(params, feats, carry)
    np.asarray(carry)

    n_iters = 10
    t0 = time.perf_counter()
    for _ in range(n_iters):
        carry = encode_chained(params, feats, carry)
    np.asarray(carry)  # forces the whole dependency chain
    elapsed = time.perf_counter() - t0

    slides_per_sec = batch * n_iters / elapsed
    print(json.dumps({
        "metric": "slide_encode_throughput_4k_bags",
        "value": round(slides_per_sec, 2),
        "unit": "slides/sec/chip",
        "vs_baseline": round(slides_per_sec / BASELINE_SLIDES_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
