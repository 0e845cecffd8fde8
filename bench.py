"""Benchmark: BCNB-style slide encoding throughput on one chip.

Line 1 (headline): slides/sec encoding 4096-token CONCH bags (512-d) through
the flagship MADELEINE encoder (bf16, fused Pallas attention pooling).
Baseline: the BASELINE.json north star of 200 slides/sec/chip at 4k-patch
bags (the reference publishes no throughput; its downstream loop is bs=1
per-slide torch on GPU).

Line 2: END-TO-END throughput — synthetic .bag files on disk ->
BucketedBagLoader (threaded prefetch) -> run_inference -> embeddings, i.e.
the full path `bin/extract_slide_embeddings.py` exercises. NOTE: under the
axon tunnel, host->device bandwidth is ~35 MB/s, so this line measures the
tunnel on that axis, not the system; production PCIe/ICI numbers are
bounded by line 1 (see BASELINE.md §tunnel).

Each line: {"metric", "value", "unit", "vs_baseline"}.
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
    }), flush=True)

    bench_end_to_end(params, cfg)


def bench_end_to_end(params, cfg) -> None:
    """Disk .bag files -> BucketedBagLoader -> run_inference (the real
    extraction path), timed end to end including IO and host->device feed."""
    import shutil
    import tempfile

    from madeleine_tpu.data.datasets import BucketedBagLoader
    from madeleine_tpu.eval.inference import run_inference
    from madeleine_tpu.native import bagio

    try:
        import ml_dtypes

        disk_dtype = ml_dtypes.bfloat16
    except ImportError:
        disk_dtype = np.float32

    rng = np.random.default_rng(1)
    tmp = tempfile.mkdtemp(prefix="madeleine_bench_")
    n_slides, d = 96, 512
    lengths = rng.integers(1024, 4096, n_slides)
    try:
        for i, n in enumerate(lengths):
            bagio.write_bag_file(
                os.path.join(tmp, f"s{i}.bag"),
                rng.standard_normal((int(n), d)).astype(np.float32),
                dtype="bfloat16")

        def run():
            loader = BucketedBagLoader(tmp, tokens_per_batch=262144,
                                       dtype=disk_dtype)
            return run_inference(params, cfg, loader, verbose=False)

        run()  # warmup: compiles every (bucket, batch) shape + page cache
        t0 = time.perf_counter()
        res, _ = run()
        elapsed = time.perf_counter() - t0
        assert len(res["slide_ids"]) == n_slides
        sps = n_slides / elapsed
        print(json.dumps({
            "metric": "e2e_disk_to_embedding_throughput",
            "value": round(sps, 2),
            "unit": "slides/sec/chip",
            "vs_baseline": round(sps / BASELINE_SLIDES_PER_SEC, 3),
            "note": "axon tunnel host->device is ~35 MB/s, so this line "
                    "measures the tunnel, not the system; production "
                    "PCIe-fed throughput is bounded by line 1",
        }), flush=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
