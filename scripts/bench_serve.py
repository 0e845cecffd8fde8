#!/usr/bin/env python
"""Serving load test: sustained mixed-length traffic through the
EmbeddingService micro-batcher (round-2 NOTES backlog item).

Drives the in-process service (the same object `bin/serve.py` wraps with
HTTP) with many concurrent clients submitting bags of realistic mixed
lengths, then reports sustained slides/s, latency percentiles, and the
/stats counters (including bucket_growths — oversize bags run whole).

Usage: python scripts/bench_serve.py [--clients 8] [--bags-per-client 40]
"""

import argparse
import os
import sys
import threading
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from madeleine_tpu.utils.platform import apply_platform_env

apply_platform_env()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--clients", type=int, default=8)
    ap.add_argument("--bags-per-client", type=int, default=40)
    ap.add_argument("--d", type=int, default=512)
    ap.add_argument("--no-warmup", action="store_true")
    ap.add_argument("--buckets", type=str, default="1024,2048,4096,8192",
                    help="comma-separated bucket sizes; the PRODUCTION "
                    "mitigation for the bucket-growth p99 tail is a top "
                    "bucket covering the real length tail, e.g. "
                    "...,8192,16384 (docs/DEPLOYMENT.md)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_cfg
    from madeleine_tpu.models.madeleine import init_madeleine_params
    from madeleine_tpu.serve.server import EmbeddingService

    cfg = _flagship_cfg()
    params = init_madeleine_params(jax.random.PRNGKey(0), cfg,
                                   dtype=jnp.bfloat16)
    buckets = tuple(int(b) for b in args.buckets.split(","))
    svc = EmbeddingService(params, cfg, buckets=buckets)
    if not args.no_warmup:
        t0 = time.time()
        svc.warmup(verbose=False)
        print(f"warmup: {time.time() - t0:.1f}s")

    rng = np.random.default_rng(0)
    # realistic WSI mix: mostly 1-4k patches, a tail of long bags, one
    # oversize bag beyond the top bucket (exercises bucket growth)
    def lengths(n):
        ls = rng.integers(600, 4096, n).tolist()
        ls[-1] = 9000 if n > 2 else ls[-1]
        return ls

    errs, done, lats = [], [], []
    lock = threading.Lock()

    def client(cid):
        """One bag per request (the real serving pattern) so per-request
        latency percentiles are measurable; the micro-batcher coalesces
        concurrent requests into bucket batches server-side."""
        try:
            bags = [rng.standard_normal((n, args.d)).astype(np.float32)
                    for n in lengths(args.bags_per_client)]
            my_lats, n_out = [], 0
            for bag in bags:
                t0 = time.perf_counter()
                out = svc.encode(bag, timeout=600.0)
                my_lats.append(time.perf_counter() - t0)
                n_out += 1
                assert out.shape[-1] == cfg.embed_dim, out.shape
            with lock:
                done.append((cid, n_out))
                lats.extend(my_lats)
        except Exception as e:  # pragma: no cover
            with lock:
                errs.append((cid, repr(e)))

    t0 = time.time()
    threads = [threading.Thread(target=client, args=(c,))
               for c in range(args.clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.time() - t0

    n_slides = sum(n for _, n in done)
    stats = svc.stats()
    if errs:
        print(f"ERRORS: {errs}")
    print(f"clients={args.clients} slides={n_slides} wall={wall:.1f}s "
          f"-> {n_slides / wall:.1f} slides/s sustained")
    if lats:
        p50, p90, p99 = (np.percentile(lats, q) * 1000 for q in (50, 90, 99))
        print(f"latency ms: p50={p50:.0f} p90={p90:.0f} p99={p99:.0f} "
              f"(mixed 600-4096-token bags + one 9000-token grown-bucket bag)")
    print(f"stats: {stats}")
    if errs:
        return 1
    assert stats["slides"] >= n_slides
    if max(buckets) < 9000:
        assert stats["bucket_growths"] >= 1, "oversize bag did not grow a bucket"
    else:
        # mitigated config: the tail fits a configured (warmed) bucket
        assert stats["bucket_growths"] == 0, stats
    svc.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
