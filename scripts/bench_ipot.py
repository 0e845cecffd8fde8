"""Time the fused IPOT/GW kernels at canonical train scale (260 problems,
256x256) on the TPU. Slope between two batch sizes cancels the axon tunnel
round-trip. Compare against the round-2 per-problem grid numbers in
BASELINE.md (GW gamma 14.4 ms, IPOT bwd 9.4, IPOT fwd 3.5)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from madeleine_tpu.utils.platform import enable_compilation_cache

enable_compilation_cache()

import jax.numpy as jnp
import numpy as np

from madeleine_tpu.ops.ipot import _bwd_call, _fwd_call, gw_gamma_fused


def timed(fn, *args):
    np.asarray(fn(*args)[:1, :1, :1])        # compile + force (axon fetch)
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(fn(*args)[:1, :1, :1])
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    n = 256
    rng = np.random.default_rng(0)
    for b_small, b in ((65, 260), (130, 520)):
        C = jnp.asarray(np.abs(rng.standard_normal((b, n, n))), jnp.float32)
        g = jnp.asarray(rng.standard_normal((b, n, n)), jnp.float32)
        Cs = jnp.asarray(np.abs(rng.standard_normal((b, n, n))), jnp.float32)
        for name, call in (
            ("ipot_fwd(30)", lambda x: _fwd_call(x, beta=0.5, iters=30)),
            ("ipot_bwd(30)", lambda x: _bwd_call(x, g[:x.shape[0]],
                                                 beta=0.5, iters=30)),
            ("gw_gamma(5x20)", lambda x: gw_gamma_fused(
                Cs[:x.shape[0]], Cs[:x.shape[0]], x, 0.1, 5, 20)),
        ):
            t_small = timed(call, C[:b_small])
            t_full = timed(call, C)
            slope = (t_full - t_small) / (b - b_small) * 260
            print(f"{name:15s} b={b}: {t_full*1e3:7.2f} ms total; "
                  f"~{slope*1e3:6.2f} ms per 260 problems (slope)",
                  flush=True)
        break  # one pair is enough


if __name__ == "__main__":
    main()
