"""VPU op-throughput probe — what does one erf/tanh/exp/fma actually cost?

Times a Pallas kernel that applies REPS dependent passes of one op to a
[256, 2048] f32 block over a grid, so the op's amortized per-element cost
falls straight out of the slope. Drives the choice between exact-erf GELU,
minimax-polynomial GELU, and hardware-transcendental forms in the fused
train kernels (ops/encoder_train.py) — measure first, then restructure.

Usage: python scripts/bench_vpu_ops.py [--reps 64] [--grid 64]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from madeleine_tpu.utils.platform import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from madeleine_tpu.ops.encode_fused import _erf


def _poly_erf(x):
    """Odd minimax-style erf approx, no exp/recip: x*P(x^2), clamped.
    Coefficients from a least-squares fit on [0, 3.4] (|err| ~ 1e-3 abs —
    inside bf16 rounding for GELU purposes). 6 FMA + clamp."""
    x = jnp.clip(x, -3.4, 3.4)
    t = x * x
    p = jnp.float32(-1.45e-4)
    p = p * t + jnp.float32(3.54e-3)
    p = p * t + jnp.float32(-3.687e-2)
    p = p * t + jnp.float32(2.0662e-1)
    p = p * t + jnp.float32(-6.4118e-1)
    p = p * t + jnp.float32(1.1270217)
    return x * p


OPS = {
    "fma": lambda x: x * jnp.float32(1.0000001) + jnp.float32(1e-7),
    "mul": lambda x: x * jnp.float32(1.0000001),
    "exp": lambda x: jnp.exp(x * jnp.float32(1e-3)),
    "tanh": lambda x: jnp.tanh(x),
    "sigmoid": lambda x: jax.nn.sigmoid(x),
    "recip": lambda x: 1.0 / jnp.maximum(x, jnp.float32(0.5)),
    "rsqrt": lambda x: jax.lax.rsqrt(jnp.maximum(x, jnp.float32(0.5))),
    "erf_as": lambda x: _erf(x),          # A&S 7.1.26 (exp + recip + poly)
    "erf_poly": lambda x: _poly_erf(x),   # odd minimax, no exp
    "lane_mean": lambda x: x - jnp.mean(x, axis=-1, keepdims=True),
}


def make_kernel(fn, reps):
    def kernel(x_ref, o_ref):
        x = x_ref[0]
        for _ in range(reps):
            x = fn(x)
        o_ref[0] = x
    return kernel


def _timed_call(fn, reps, grid, shape):
    import numpy as np

    call = jax.jit(pl.pallas_call(
        make_kernel(fn, reps),
        grid=(grid,),
        in_specs=[pl.BlockSpec((1,) + shape, lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1,) + shape, lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1,) + shape, jnp.float32),
    ))
    x = jnp.ones((1,) + shape, jnp.float32) * 0.7
    # axon tunnel: block_until_ready does not force enqueued work — fetch a
    # slice to host to force execution (CLAUDE.md invariant)
    np.asarray(call(x)[0, :1, :1])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(call(x)[0, :1, :1])
        best = min(best, time.perf_counter() - t0)
    return best


def bench(name, fn, reps, grid, shape):
    """Slope between reps and 2*reps cancels launch + tunnel round-trip."""
    t1 = _timed_call(fn, reps, grid, shape)
    t2 = _timed_call(fn, 2 * reps, grid, shape)
    dt = max(t2 - t1, 1e-9)
    vregs = grid * reps * shape[0] * shape[1] / (8 * 128)
    ns = dt / vregs * 1e9
    print(f"{name:10s} slope {dt*1e3:8.2f} ms  {ns:7.3f} ns/vreg-op "
          f"(~{ns*0.94:.2f} cycles @940MHz)", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=64)
    ap.add_argument("--grid", type=int, default=64)
    ap.add_argument("--ops", default=None,
                    help="comma-separated subset of ops (each op costs two "
                         "Mosaic compiles; the full sweep is slow through "
                         "the axon tunnel)")
    args = ap.parse_args()
    shape = (256, 2048)
    names = args.ops.split(",") if args.ops else list(OPS)
    # per-call overhead reference: 1 rep
    for name in names:
        bench(name, OPS[name], args.reps, args.grid, shape)


if __name__ == "__main__":
    main()
