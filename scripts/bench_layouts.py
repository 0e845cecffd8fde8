"""Microbenchmark: gated-attention layout options on TPU.

The gate scoring is the FLOPs majority of the encode path (2 x
[B*T, hidden] @ [hidden, attn_hidden] per head). Three candidate lowerings:

  A. current: einsum '...eh,hef->...fh' on head-minor xh (strided e)
  B. head-major: einsum 'bthe,hef->bthf' after a one-time weight permutation
  C. dense block-diagonal: one [*, E] @ [E, E] matmul with zero off-blocks

Run on the real chip: python scripts/bench_layouts.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def timeit(fn, *args, iters=10):
    import jax

    out = fn(*args)
    np.asarray(out.ravel()[:1])  # force
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(out.ravel()[:1])
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    B, T, e, nh, F = 64, 4096, 512, 4, 512
    E = e * nh
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.standard_normal((B, T, E)), dt)          # head-minor
    wa = jnp.asarray(rng.standard_normal((nh, e, F)), dt)

    # A: current head-minor einsum
    @jax.jit
    def path_a(y, wa):
        xh = y.reshape(B, T, e, nh)
        return jnp.einsum("bteh,hef->btfh", xh, wa)

    # B: head-major einsum (weights already permuted offline)
    y_hm = jnp.asarray(
        np.ascontiguousarray(
            np.asarray(y, np.float32).reshape(B, T, e, nh)
            .transpose(0, 1, 3, 2).reshape(B, T, E)), dt)

    @jax.jit
    def path_b(y_hm, wa):
        xh = y_hm.reshape(B, T, nh, e)
        return jnp.einsum("bthe,hef->bthf", xh, wa)

    # C: dense block-diagonal on head-minor layout
    wdense = np.zeros((E, E), np.float32)
    for h in range(nh):
        for ei in range(e):
            wdense[ei * nh + h, np.arange(F) * nh + h] = np.asarray(
                wa[h, ei], np.float32)
    wdense = jnp.asarray(wdense, dt)

    @jax.jit
    def path_c(y, wdense):
        return jnp.dot(y, wdense)

    ta = timeit(path_a, y, wa)
    tb = timeit(path_b, y_hm, wa)
    tc = timeit(path_c, y, wdense)
    useful_tflop = 2 * B * T * e * F * nh / 1e12
    print(f"A head-minor einsum : {ta*1e3:7.2f} ms  "
          f"({useful_tflop/ta:6.1f} useful TFLOP/s)")
    print(f"B head-major einsum : {tb*1e3:7.2f} ms  "
          f"({useful_tflop/tb:6.1f} useful TFLOP/s)")
    print(f"C dense block-diag  : {tc*1e3:7.2f} ms  "
          f"({useful_tflop/tc:6.1f} useful TFLOP/s)")

    # sanity: B equals A modulo layout permutation
    a = np.asarray(path_a(y, wa), np.float32)       # [B,T,F,nh]
    b = np.asarray(path_b(y_hm, wa), np.float32)    # [B,T,nh,F]
    err = np.max(np.abs(a[0, :8].transpose(0, 2, 1) - b[0, :8]))
    print("A-vs-B max err (sample):", err)


if __name__ == "__main__":
    main()
