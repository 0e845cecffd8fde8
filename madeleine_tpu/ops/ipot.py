"""IPOT transport plan — whole proximal-point loop as one Pallas kernel.

Semantics identical to `losses.ipot_plan` (ref: loss.py:179-193): `iterations`
proximal Sinkhorn steps with uniform marginals,

    Q = A o T;  delta = 1/(n Q sigma);  a = Q^T delta;  sigma' = 1/(m a);
    T' = delta o Q o sigma'^T,   A = exp(-C / beta).

XLA runs this as ~30 dependent fusions that round-trip every [b, n, m]
intermediate through HBM, and reverse-mode AD through the loop stacks
per-iteration residuals — measured ~50x the forward cost at train shapes.
Here:

  forward:  grid (b/G,); per grid step G problems live in VMEM and ALL
            iterations run on-chip. HBM traffic = read C, write T.
  backward: custom VJP replays the forward per group storing the (T_i,
            sigma_i) history in a VMEM scratch, then runs the exact adjoint
            recurrence of the iteration map, also entirely in VMEM. This is
            the true derivative of the unrolled loop — the same function
            XLA's autodiff computes (the reference differentiates through
            the unconverged Sinkhorn, so we keep those semantics rather
            than a Danskin/envelope approximation).

Why G problems per grid step (round 3): one problem's iteration map is a
strict serial dependency chain of short VPU ops on [256, 256] tiles — the
core spends most cycles waiting on op latency, which is why the round-2
per-problem kernels ran ~3x their throughput floor (GW gamma 14.4 ms, IPOT
fwd+bwd 12.9 ms at canonical scale). Problems are independent, so stacking
G of them per grid step gives the scheduler G interleavable chains: every
elementwise op and reduction batches to [G, n, m] (per-problem semantics
preserved — reductions stay within axis 1/2), and the GW outer matmuls
issue as G back-to-back independent MXU dots. Numerics per problem are
unchanged except u/a row/col sums, which move from 1-wide MXU dots to VPU
tree reductions (f32 either way; the tiny dots were pure issue overhead).

Row/column vectors are kept as [G, n, 1] / [G, 1, m] arrays; reductions are
jnp.sum over the lane/sublane axis (Mosaic's dot_general lowering fuses a
following add into the matmul accumulator and only supports constant
accumulators, and optimization_barrier has no Pallas TPU lowering — see the
merged ddelta reduction in the adjoint).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HI = jax.lax.Precision.HIGHEST


def _dot(a, b, dims):
    return jax.lax.dot_general(a, b, (dims, ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=_HI)


def _group(b: int, cap: int, env: str) -> int:
    """Largest divisor of b among 8/5/4/3/2 (capped) — problems per grid
    step. Env override wins when it divides b."""
    forced = int(os.environ.get(env, "0"))
    if forced > 0 and b % forced == 0:
        return forced
    for g in (8, 6, 5, 4, 3, 2):
        if g <= cap and b % g == 0:
            return g
    return 1


def _step(A, T, sigma, n: int, m: int):
    """One IPOT iteration over a group. A/T/Q [G,n,m], sigma [G,1,m]."""
    Q = A * T
    u = jnp.sum(Q * sigma, axis=2, keepdims=True)   # [G, n, 1]
    delta = 1.0 / (n * u)
    a = jnp.sum(Q * delta, axis=1, keepdims=True)   # [G, 1, m]
    sigma1 = 1.0 / (m * a)
    T1 = delta * Q * sigma1                         # broadcast outer
    return T1, sigma1, Q, delta


def _fwd_kernel(c_ref, t_ref, *, beta: float, iters: int):
    C = c_ref[...].astype(jnp.float32)              # [G, n, m]
    G, n, m = C.shape
    A = jnp.exp(-C / beta)

    def body(_, carry):
        T, sigma = carry
        T1, sigma1, _, _ = _step(A, T, sigma, n, m)
        return T1, sigma1

    T0 = jnp.ones((G, n, m), jnp.float32)
    s0 = jnp.full((G, 1, m), 1.0 / m, jnp.float32)
    T, _ = jax.lax.fori_loop(0, iters, body, (T0, s0))
    t_ref[...] = T.astype(t_ref.dtype)


def _bwd_kernel(c_ref, g_ref, dc_ref, t_hist, s_hist, *, beta: float,
                iters: int):
    C = c_ref[...].astype(jnp.float32)              # [G, n, m]
    G, n, m = C.shape
    A = jnp.exp(-C / beta)

    # ---- replay forward, storing each iteration's INPUT (T_i, sigma_i) ----
    def fwd_body(i, carry):
        T, sigma = carry
        t_hist[i] = T
        s_hist[i] = sigma
        T1, sigma1, _, _ = _step(A, T, sigma, n, m)
        return T1, sigma1

    T0 = jnp.ones((G, n, m), jnp.float32)
    s0 = jnp.full((G, 1, m), 1.0 / m, jnp.float32)
    jax.lax.fori_loop(0, iters, fwd_body, (T0, s0))

    # ---- adjoint recurrence, last iteration first -------------------------
    # The two ddelta contributions rowsum(dT*Q*sig1) + rowsum(Q*da) are
    # merged algebraically into one reduction rowsum(Q*(dT*sig1 + da)).
    def bwd_body(r, carry):
        dT, dsig, dA = carry
        i = iters - 1 - r
        T_i = t_hist[i]
        sig_i = s_hist[i]
        _, sig1, Q, delta = _step(A, T_i, sig_i, n, m)

        # T1 = delta o Q o sig1; sig1 = 1/(m a); a = colsum(delta o Q)
        dsig1 = dsig + jnp.sum(delta * dT * Q, axis=1, keepdims=True)
        da = -m * sig1 * sig1 * dsig1                                # [G,1,m]
        ddelta = jnp.sum(Q * (dT * sig1 + da), axis=2, keepdims=True)
        # delta = 1/(n u), u = rowsum(Q o sig_i)
        du = -n * delta * delta * ddelta                             # [G,n,1]
        dQ = dT * delta * sig1 + delta * da + du * sig_i             # [G,n,m]
        dsig_i = jnp.sum(du * Q, axis=1, keepdims=True)              # [G,1,m]
        # Q = A o T_i
        dT_i = dQ * A
        dA = dA + dQ * T_i
        return dT_i, dsig_i, dA

    g = g_ref[...].astype(jnp.float32)
    zero_s = jnp.zeros((G, 1, m), jnp.float32)
    zero_A = jnp.zeros((G, n, m), jnp.float32)
    _, _, dA = jax.lax.fori_loop(0, iters, bwd_body, (g, zero_s, zero_A))
    # A = exp(-C/beta); T_0, sigma_0 are constants
    dc_ref[...] = (dA * A * (-1.0 / beta)).astype(dc_ref.dtype)


@functools.partial(jax.jit, static_argnames=("beta", "iters", "interpret"))
def _fwd_call(C, *, beta, iters, interpret=False):
    b, n, m = C.shape
    G = _group(b, 8, "MADELEINE_IPOT_GROUP")
    return pl.pallas_call(
        functools.partial(_fwd_kernel, beta=beta, iters=iters),
        grid=(b // G,),
        in_specs=[pl.BlockSpec((G, n, m), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((G, n, m), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, m), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * iters * (2 * n * m + 5 * n * m),
            bytes_accessed=2 * b * n * m * 4,
            transcendentals=b * n * m,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(C)


# keep the bwd history scratch under this many bytes when picking G
_BWD_HIST_BUDGET = 48 * 1024 * 1024


@functools.partial(jax.jit, static_argnames=("beta", "iters", "interpret"))
def _bwd_call(C, g, *, beta, iters, interpret=False):
    b, n, m = C.shape
    cap = max(1, _BWD_HIST_BUDGET // max(1, iters * n * m * 4))
    G = _group(b, min(4, cap), "MADELEINE_IPOT_BWD_GROUP")
    return pl.pallas_call(
        functools.partial(_bwd_kernel, beta=beta, iters=iters),
        grid=(b // G,),
        in_specs=[
            pl.BlockSpec((G, n, m), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, n, m), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((G, n, m), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, m), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((iters, G, n, m), jnp.float32),
            pltpu.VMEM((iters, G, 1, m), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=6 * b * iters * (2 * n * m + 5 * n * m),
            bytes_accessed=3 * b * n * m * 4,
            transcendentals=b * n * m,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(C, g)


def _gw_kernel(cs_ref, ct_ref, cst_ref, g_ref, *, beta: float, outer: int,
               iters: int):
    """Whole Gromov-Wasserstein gamma loop per group in VMEM
    (ref: loss.py:236-258): `outer` proximal updates of
        C_gamma = Cst - 2 Cs @ gamma @ Ct^T;  gamma = IPOT(C_gamma)
    with uniform marginals (gamma_0 = 1/(n m)). Forward-only: the caller
    detaches gamma (ref: loss.py:248 .detach()), so no adjoint is needed.
    The per-problem matmuls issue as G independent MXU dots per outer
    iteration; the inner IPOT runs group-batched."""
    Cs = cs_ref[...].astype(jnp.float32)               # [G, n, n]
    Ct = ct_ref[...].astype(jnp.float32)               # [G, m, m]
    Cst = cst_ref[...].astype(jnp.float32)             # [G, n, m]
    G, n, m = Cst.shape

    def outer_body(_, gamma):
        cg = []
        for g in range(G):                             # G independent dots
            t1 = _dot(Cs[g], gamma[g], ((1,), (0,)))   # [n, m]
            cg.append(Cst[g] - 2.0 * _dot(t1, Ct[g], ((1,), (1,))))
        A = jnp.exp(-jnp.stack(cg) / beta)             # [G, n, m]

        def ib(_, carry):
            T, sigma = carry
            T1, s1, _, _ = _step(A, T, sigma, n, m)
            return T1, s1

        T0 = jnp.ones((G, n, m), jnp.float32)
        s0 = jnp.full((G, 1, m), 1.0 / m, jnp.float32)
        T, _ = jax.lax.fori_loop(0, iters, ib, (T0, s0))
        return T

    gamma0 = jnp.full((G, n, m), 1.0 / (n * m), jnp.float32)
    g_ref[...] = jax.lax.fori_loop(0, outer, outer_body, gamma0
                                   ).astype(g_ref.dtype)


@functools.partial(jax.jit, static_argnames=("beta", "outer", "iters",
                                             "interpret"))
def gw_gamma_fused(Cs, Ct, Cst, beta=0.1, outer=5, iters=20,
                   interpret=False):
    """Converged GW transport plans for a batch of problems, one pallas_call.
    Cs [b,n,n], Ct [b,m,m], Cst [b,n,m] -> gamma [b,n,m] f32.
    NOT differentiable (callers stop_gradient gamma anyway)."""
    b, n, m = Cst.shape
    G = _group(b, 4, "MADELEINE_GW_GROUP")
    return pl.pallas_call(
        functools.partial(_gw_kernel, beta=beta, outer=outer, iters=iters),
        grid=(b // G,),
        in_specs=[
            pl.BlockSpec((G, n, n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, m, m), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, n, m), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((G, n, m), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, m), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * outer * (2 * n * m * max(n, m)
                                   + iters * 7 * n * m),
            bytes_accessed=b * (n * n + m * m + 2 * n * m) * 4,
            transcendentals=b * outer * n * m,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(Cs, Ct, Cst)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def ipot_plan_fused(C: jnp.ndarray, beta: float = 0.5,
                    iterations: int = 50) -> jnp.ndarray:
    """Drop-in `ipot_plan` with the whole loop fused on-chip (TPU).
    C: [b, n, m] f32 -> T [b, n, m] f32. Differentiable (exact unrolled-loop
    adjoint, matching XLA autodiff semantics)."""
    return _fwd_call(C, beta=beta, iters=iterations)


def _ipf_fwd(C, beta, iterations):
    return _fwd_call(C, beta=beta, iters=iterations), C


def _ipf_bwd(beta, iterations, C, g):
    return (_bwd_call(C, g, beta=beta, iters=iterations),)


ipot_plan_fused.defvjp(_ipf_fwd, _ipf_bwd)
