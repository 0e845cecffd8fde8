"""GOT glue kernels — threshold/relu cost assembly and the GW trace.

Between the cosine-cost matmuls and the fused IPOT/GW loop kernels
(ops/ipot.py), the GOT loss (ref: loss.py:236-301) runs ~20 XLA fusions of
elementwise + reduction passes over the [S*b, n, m] cost tensors (threshold
relu x3, Cs^2/Ct^2 row sums, the Cst outer-sum, C_final assembly, the final
traces — plus all their backward passes). At canonical scale (260 problems,
256x256, f32 = 68 MB per tensor) that's ~4 ms/step of HBM round-trips
(round-3 profile). The two ops here fuse those passes so each cost tensor is
read/written once per direction:

  threshold_build:  (C0, Cs0, Ct0, thr) -> (C, Cs, Ct, Cst)
      C   = relu(C0  - thr[:, 0])                (ref: loss.py:288-292)
      Cs  = relu(Cs0 - thr[:, 1])                (ref: loss.py:225-233)
      Ct  = relu(Ct0 - thr[:, 2])
      Cst = (Cs^2 p) 1_m^T + 1_n (q^T (Ct^2)^T)  (ref: loss.py:240-241)
    Differentiable in all four inputs — the thr cotangent flows back into
    the caller's min/max threshold statistics exactly as XLA's autodiff
    would route it (the min/max themselves stay OUTSIDE the kernel, so
    their subgradient scatter semantics are XLA's own).

  gw_trace:  (Cs, Ct, Cst, gamma) -> sum((Cst - 2 Cs gamma Ct^T) * gamma)
    per problem (ref: loss.py:252-258) WITHOUT materializing the [b, n, m]
    C_final tensor. gamma is detached by every caller (ref: loss.py:248);
    its cotangent is a symbolic zero feeding stop_gradient, DCE'd by XLA.

Both are group-batched like ops/ipot.py: G independent problems per grid
step give the scheduler interleavable chains and batch the elementwise work
to [G, n, m] tiles.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from madeleine_tpu.ops.ipot import _dot, _group


def _interp() -> bool:
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# threshold_build
# ---------------------------------------------------------------------------

def _tb_fwd_kernel(thr_ref, c0_ref, cs0_ref, ct0_ref,
                   c_ref, cs_ref, ct_ref, cst_ref, *, G: int):
    base = pl.program_id(0) * G
    C0 = c0_ref[...].astype(jnp.float32)              # [G, n, m]
    Cs0 = cs0_ref[...].astype(jnp.float32)            # [G, n, n]
    Ct0 = ct0_ref[...].astype(jnp.float32)            # [G, m, m]
    _, n, m = C0.shape
    # Cst_{ij} = (1/n) sum_k Cs^2_{ik} + (1/m) sum_k Ct^2_{jk}. Row sums run
    # as per-problem ones-contractions on the MXU — same accumulation the
    # XLA einsums ("bnk,bko->bno" with p, "bko,bmk->bom" with q) used, and
    # the Ct sum lands directly on the LANE axis ([1, m]) without a
    # sublane->lane transpose (no Mosaic lowering for that). Thresholds are
    # per-problem SMEM scalars applied as rank-0 broadcasts inside the g
    # loop (stacking them into a [G, 1, 1] vector has no Mosaic lowering:
    # "tpu.reshape vector<Gxf32> -> vector<Gx1x1xf32>").
    p_n = jnp.full((n, 1), 1.0 / n, jnp.float32)
    q_m = jnp.full((m, 1), 1.0 / m, jnp.float32)
    for g in range(G):
        C = jax.nn.relu(C0[g] - thr_ref[base + g, 0])
        Cs = jax.nn.relu(Cs0[g] - thr_ref[base + g, 1])
        Ct = jax.nn.relu(Ct0[g] - thr_ref[base + g, 2])
        c_ref[g] = C
        cs_ref[g] = Cs
        ct_ref[g] = Ct
        cs2p = _dot(Cs * Cs, p_n, ((1,), (0,)))                  # [n, 1]
        ct2q = _dot(q_m, Ct * Ct, ((0,), (1,)))                  # [1, m]
        cst_ref[g] = cs2p + ct2q


def _tb_bwd_kernel(thr_ref, c0_ref, cs0_ref, ct0_ref,
                   dc_ref, dcs_ref, dct_ref, dcst_ref,
                   dc0_ref, dcs0_ref, dct0_ref, dthr_ref, *, G: int):
    base = pl.program_id(0) * G
    C0 = c0_ref[...].astype(jnp.float32)
    Cs0 = cs0_ref[...].astype(jnp.float32)
    Ct0 = ct0_ref[...].astype(jnp.float32)
    dC = dc_ref[...].astype(jnp.float32)
    dCs = dcs_ref[...].astype(jnp.float32)
    dCt = dct_ref[...].astype(jnp.float32)
    dCst = dcst_ref[...].astype(jnp.float32)
    _, n, m = C0.shape

    # Cst backward: row sums of dCst scale Cs, column sums scale Ct.
    # Thresholds as rank-0 SMEM-scalar broadcasts per problem (see fwd).
    dcs2p = jnp.sum(dCst, axis=2, keepdims=True)                 # [G, n, 1]
    # column sum as a per-problem ones-contraction so the result lands on
    # the SUBLANE axis ([m, 1]) without a lane->sublane transpose
    ones_n = jnp.ones((n, 1), jnp.float32)
    for g in range(G):
        thr_c = thr_ref[base + g, 0]
        thr_s = thr_ref[base + g, 1]
        thr_t = thr_ref[base + g, 2]
        keep_s = Cs0[g] > thr_s
        keep_t = Ct0[g] > thr_t
        Cs = jnp.where(keep_s, Cs0[g] - thr_s, 0.0)
        Ct = jnp.where(keep_t, Ct0[g] - thr_t, 0.0)
        dct2q = _dot(dCst[g], ones_n, ((0,), (0,)))              # [m, 1]
        dCs_tot = dCs[g] + (2.0 / n) * Cs * dcs2p[g]
        dCt_tot = dCt[g] + (2.0 / m) * Ct * dct2q
        dC0g = jnp.where(C0[g] > thr_c, dC[g], 0.0)
        dCs0g = jnp.where(keep_s, dCs_tot, 0.0)
        dCt0g = jnp.where(keep_t, dCt_tot, 0.0)
        dc0_ref[g] = dC0g
        dcs0_ref[g] = dCs0g
        dct0_ref[g] = dCt0g
        dthr_ref[base + g, 0] = -jnp.sum(dC0g)      # scalars to SMEM
        dthr_ref[base + g, 1] = -jnp.sum(dCs0g)
        dthr_ref[base + g, 2] = -jnp.sum(dCt0g)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _tb_fwd_call(C0, Cs0, Ct0, thr, *, interpret=False):
    b, n, m = C0.shape
    G = _group(b, 4, "MADELEINE_GOTGLUE_GROUP")
    f32 = jnp.float32
    specs3 = [pl.BlockSpec((G,) + s, lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
              for s in ((n, m), (n, n), (m, m))]
    out_specs = [pl.BlockSpec((G,) + s, lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)
                 for s in ((n, m), (n, n), (m, m), (n, m))]
    return pl.pallas_call(
        functools.partial(_tb_fwd_kernel, G=G),
        grid=(b // G,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + specs3,
        out_specs=tuple(out_specs),
        out_shape=(
            jax.ShapeDtypeStruct((b, n, m), f32),
            jax.ShapeDtypeStruct((b, n, n), f32),
            jax.ShapeDtypeStruct((b, m, m), f32),
            jax.ShapeDtypeStruct((b, n, m), f32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=8 * b * n * m,
            bytes_accessed=(2 * (n * m + n * n + m * m) + n * m) * b * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(thr, C0, Cs0, Ct0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _tb_bwd_call(C0, Cs0, Ct0, thr, dC, dCs, dCt, dCst, *, interpret=False):
    b, n, m = C0.shape
    G = _group(b, 4, "MADELEINE_GOTGLUE_GROUP")
    f32 = jnp.float32

    def spec(s):
        nd = len(s)
        return pl.BlockSpec((G,) + s, lambda i, _n=nd: (i,) + (0,) * _n,
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_tb_bwd_kernel, G=G),
        grid=(b // G,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  spec((n, m)), spec((n, n)), spec((m, m)),
                  spec((n, m)), spec((n, n)), spec((m, m)), spec((n, m))],
        out_specs=(spec((n, m)), spec((n, n)), spec((m, m)),
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        out_shape=(
            jax.ShapeDtypeStruct((b, n, m), f32),
            jax.ShapeDtypeStruct((b, n, n), f32),
            jax.ShapeDtypeStruct((b, m, m), f32),
            jax.ShapeDtypeStruct((b, 3), f32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=12 * b * n * m,
            bytes_accessed=3 * (n * m + n * n + m * m) * b * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=80 * 1024 * 1024),
        interpret=interpret,
    )(thr, C0, Cs0, Ct0, dC, dCs, dCt, dCst)


@jax.custom_vjp
def threshold_build(C0: jnp.ndarray, Cs0: jnp.ndarray, Ct0: jnp.ndarray,
                    thr: jnp.ndarray):
    """Fused threshold-relu + GW Cst assembly (see module docstring).

    C0 [b, n, m], Cs0 [b, n, n], Ct0 [b, m, m], thr [b, 3] f32
    -> (C [b,n,m], Cs [b,n,n], Ct [b,m,m], Cst [b,n,m]), all f32.
    """
    return _tb_fwd_call(C0, Cs0, Ct0, thr, interpret=_interp())


def _tb_fwd(C0, Cs0, Ct0, thr):
    outs = _tb_fwd_call(C0, Cs0, Ct0, thr, interpret=_interp())
    return outs, (C0, Cs0, Ct0, thr)


def _tb_bwd(res, cots):
    C0, Cs0, Ct0, thr = res
    dC, dCs, dCt, dCst = cots
    dC0, dCs0, dCt0, dthr = _tb_bwd_call(
        C0, Cs0, Ct0, thr, dC, dCs, dCt, dCst, interpret=_interp())
    return dC0, dCs0, dCt0, dthr


threshold_build.defvjp(_tb_fwd, _tb_bwd)


# ---------------------------------------------------------------------------
# gw_trace
# ---------------------------------------------------------------------------

def _gwt_fwd_kernel(cs_ref, ct_ref, cst_ref, g_ref, out_ref, *, G: int):
    base = pl.program_id(0) * G
    Cs = cs_ref[...].astype(jnp.float32)              # [G, n, n]
    Ct = ct_ref[...].astype(jnp.float32)              # [G, m, m]
    Cst = cst_ref[...].astype(jnp.float32)            # [G, n, m]
    gam = g_ref[...].astype(jnp.float32)              # [G, n, m]
    for g in range(G):                                # G independent dots
        t1 = _dot(Cs[g], gam[g], ((1,), (0,)))        # [n, m]
        cf = Cst[g] - 2.0 * _dot(t1, Ct[g], ((1,), (1,)))
        out_ref[base + g] = jnp.sum(cf * gam[g])      # scalar to SMEM


def _gwt_bwd_kernel(dout_ref, cs_ref, ct_ref, g_ref,
                    dcs_ref, dct_ref, dcst_ref, *, G: int):
    base = pl.program_id(0) * G
    Cs = cs_ref[...].astype(jnp.float32)
    Ct = ct_ref[...].astype(jnp.float32)
    gam = g_ref[...].astype(jnp.float32)
    dcs, dct, dcst = [], [], []
    for g in range(G):
        dv = dout_ref[base + g]                       # scalar from SMEM
        # d f / d Cs[a,b] = -2 sum_m gam[a,m] * (sum_l gam[b,l] Ct[m,l])
        P = _dot(gam[g], Ct[g], ((1,), (1,)))         # P[b, m]
        dcs.append(-2.0 * dv * _dot(gam[g], P, ((1,), (1,))))
        # d f / d Ct[c,d] = -2 sum_{n,k} gam[n,c] Cs[n,k] gam[k,d]
        gtc = _dot(gam[g], Cs[g], ((0,), (0,)))       # [m, n] = gamma^T Cs
        dct.append(-2.0 * dv * _dot(gtc, gam[g], ((1,), (0,))))
        dcst.append(dv * gam[g])
    dcs_ref[...] = jnp.stack(dcs)                     # [G, n, n]
    dct_ref[...] = jnp.stack(dct)                     # [G, m, m]
    dcst_ref[...] = jnp.stack(dcst)                   # [G, n, m]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _gwt_fwd_call(Cs, Ct, Cst, gamma, *, interpret=False):
    b, n, m = Cst.shape
    G = _group(b, 4, "MADELEINE_GOTGLUE_GROUP")

    def spec(s):
        nd = len(s)
        return pl.BlockSpec((G,) + s, lambda i, _n=nd: (i,) + (0,) * _n,
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_gwt_fwd_kernel, G=G),
        grid=(b // G,),
        in_specs=[spec((n, n)), spec((m, m)), spec((n, m)), spec((n, m))],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((b,), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * (n * m * n + n * m * m + n * m),
            bytes_accessed=(n * n + m * m + 2 * n * m) * b * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(Cs, Ct, Cst, gamma)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _gwt_bwd_call(Cs, Ct, gamma, dout, *, interpret=False):
    b, n, m = gamma.shape
    G = _group(b, 4, "MADELEINE_GOTGLUE_GROUP")

    def spec(s):
        nd = len(s)
        return pl.BlockSpec((G,) + s, lambda i, _n=nd: (i,) + (0,) * _n,
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_gwt_bwd_kernel, G=G),
        grid=(b // G,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  spec((n, n)), spec((m, m)), spec((n, m))],
        out_specs=(spec((n, n)), spec((m, m)), spec((n, m))),
        out_shape=(
            jax.ShapeDtypeStruct((b, n, n), jnp.float32),
            jax.ShapeDtypeStruct((b, m, m), jnp.float32),
            jax.ShapeDtypeStruct((b, n, m), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * (n * m * n + n * m * m),
            bytes_accessed=2 * (n * n + m * m + n * m) * b * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(dout, Cs, Ct, gamma)


@jax.custom_vjp
def gw_trace(Cs: jnp.ndarray, Ct: jnp.ndarray, Cst: jnp.ndarray,
             gamma: jnp.ndarray) -> jnp.ndarray:
    """Per-problem GW objective sum((Cst - 2 Cs gamma Ct^T) * gamma) -> [b]
    without materializing C_final. gamma is treated as detached (its
    cotangent is zero — every caller stop_gradients it, ref loss.py:248)."""
    return _gwt_fwd_call(Cs, Ct, Cst, gamma, interpret=_interp())


def _gwt_fwd(Cs, Ct, Cst, gamma):
    out = _gwt_fwd_call(Cs, Ct, Cst, gamma, interpret=_interp())
    return out, (Cs, Ct, gamma)


def _gwt_bwd(res, dout):
    Cs, Ct, gamma = res
    dCs, dCt, dCst = _gwt_bwd_call(Cs, Ct, gamma, dout,
                                   interpret=_interp())
    # gamma is detached by every caller; zero cotangent feeds a
    # stop_gradient and is DCE'd
    return dCs, dCt, dCst, jnp.zeros_like(gamma)


gw_trace.defvjp(_gwt_fwd, _gwt_bwd)
