"""Fused pre-attention MLP for TRAINING — Pallas forward AND backward.

Semantics (ref: Model.py:350-363): 3x [Linear -> LayerNorm -> GELU(exact) ->
Dropout(0.1)], widths d_in -> hidden -> hidden -> hidden*n_heads.

Unfused, XLA materializes every [bs*t, hidden(*nh)] intermediate in HBM and
each Dropout is an opaque kernel boundary (no fusion into the matmul
epilogues). This op runs the whole MLP per token-block in VMEM: the weights
(~3 MB bf16) stay resident, dropout draws 16-bit hardware-RNG thresholds
in-kernel, and only the input x and output y ever touch HBM.

The custom-VJP backward re-seeds the same per-(block, layer) streams,
recomputes the layer stack per block, and emits dx plus ALL weight/LN grads
in one pass (f32 accumulators resident in VMEM across the sequential grid).
Residuals: (x, params, seed) — zero bytes of saved activations.

GELU is the exact erf form (torch nn.GELU default); the kernel carries the
Abramowitz–Stegun 7.1.26 polynomial erf (|err| <= 1.5e-7) because Mosaic has
no erf, and its backward uses gelu'(u) = Phi(u) + u*phi(u).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from madeleine_tpu.ops.encode_fused import (
    _EXACT_ERF,
    _erf,
    _erf_auto,
    _gelu_grad_tanh,
)

LN_EPS = 1e-5
DEFAULT_RATE = 0.1        # ref: Model.py:354,358,362
# token-block size (env-tunable for sweeps; measured best at canonical scale)
DEFAULT_T_BLOCK = int(os.environ.get("MADELEINE_PREATTN_TBLOCK", "256"))
_INV_SQRT2 = 2.0 ** -0.5
_INV_SQRT_2PI = 0.3989422804014327

# --- measurement probes (NEVER for training — numerically WRONG variants) ---
# MADELEINE_PROBE_BWD: comma-set of {gelu_identity, ln_nocenter, ln_mxu_mean}.
# The encoder backward runs at 1.41x its matmul floor (BASELINE.md round 4);
# each probe statically deletes (or restructures) one VPU chain so an on-chip
# step time bounds what a CORRECT restructure of that chain could ever save.
# ln_mxu_mean is the one CORRECT variant: row-mean reductions via MXU matvec
# instead of VPU cross-lane reduce. Results: NOTES.md (round-5 LN experiment).
_PROBE_BWD = frozenset(
    p for p in os.environ.get("MADELEINE_PROBE_BWD", "").split(",") if p)


def _layer_mask(base_seed, layer: int, shape, rate: float):
    """Inverted-dropout keep-scale in f32 (16-bit hardware-RNG thresholds;
    seeded per (block, layer) so fwd/bwd regenerate identical masks).

    rate is static: at rate<=0 the PRNG is never touched, so the whole
    matmul/LN/GELU/VJP path lowers in interpret mode on CPU (the hardware
    PRNG has no interpret lowering) — this is what puts the kernel math in
    the recorded CPU suite. Threshold bits: ops/prng_mask.py (8-bit when the
    block shape allows — the PRNG is the mask cost)."""
    if rate <= 0.0:
        return jnp.float32(1.0)
    from madeleine_tpu.ops.prng_mask import keep_mask

    pltpu.prng_seed(base_seed + layer)
    return keep_mask(shape, rate)


def _block_seed(seed_ref):
    return seed_ref[0] + (pl.program_id(0) * pl.num_programs(1)
                          + pl.program_id(1)) * 3


def _ln_stats(z32):
    mean = jnp.mean(z32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(z32 - mean), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + LN_EPS)
    u = (z32 - mean) * rstd
    return u, rstd


def _gelu(v32):
    return 0.5 * v32 * (1.0 + _erf(v32 * _INV_SQRT2))


def _gauss_cdf(v32, fast: bool = False):
    """Phi(v) = 0.5*(1+erf(v/sqrt(2))) — gelu(v) = v*Phi(v).

    fast=True (sub-f32 compute) routes to the tanh-form erf
    (encode_fused._erf_tanh, |err| 3.5e-6 — 500x below bf16 resolution,
    ~2x cheaper on the v5e VPU); f32 paths keep the A&S erf bit-for-bit.
    Kill switch: MADELEINE_EXACT_ERF=1."""
    return 0.5 * (1.0 + _erf_auto(v32 * _INV_SQRT2, fast))


def _gelu_grad(v32):
    phi = jnp.exp(-0.5 * v32 * v32) * _INV_SQRT_2PI
    return _gauss_cdf(v32) + v32 * phi


def _gelu_grad_from_cdf(v32, Phi, fast: bool = False):
    """gelu'(v) reusing a forward-computed Phi — the erf (the single most
    expensive VPU chain in the train kernels, measured ~8.7 us per [256,2048]
    block-pass) is never recomputed in the backward.

    fast=True (sub-f32 compute, matching the forward's _gauss_cdf routing)
    uses the tanh-form GELU's true derivative — recovers the forward tanh
    from Phi and spends an FMA chain instead of exp(-v^2/2)
    (encode_fused._gelu_grad_tanh). f32 paths keep the exact-phi form
    bit-for-bit. Kill switch: MADELEINE_EXACT_ERF=1 (same as the erf)."""
    if fast and not _EXACT_ERF:
        return _gelu_grad_tanh(v32, Phi)
    return Phi + v32 * (jnp.exp(-0.5 * v32 * v32) * _INV_SQRT_2PI)


def _layer_fwd(x, w_ref, b_ref, s_ref, t_ref, mask, prec):
    """One Linear+LN+GELU+Dropout layer; returns (out32, residual tuple).

    The tanh-form erf kicks in when the compute dtype is sub-f32 (bf16
    training); f32 paths keep the A&S erf exactly."""
    z = jnp.dot(x, w_ref[...], preferred_element_type=jnp.float32,
                precision=prec) + b_ref[...]
    u, rstd = _ln_stats(z)
    v = u * s_ref[...] + t_ref[...]
    Phi = _gauss_cdf(v, fast=x.dtype != jnp.float32)
    return (v * Phi) * mask, (u, rstd, v, Phi)


def _fwd_kernel(seed_ref, x_ref,
                w1_ref, b1_ref, s1_ref, t1_ref,
                w2_ref, b2_ref, s2_ref, t2_ref,
                w3_ref, b3_ref, s3_ref, t3_ref,
                y_ref, *, rate: float):
    x = x_ref[0]
    dt = x.dtype
    prec = (jax.lax.Precision.HIGHEST if dt == jnp.float32 else None)
    base = _block_seed(seed_ref)
    m1 = _layer_mask(base, 0, (x.shape[0], w1_ref.shape[1]), rate)
    h1, _ = _layer_fwd(x, w1_ref, b1_ref, s1_ref, t1_ref, m1, prec)
    m2 = _layer_mask(base, 1, (x.shape[0], w2_ref.shape[1]), rate)
    h2, _ = _layer_fwd(h1.astype(dt), w2_ref, b2_ref, s2_ref, t2_ref, m2, prec)
    m3 = _layer_mask(base, 2, (x.shape[0], w3_ref.shape[1]), rate)
    y, _ = _layer_fwd(h2.astype(dt), w3_ref, b3_ref, s3_ref, t3_ref, m3, prec)
    y_ref[0] = y.astype(y_ref.dtype)


def _layer_bwd(dout, hin32, res, mask, w_ref, s_ref, prec,
               dw_ref, db_ref, ds_ref, dt_ref, want_dx: bool = True):
    """Backward through one layer. dout: grad at the dropout output.
    hin32: the layer's input (f32). Returns grad w.r.t. the layer input,
    or None when want_dx=False (the input is a non-trained leaf — skips
    the dz @ w^T matmul entirely)."""
    u, rstd, v, Phi = res
    dg = dout * mask                          # through dropout
    if "gelu_identity" in _PROBE_BWD:         # probe: GELU-grad chain deleted
        dv = dg
    else:
        dv = dg * _gelu_grad_from_cdf(        # through GELU (shared erf)
            v, Phi, fast=w_ref.dtype != jnp.float32)
    ds_ref[...] += jnp.sum(dv * u, axis=0)    # LN affine grads
    dt_ref[...] += jnp.sum(dv, axis=0)
    du = dv * s_ref[...]
    # LN backward: dz = (du - mean(du) - u * mean(du*u)) * rstd
    if "ln_nocenter" in _PROBE_BWD:           # probe: centering terms deleted
        dz = du * rstd
    elif "ln_mxu_mean" in _PROBE_BWD:
        # correct restructure candidate: both row means as ONE MXU matvec
        # (row-stacked [2T, h] @ [h, 1]) instead of two VPU cross-lane
        # reduction trees that serialize with the elementwise chain
        tt, h = du.shape
        ones = jnp.full((h, 1), 1.0 / h, jnp.float32)
        means = jax.lax.dot_general(
            jnp.concatenate([du, du * u], axis=0), ones,
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        dz = (du - means[:tt] - u * means[tt:]) * rstd
    else:
        dz = (du - jnp.mean(du, axis=-1, keepdims=True)
              - u * jnp.mean(du * u, axis=-1, keepdims=True)) * rstd
    # weight grad in the COMPUTE dtype (f32 accumulate): at bf16 this is
    # exactly what the unfused XLA backward does (default matmul precision
    # truncates f32 operands to bf16); keeping the operands f32 here ran the
    # MXU in its 4-6x slower f32 mode for a third of the kernel's FLOPs.
    dzc = dz.astype(w_ref.dtype)
    dw_ref[...] += jax.lax.dot_general(
        hin32.astype(w_ref.dtype), dzc, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)
    db_ref[...] += jnp.sum(dz, axis=0)
    if not want_dx:
        return None
    return jax.lax.dot_general(
        dzc, w_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)


def _bwd_kernel(seed_ref, x_ref, dy_ref,
                w1_ref, b1_ref, s1_ref, t1_ref,
                w2_ref, b2_ref, s2_ref, t2_ref,
                w3_ref, b3_ref, s3_ref, t3_ref,
                dx_ref,
                dw1_ref, db1_ref, ds1_ref, dt1_ref,
                dw2_ref, db2_ref, ds2_ref, dt2_ref,
                dw3_ref, db3_ref, ds3_ref, dt3_ref,
                *, rate: float):
    is_first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)

    @pl.when(is_first)
    def _init():
        for r in (dw1_ref, db1_ref, ds1_ref, dt1_ref,
                  dw2_ref, db2_ref, ds2_ref, dt2_ref,
                  dw3_ref, db3_ref, ds3_ref, dt3_ref):
            r[...] = jnp.zeros_like(r)

    x = x_ref[0]
    dt = x.dtype
    prec = (jax.lax.Precision.HIGHEST if dt == jnp.float32 else None)
    base = _block_seed(seed_ref)

    # recompute the stack (same masks as forward)
    m1 = _layer_mask(base, 0, (x.shape[0], w1_ref.shape[1]), rate)
    h1, res1 = _layer_fwd(x, w1_ref, b1_ref, s1_ref, t1_ref, m1, prec)
    m2 = _layer_mask(base, 1, (x.shape[0], w2_ref.shape[1]), rate)
    h2, res2 = _layer_fwd(h1.astype(dt), w2_ref, b2_ref, s2_ref, t2_ref, m2,
                          prec)
    m3 = _layer_mask(base, 2, (x.shape[0], w3_ref.shape[1]), rate)
    _, res3 = _layer_fwd(h2.astype(dt), w3_ref, b3_ref, s3_ref, t3_ref, m3,
                         prec)

    dy = dy_ref[0].astype(jnp.float32)
    dh2 = _layer_bwd(dy, h2, res3, m3, w3_ref, s3_ref, prec,
                     dw3_ref, db3_ref, ds3_ref, dt3_ref)
    dh1 = _layer_bwd(dh2, h1, res2, m2, w2_ref, s2_ref, prec,
                     dw2_ref, db2_ref, ds2_ref, dt2_ref)
    dx = _layer_bwd(dh1, x.astype(jnp.float32), res1, m1, w1_ref, s1_ref,
                    prec, dw1_ref, db1_ref, ds1_ref, dt1_ref)
    dx_ref[0] = dx.astype(dx_ref.dtype)


def _pad_t(x, t_block):
    b, t, d = x.shape
    nt = pl.cdiv(t, t_block)
    t_pad = nt * t_block - t
    if t_pad:
        x = jnp.pad(x, ((0, 0), (0, t_pad), (0, 0)))
    return x, nt, t_pad


def _weight_args(pre, dt):
    f32 = jnp.float32
    return (
        pre["fc1"]["w"].astype(dt), pre["fc1"]["b"].astype(f32),
        pre["ln1"]["scale"].astype(f32), pre["ln1"]["bias"].astype(f32),
        pre["fc2"]["w"].astype(dt), pre["fc2"]["b"].astype(f32),
        pre["ln2"]["scale"].astype(f32), pre["ln2"]["bias"].astype(f32),
        pre["fc3"]["w"].astype(dt), pre["fc3"]["b"].astype(f32),
        pre["ln3"]["scale"].astype(f32), pre["ln3"]["bias"].astype(f32),
    )


def _wspecs(shapes):
    return [pl.BlockSpec(s, (lambda i, j, _n=len(s): (0,) * _n),
                         memory_space=pltpu.VMEM) for s in shapes]


@functools.partial(jax.jit, static_argnames=("rate", "t_block", "interpret"))
def _fwd_call(x, seed, *wargs, rate, t_block, interpret=False):
    b, t, d_in = x.shape
    E = wargs[8].shape[1]
    x_p, nt, t_pad = _pad_t(x, t_block)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, rate=rate),
        grid=(b, nt),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, t_block, d_in), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            *_wspecs([w.shape for w in wargs]),
        ],
        out_specs=pl.BlockSpec((1, t_block, E), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t + t_pad, E), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * (t + t_pad) * (d_in * wargs[0].shape[1]
                                         + wargs[4].shape[0] * wargs[4].shape[1]
                                         + wargs[8].shape[0] * E),
            bytes_accessed=x.size * x.dtype.itemsize
            + b * (t + t_pad) * E * x.dtype.itemsize,
            transcendentals=3 * b * (t + t_pad) * E,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024),
        interpret=interpret,
    )(seed.reshape(1), x_p, *wargs)
    return out[:, :t]


@functools.partial(jax.jit, static_argnames=("rate", "t_block", "interpret"))
def _bwd_call(x, dy, seed, *wargs, rate, t_block, interpret=False):
    b, t, d_in = x.shape
    E = wargs[8].shape[1]
    h = wargs[0].shape[1]
    x_p, nt, t_pad = _pad_t(x, t_block)
    dy_p, _, _ = _pad_t(dy, t_block)
    f32 = jnp.float32
    grad_shapes = [
        (d_in, h), (h,), (h,), (h,),
        (h, h), (h,), (h,), (h,),
        (h, E), (E,), (E,), (E,),
    ]
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, rate=rate),
        grid=(b, nt),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, t_block, d_in), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_block, E), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            *_wspecs([w.shape for w in wargs]),
        ],
        out_specs=(
            pl.BlockSpec((1, t_block, d_in), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            *_wspecs(grad_shapes),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, t + t_pad, d_in), x.dtype),
            *[jax.ShapeDtypeStruct(s, f32) for s in grad_shapes],
        ),
        cost_estimate=pl.CostEstimate(
            flops=6 * b * (t + t_pad) * (d_in * h + h * h + h * E),
            bytes_accessed=2 * (x.size * x.dtype.itemsize
                                + b * (t + t_pad) * E * x.dtype.itemsize),
            transcendentals=4 * b * (t + t_pad) * E,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(seed.reshape(1), x_p, dy_p, *wargs)
    return outs[0][:, :t], outs[1:]


# ---------------------------------------------------------------------------
# Public custom-VJP op
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def preattn_train(x: jnp.ndarray, pre, seed: jnp.ndarray,
                  rate: float = DEFAULT_RATE,
                  t_block: int = DEFAULT_T_BLOCK) -> jnp.ndarray:
    """Training-mode pre-attention MLP with fused in-kernel dropout.

    x: [b, t, d_in]; pre: the abmil 'pre_attn' subtree; seed: int32 scalar.
    Returns y [b, t, hidden * n_heads] in x.dtype.
    """
    return _pa_fwd(x, pre, seed, rate, t_block)[0]


def _interp() -> bool:
    # off-TPU the kernel runs in interpret mode (only reachable at rate<=0,
    # where the hardware PRNG is never touched) — CPU-suite coverage
    return jax.default_backend() != "tpu"


def _pa_fwd(x, pre, seed, rate, t_block):
    y = _fwd_call(x, seed, *_weight_args(pre, x.dtype),
                  rate=rate, t_block=t_block, interpret=_interp())
    return y, (x, pre, seed)


def _pa_bwd(rate, t_block, res, g):
    x, pre, seed = res
    dx, grads = _bwd_call(x, g.astype(x.dtype), seed,
                          *_weight_args(pre, x.dtype),
                          rate=rate, t_block=t_block, interpret=_interp())
    (dw1, db1, ds1, dt1, dw2, db2, ds2, dt2, dw3, db3, ds3, dt3) = grads

    def like(v, p):
        return v.astype(p.dtype)

    d_pre = {
        "fc1": {"w": like(dw1, pre["fc1"]["w"]), "b": like(db1, pre["fc1"]["b"])},
        "ln1": {"scale": like(ds1, pre["ln1"]["scale"]),
                "bias": like(dt1, pre["ln1"]["bias"])},
        "fc2": {"w": like(dw2, pre["fc2"]["w"]), "b": like(db2, pre["fc2"]["b"])},
        "ln2": {"scale": like(ds2, pre["ln2"]["scale"]),
                "bias": like(dt2, pre["ln2"]["bias"])},
        "fc3": {"w": like(dw3, pre["fc3"]["w"]), "b": like(db3, pre["fc3"]["b"])},
        "ln3": {"scale": like(ds3, pre["ln3"]["scale"]),
                "bias": like(dt3, pre["ln3"]["bias"])},
    }
    return dx, d_pre, None


preattn_train.defvjp(_pa_fwd, _pa_bwd)
