"""Fully-fused slide encoder kernel: pre-attn MLP + gates + softmax pooling.

The inference hot path is
    x -> [Linear 512->512, LN, GELU] x2 -> [Linear 512->2048, LN, GELU]
      -> per-head gated scores -> online-softmax pooled [nh*e]
(ref: Model.py:350-417 + abmil.py:41-68). All weights total ~7.5 MB bf16, so
the ENTIRE encoder fits in VMEM: this kernel streams token blocks and performs
every matmul/LN/GELU/gate/pool step on-chip. HBM traffic collapses to one read
of the input features plus the [b, E] output — the unfused pipeline writes and
re-reads ~6x that in intermediates.

Inference-only (no dropout, softmax activation, no VJP); `gated_pool.py` and
the XLA path remain for training and fallbacks. Requires head-major layout.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from madeleine_tpu.ops.attn_pool import (
    NEG_INF,
    _head_expand_matrix,
    _normalize_mask,
)

_HI = jax.lax.Precision.HIGHEST
LN_EPS = 1e-5


def _erf(x):
    """Abramowitz & Stegun 7.1.26 rational erf (|err| <= 1.5e-7) — Mosaic
    implements neither erf nor erfc, so the kernel carries its own."""
    a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
    a4, a5, p = -1.453152027, 1.061405429, 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return s * (1.0 - poly * jnp.exp(-ax * ax))


# Set MADELEINE_EXACT_ERF=1 to force the A&S erf everywhere (including the
# bf16 compute paths).
_EXACT_ERF = bool(os.environ.get("MADELEINE_EXACT_ERF"))

# erf(x) ~= tanh(x * P(x^2)), P degree 4 — weighted least-squares fit of
# atanh(erf) (weight 1-erf^2): max |err| 3.5e-6 on [0, inf), exact odd
# symmetry, tail saturates to 1 (positive leading coefficient). v5e VPU
# costs (scripts/bench_vpu_ops.py): tanh is a ~0.74-cycle hardware op while
# the A&S chain costs ~13.2 cycles/vreg (its reciprocal alone ~3.9) — ~2x
# cheaper at 500x below bf16 resolution. Used only when the kernel's compute
# dtype is sub-f32; f32 (golden/parity) paths keep the A&S erf bit-for-bit.
_ERF_TANH_C = (1.12836141, 1.02912513e-1, -4.67876657e-4, -4.28175433e-4,
               3.39589343e-5)


def _erf_tanh(x32):
    t = x32 * x32
    c0, c1, c2, c3, c4 = _ERF_TANH_C
    p = jnp.float32(c4)
    p = p * t + jnp.float32(c3)
    p = p * t + jnp.float32(c2)
    p = p * t + jnp.float32(c1)
    p = p * t + jnp.float32(c0)
    return jnp.tanh(x32 * p)


def _erf_auto(x32, fast: bool):
    if fast and not _EXACT_ERF:
        return _erf_tanh(x32)
    return _erf(x32)


# Q(t) = P(t) + 2t*P'(t) for the _ERF_TANH_C polynomial P — the derivative
# chain d/dx[x*P(x^2)] evaluated as one Horner pass.
_ERF_TANH_Q = tuple((2 * k + 1) * c for k, c in enumerate(_ERF_TANH_C))


def _gelu_grad_tanh(v32, Phi):
    """gelu'(v) for the tanh-form GELU actually computed on sub-f32 paths.

    Forward (sub-f32): gelu(v) = v*Phi(v), Phi = 0.5*(1 + tanh(x*P(x^2))),
    x = v/sqrt(2). This is that function's TRUE derivative:
        Phi + v * 0.5*(1 - T^2) * Q(x^2) / sqrt(2),   T = 2*Phi - 1,
    with Q = P + 2t*P' — so the backward reuses the forward tanh (recovered
    from Phi by one FMA) and spends a 4-FMA Horner chain where the exact-phi
    form spends an exp (the exp(-v^2/2) never runs). Gradient/function
    consistency beats grafting the exact-gelu derivative onto an approximate
    forward; max |err| vs exact gelu' is pinned in
    tests/test_transcendentals.py. Large |v|: tanh saturates, (1 - T^2) hits
    exactly 0 in f32 before the polynomial can overflow."""
    c0, c1, c2, c3, c4 = _ERF_TANH_Q
    t = 0.5 * v32 * v32  # (v/sqrt(2))^2
    q = jnp.float32(c4)
    q = q * t + jnp.float32(c3)
    q = q * t + jnp.float32(c2)
    q = q * t + jnp.float32(c1)
    q = q * t + jnp.float32(c0)
    T = 2.0 * Phi - 1.0
    return Phi + v32 * ((1.0 - T * T) * q) * jnp.float32(0.5 * 2.0 ** -0.5)


def _sigmoid_tanh(z32):
    """sigmoid(z) = 0.5*(1+tanh(z/2)) — exact identity; tanh is a hardware
    op on v5e (~0.74 cycles/vreg) while the exp+recip sigmoid lowering costs
    ~3.8 (scripts/bench_vpu_ops.py)."""
    return 0.5 * (1.0 + jnp.tanh(0.5 * z32))


def _ln_gelu(x32, scale, bias, fast: bool = False):
    """LayerNorm (fp32 stats) + erf GELU (polynomial erf); returns fp32."""
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + LN_EPS)
    y = y * scale + bias
    return 0.5 * y * (1.0 + _erf_auto(y * (2.0 ** -0.5), fast))


def _encode_kernel(x_ref, mb_ref,
                   w1_ref, b1_ref, s1_ref, t1_ref,
                   w2_ref, b2_ref, s2_ref, t2_ref,
                   w3_ref, b3_ref, s3_ref, t3_ref,
                   wa_ref, ba_ref, wb_ref, bb_ref, wc_ref, bc_ref,
                   o_ref, m_acc, s_acc, w_acc,
                   *, e: int, nh: int, f: int):
    """Grid = (b, nt), t innermost. x_ref: [1, T, d_in]; o_ref: [1, 1, E]."""
    tb = pl.program_id(1)

    @pl.when(tb == 0)
    def _init():
        m_acc[...] = jnp.full_like(m_acc, NEG_INF)
        s_acc[...] = jnp.zeros_like(s_acc)
        w_acc[...] = jnp.zeros_like(w_acc)

    x = x_ref[0]                                           # [T, d_in]
    dt = x.dtype
    # ---- pre-attention MLP, all in VMEM -------------------------------
    fast = dt != jnp.float32
    h = _ln_gelu(jnp.dot(x, w1_ref[...],
                         preferred_element_type=jnp.float32) + b1_ref[...],
                 s1_ref[...], t1_ref[...], fast)
    h = _ln_gelu(jnp.dot(h.astype(dt), w2_ref[...],
                         preferred_element_type=jnp.float32) + b2_ref[...],
                 s2_ref[...], t2_ref[...], fast)
    y32 = _ln_gelu(jnp.dot(h.astype(dt), w3_ref[...],
                           preferred_element_type=jnp.float32) + b3_ref[...],
                   s3_ref[...], t3_ref[...], fast)         # [T, E] fp32
    y = y32.astype(dt)

    # ---- gates + logits per head ---------------------------------------
    logit_cols = []
    for hd in range(nh):
        yh = y[:, hd * e:(hd + 1) * e]
        a = jnp.tanh(jnp.dot(yh, wa_ref[hd],
                             preferred_element_type=jnp.float32)
                     + ba_ref[hd][None, :])
        g = a * _sigmoid_tanh(jnp.dot(yh, wb_ref[hd],
                                      preferred_element_type=jnp.float32)
                              + bb_ref[hd][None, :])
        l_h = jnp.sum(g * wc_ref[hd][None, :], axis=1,
                      keepdims=True) + bc_ref[hd][0]
        logit_cols.append(l_h)
    l = jnp.concatenate(logit_cols, axis=1) + mb_ref[0].astype(jnp.float32)

    # ---- online softmax pooling over y ---------------------------------
    # head tiling via lane broadcast+concat (exact; the selection-matrix dot
    # pads its tiny output tile ~32x on the MXU — see ops/attn_pool.py)
    from madeleine_tpu.ops.attn_pool import _tile_heads

    m_old = m_acc[...]
    m_new = jnp.maximum(m_old, jnp.max(l, axis=0, keepdims=True))
    alpha = jnp.exp(m_old - m_new)
    p = jnp.exp(l - m_new)
    p_e = _tile_heads(p, e)
    alpha_e = _tile_heads(alpha, e)
    m_acc[...] = m_new
    s_acc[...] = s_acc[...] * alpha + jnp.sum(p, axis=0, keepdims=True)
    w_acc[...] = w_acc[...] * alpha_e + jnp.sum(y32 * p_e, axis=0,
                                                keepdims=True)

    @pl.when(tb == pl.num_programs(1) - 1)
    def _finalize():
        s = jnp.maximum(s_acc[...], 1e-30)
        o_ref[0] = (w_acc[...] / _tile_heads(s, e)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("e", "nh", "f", "t_block",
                                             "interpret"))
def _encode_fused_call(x, mask_bias, pre, attn, *, e, nh, f, t_block,
                       interpret=False):
    b, t, d_in = x.shape
    E = e * nh
    nt = pl.cdiv(t, t_block)
    t_pad = nt * t_block - t
    if t_pad:
        x = jnp.pad(x, ((0, 0), (0, t_pad), (0, 0)))
        mask_bias = jnp.pad(mask_bias, ((0, 0), (0, t_pad), (0, 0)),
                            constant_values=NEG_INF)

    def vspec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i, j, _n=nd: (0,) * _n,
                            memory_space=pltpu.VMEM)

    kernel = functools.partial(_encode_kernel, e=e, nh=nh, f=f)
    return pl.pallas_call(
        kernel,
        grid=(b, nt),
        in_specs=[
            pl.BlockSpec((1, t_block, d_in), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_block, nh), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            vspec(pre[0].shape), vspec(pre[1].shape),   # w1, b1
            vspec(pre[2].shape), vspec(pre[3].shape),   # ln1 scale/bias
            vspec(pre[4].shape), vspec(pre[5].shape),   # w2, b2
            vspec(pre[6].shape), vspec(pre[7].shape),
            vspec(pre[8].shape), vspec(pre[9].shape),   # w3, b3
            vspec(pre[10].shape), vspec(pre[11].shape),
            vspec(attn[0].shape), vspec(attn[1].shape),  # wa, ba
            vspec(attn[2].shape), vspec(attn[3].shape),  # wb, bb
            vspec(attn[4].shape), vspec(attn[5].shape),  # wc, bc
        ],
        out_specs=pl.BlockSpec((1, 1, E), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 1, E), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((1, nh), jnp.float32),
            pltpu.VMEM((1, nh), jnp.float32),
            pltpu.VMEM((1, E), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * (t + t_pad) * (d_in * e + e * e + e * E
                                         + 2 * E * f + E),
            bytes_accessed=x.size * x.dtype.itemsize + b * E * 4,
            transcendentals=4 * b * (t + t_pad) * E,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, mask_bias, *pre, *attn)


def encode_pool_fused(
    emb_params,                           # abmil param subtree
    feats: jnp.ndarray,                   # [b, t, d_in]
    mask: Optional[jnp.ndarray] = None,   # [b, t]
    t_block: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Whole-encoder fused forward -> pooled [b, nh, e] (softmax, no dropout)."""
    b, t, d_in = feats.shape
    pre_p = emb_params["pre_attn"]
    attn_p = emb_params["attn"]
    nh = attn_p["wa"].shape[0]
    f = attn_p["wa"].shape[-1]
    E = pre_p["fc3"]["w"].shape[1]
    e = E // nh
    dt = feats.dtype

    m = _normalize_mask(mask, b, t)
    if m is None:
        mask_bias = jnp.zeros((b, t, nh), jnp.float32)
    else:
        mask_bias = jnp.broadcast_to(
            jnp.where(m[..., None], 0.0, NEG_INF), (b, t, nh)
        ).astype(jnp.float32)

    f32 = jnp.float32
    pre = (
        pre_p["fc1"]["w"].astype(dt), pre_p["fc1"]["b"].astype(f32),
        pre_p["ln1"]["scale"].astype(f32), pre_p["ln1"]["bias"].astype(f32),
        pre_p["fc2"]["w"].astype(dt), pre_p["fc2"]["b"].astype(f32),
        pre_p["ln2"]["scale"].astype(f32), pre_p["ln2"]["bias"].astype(f32),
        pre_p["fc3"]["w"].astype(dt), pre_p["fc3"]["b"].astype(f32),
        pre_p["ln3"]["scale"].astype(f32), pre_p["ln3"]["bias"].astype(f32),
    )
    attn = (
        attn_p["wa"].astype(dt), attn_p["ba"].astype(f32),
        attn_p["wb"].astype(dt), attn_p["bb"].astype(f32),
        attn_p["wc"].reshape(nh, f).astype(f32),
        attn_p["bc"].reshape(nh, 1).astype(f32),
    )
    pooled = _encode_fused_call(feats, mask_bias, pre, attn,
                                e=e, nh=nh, f=f, t_block=t_block,
                                interpret=interpret)
    return pooled.reshape(b, nh, e)
