"""Fused gated-attention scoring + softmax pooling — single Pallas kernel.

The encode hot path after the pre-attention MLP is
    per head h:  l_h = (tanh(x_h Wa_h) * sigmoid(x_h Wb_h)) wc_h
    pooled_h    = sum_t softmax_t(l_h)[t] * x_h[t]
(ref: abmil.py:41-52 + Model.py:406-417). Unfused, the two gate activations
materialize ~2x the input size in HBM ([b, t, f, nh] each) before collapsing
to [b, t, nh] logits. This kernel streams token blocks, holds ALL gate weights
resident in VMEM (nh * e * f * 2 matrices ~ 4 MB bf16 at flagship size), and
never writes any intermediate to HBM: per block it computes the gates on the
MXU, reduces to logits, and folds them into the online-softmax pooled
accumulator. HBM traffic drops to one read of x plus the [b, E] output.

Requires the head-major layout (models/abmil.py): per-head x slices are
contiguous lane ranges. Inference-path only (no VJP); training uses the
unfused differentiable ops.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from madeleine_tpu.ops.encode_fused import _sigmoid_tanh

from madeleine_tpu.ops.attn_pool import (
    NEG_INF,
    _head_expand_matrix,
    _normalize_mask,
)

_HI = jax.lax.Precision.HIGHEST


def _gated_pool_kernel(x_ref, mb_ref, wa_ref, ba_ref, wb_ref, bb_ref, wc_ref,
                       bc_ref, o_ref, m_acc, s_acc, w_acc,
                       *, e: int, nh: int, f: int):
    """Grid = (b, nt), t innermost.

    x_ref:  [1, T, E]   head-major pre-attention features
    mb_ref: [1, T, nh]  additive mask bias (0 valid / NEG_INF padded)
    wa/wb:  [nh, e, f]; ba/bb: [nh, f]; wc: [nh, f]; bc: [nh, 1]
    o_ref:  [1, 1, E]   pooled output (last block)
    """
    tb = pl.program_id(1)

    @pl.when(tb == 0)
    def _init():
        m_acc[...] = jnp.full_like(m_acc, NEG_INF)
        s_acc[...] = jnp.zeros_like(s_acc)
        w_acc[...] = jnp.zeros_like(w_acc)

    x = x_ref[0]                                          # [T, E]
    t_blk = x.shape[0]
    # f32 operands need HIGHEST or the MXU truncates them to bf16; bf16
    # operands are native and unaffected (see models/abmil.dot_precision)
    gate_prec = (jax.lax.Precision.HIGHEST
                 if x.dtype == jnp.float32 else None)

    # --- gates + logits, all heads, nothing leaves VMEM -----------------
    logit_cols = []
    for h in range(nh):
        xh = x[:, h * e:(h + 1) * e]                      # contiguous slice
        a = jnp.tanh(
            jnp.dot(xh, wa_ref[h], preferred_element_type=jnp.float32,
                    precision=gate_prec)
            + ba_ref[h][None, :])
        g = a * _sigmoid_tanh(
            jnp.dot(xh, wb_ref[h], preferred_element_type=jnp.float32,
                    precision=gate_prec)
            + bb_ref[h][None, :])
        l_h = jnp.sum(g * wc_ref[h][None, :], axis=1,
                      keepdims=True) + bc_ref[h][0]       # [T, 1]
        logit_cols.append(l_h)
    l = jnp.concatenate(logit_cols, axis=1)               # [T, nh] fp32
    l = l + mb_ref[0].astype(jnp.float32)

    # --- online softmax accumulate --------------------------------------
    m_old = m_acc[...]
    m_new = jnp.maximum(m_old, jnp.max(l, axis=0, keepdims=True))
    alpha = jnp.exp(m_old - m_new)
    p = jnp.exp(l - m_new)                                # [T, nh]

    # head tiling via lane broadcast+concat (exact; the selection-matrix dot
    # pads its tiny output tile ~32x on the MXU — see ops/attn_pool.py)
    from madeleine_tpu.ops.attn_pool import _tile_heads

    p_e = _tile_heads(p, e)
    alpha_e = _tile_heads(alpha, e)

    m_acc[...] = m_new
    s_acc[...] = s_acc[...] * alpha + jnp.sum(p, axis=0, keepdims=True)
    w_acc[...] = (w_acc[...] * alpha_e
                  + jnp.sum(x.astype(jnp.float32) * p_e, axis=0,
                            keepdims=True))

    @pl.when(tb == pl.num_programs(1) - 1)
    def _finalize():
        s = jnp.maximum(s_acc[...], 1e-30)
        o_ref[0] = (w_acc[...] / _tile_heads(s, e)).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("e", "nh", "f", "t_block", "interpret"))
def _gated_pool_call(y, mask_bias, wa, ba, wb, bb, wc, bc, *,
                     e: int, nh: int, f: int, t_block: int,
                     interpret: bool = False):
    b, t, E = y.shape
    nt = pl.cdiv(t, t_block)
    t_pad = nt * t_block - t
    if t_pad:
        y = jnp.pad(y, ((0, 0), (0, t_pad), (0, 0)))
        mask_bias = jnp.pad(mask_bias, ((0, 0), (0, t_pad), (0, 0)),
                            constant_values=NEG_INF)
    kernel = functools.partial(_gated_pool_kernel, e=e, nh=nh, f=f)
    const = lambda i, j: (0, 0, 0)
    const2 = lambda i, j: (0, 0)
    out = pl.pallas_call(
        kernel,
        grid=(b, nt),
        in_specs=[
            pl.BlockSpec((1, t_block, E), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_block, nh), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nh, e, f), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((nh, f), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((nh, e, f), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((nh, f), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((nh, f), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((nh, 1), const2, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, E), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 1, E), y.dtype),
        scratch_shapes=[
            pltpu.VMEM((1, nh), jnp.float32),
            pltpu.VMEM((1, nh), jnp.float32),
            pltpu.VMEM((1, E), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * (t + t_pad) * E * f * 2,
            bytes_accessed=y.size * y.dtype.itemsize + b * E * 4,
            transcendentals=3 * b * (t + t_pad) * nh * f,
        ),
        interpret=interpret,
    )(y, mask_bias, wa, ba, wb, bb, wc, bc)
    return out


def gated_attention_pool(
    attn_params,
    xh: jnp.ndarray,                      # [b, t, nh, e] head-major
    mask: Optional[jnp.ndarray] = None,   # [b, t]
    t_block: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused gates+pool. Returns pooled [b, nh, e] (softmax activation).

    attn_params: the abmil 'attn' subtree ({wa, ba, wb, bb, wc, bc}).
    """
    b, t, nh, e = xh.shape
    f = attn_params["wa"].shape[-1]
    y = xh.reshape(b, t, nh * e)
    m = _normalize_mask(mask, b, t)
    if m is None:
        mask_bias = jnp.zeros((b, t, nh), jnp.float32)
    else:
        mask_bias = jnp.broadcast_to(
            jnp.where(m[..., None], 0.0, NEG_INF), (b, t, nh)
        ).astype(jnp.float32)
    wc = attn_params["wc"].reshape(nh, f)
    bc = attn_params["bc"].reshape(nh, 1)
    pooled = _gated_pool_call(
        y, mask_bias,
        attn_params["wa"].astype(xh.dtype), attn_params["ba"].astype(jnp.float32),
        attn_params["wb"].astype(xh.dtype), attn_params["bb"].astype(jnp.float32),
        wc.astype(jnp.float32), bc.astype(jnp.float32),
        e=e, nh=nh, f=f, t_block=t_block, interpret=interpret)
    return pooled.reshape(b, nh, e)
