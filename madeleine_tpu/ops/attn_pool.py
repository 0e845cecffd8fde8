"""Masked attention pooling — the hot op of the slide encoder.

Semantics (ref: madeleine/models/Model.py:406-417 + abmil.py:54-63): per-head
softmax of raw attention logits over the token dim, then attention-weighted sum
of the per-head token features:

    pooled[b, e, h] = sum_t softmax_t(logits[b, :, h])[t] * x[b, t, e, h]

This is a 1-query attention reduction, so it admits the flash-attention
online-softmax recurrence: the Pallas kernel streams token blocks HBM->VMEM with
running (max, scaled-sum, weighted-acc) state, giving O(block) on-chip memory for
arbitrary bag length — the TPU-native replacement for the reference's
subsample-to-2048 workaround (ref: wsi_dataset.py:42-50).

Two paths:
  - `_pool_reference`: pure JAX/XLA, differentiable, any activation. Used for
    training and as the CPU/test fallback.
  - `_pool_pallas`: fused streaming kernel (softmax activation), used on the
    inference path where bags can be 10^3..10^5 tokens.

Layout note: token features arrive HEAD-MAJOR as [b, t, nh, e] (see
models/abmil.py — the reference's head-minor '(e c)' order is permuted once in
the checkpoint bridge). The kernel consumes the flat [b, t, E=nh*e] view so the
lane dimension stays wide and contiguous; per-head softmax weights tile
lane-wise in e-sized runs ([p0]*e ++ [p1]*e ++ ...).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30  # finite mask fill: keeps the online-softmax recurrence NaN-free


def _normalize_mask(mask: Optional[jnp.ndarray], b: int, t: int) -> Optional[jnp.ndarray]:
    """Broadcast any of [t], [1,t], [b,t] to [b, t] bool."""
    if mask is None:
        return None
    mask = jnp.asarray(mask, bool)
    if mask.ndim == 1:
        mask = mask[None, :]
    return jnp.broadcast_to(mask, (b, t))


# ---------------------------------------------------------------------------
# Pure-JAX reference path (differentiable, any activation)
# ---------------------------------------------------------------------------

def _pool_reference(
    xh: jnp.ndarray,          # [b, t, nh, e]
    logits: jnp.ndarray,      # [b, t, nh]
    mask: Optional[jnp.ndarray],   # [b, t] or None
    activation: str,
) -> jnp.ndarray:
    from madeleine_tpu.models.abmil import activate_attention

    m = None if mask is None else mask[..., None]  # [b, t, 1] over heads
    attn = activate_attention(logits, activation, m, axis=-2)  # token axis
    # HIGHEST: XLA lowers this to an MXU batched matmul whose default precision
    # truncates f32 operands to bf16 (~1e-2 relative error on the pooled sums)
    pooled = jnp.einsum(
        "bthe,bth->bhe", xh.astype(jnp.float32), attn.astype(jnp.float32),
        precision=jax.lax.Precision.HIGHEST,
    )
    return pooled.astype(xh.dtype)


# ---------------------------------------------------------------------------
# Pallas streaming kernel (softmax)
# ---------------------------------------------------------------------------

def _head_expand_matrix(e: int, nh: int) -> jnp.ndarray:
    """M [nh, E] with M[h, i] = (i // e == h): `v @ M` tiles a per-head vector
    [*, nh] to the head-major feature layout [*, E] as one small matmul —
    Mosaic-friendly (lane-splitting reshapes are not supported)."""
    E = e * nh
    col = jax.lax.broadcasted_iota(jnp.int32, (nh, E), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (nh, E), 0)
    return (col // e == row).astype(jnp.float32)


def _tile_heads(v: jnp.ndarray, e: int) -> jnp.ndarray:
    """[*, nh] -> [*, nh*e]: each head value repeated over its e-run.
    Broadcast+concat on lanes (e is a 128-multiple) — exact, and much faster
    in-kernel than the selection-matrix matmul it replaces: a [T, nh] x
    [nh, E] dot pads its tiny output tile ~32x on the MXU."""
    nh = v.shape[-1]
    return jnp.concatenate(
        [jnp.broadcast_to(v[..., h:h + 1], (*v.shape[:-1], e))
         for h in range(nh)], axis=-1)


def _head_sums(x: jnp.ndarray, e: int, nh: int) -> jnp.ndarray:
    """[T, nh*e] -> [T, nh]: per-head segment rowsums (VPU reductions instead
    of a tiny-output MXU contraction)."""
    return jnp.concatenate(
        [jnp.sum(x[:, h * e:(h + 1) * e], axis=1, keepdims=True)
         for h in range(nh)], axis=1)


def _pool_kernel(x_ref, l_ref, o_ref, m_acc, s_acc, w_acc, *, e: int, nh: int):
    """Grid = (b, num_t_blocks); t innermost so VMEM accumulators carry.

    x_ref: [1, T_BLK, E] token features (E = nh*e, head-major)
    l_ref: [1, T_BLK, nh] pre-masked logits (padding already filled w/ NEG_INF)
    o_ref: [1, 1, E] pooled output (written on the last t block)
    scratch: m_acc [1, nh] running max, s_acc [1, nh] running denom,
             w_acc [1, E] running weighted sum (all fp32)
    """
    tb = pl.program_id(1)

    @pl.when(tb == 0)
    def _init():
        m_acc[...] = jnp.full_like(m_acc, NEG_INF)
        s_acc[...] = jnp.zeros_like(s_acc)
        w_acc[...] = jnp.zeros_like(w_acc)

    l = l_ref[0].astype(jnp.float32)                     # [T, nh]
    m_old = m_acc[...]                                   # [1, nh]
    m_new = jnp.maximum(m_old, jnp.max(l, axis=0, keepdims=True))
    alpha = jnp.exp(m_old - m_new)                       # [1, nh]
    p = jnp.exp(l - m_new)                               # [T, nh]

    x = x_ref[0].astype(jnp.float32)                     # [T, E]
    p_e = _tile_heads(p, e)                              # [T, E] (exact)
    alpha_e = _tile_heads(alpha, e)                      # [1, E]

    m_acc[...] = m_new
    s_acc[...] = s_acc[...] * alpha + jnp.sum(p, axis=0, keepdims=True)
    w_acc[...] = w_acc[...] * alpha_e + jnp.sum(x * p_e, axis=0, keepdims=True)

    @pl.when(tb == pl.num_programs(1) - 1)
    def _finalize():
        s = jnp.maximum(s_acc[...], 1e-30)               # [1, nh]
        o_ref[0] = (w_acc[...] / _tile_heads(s, e)).astype(o_ref.dtype)


def _pool_ms_kernel(x_ref, l_ref, o_ref, m_ref, s_ref, m_acc, s_acc, w_acc,
                    *, e: int, nh: int):
    """_pool_kernel + emits the per-(b, head) softmax stats (running max m and
    clamped denom s) so a custom-VJP backward can recompute the attention
    weights in one streaming pass without re-reducing over t."""
    _pool_kernel(x_ref, l_ref, o_ref, m_acc, s_acc, w_acc, e=e, nh=nh)

    @pl.when(pl.program_id(1) == pl.num_programs(1) - 1)
    def _emit_stats():
        m_ref[0] = m_acc[...]
        s_ref[0] = jnp.maximum(s_acc[...], 1e-30)


def _pool_bwd_kernel(y_ref, l_ref, m_ref, s_ref, g_ref, inner_ref,
                     dx_ref, dl_ref, *, e: int, nh: int):
    """VJP of pooled[h,e] = sum_t a[t,h] y[t,he] with a = softmax_t(l):
        dx[t,he] = a[t,h] g[he]
        dl[t,h]  = a[t,h] (da[t,h] - inner[h]),  da[t,h] = sum_e g[he] y[t,he]
    inner[h] = sum_t a da = sum_e g[he] pooled[he] is computed OUTSIDE from
    the saved forward output, so each t-block is independent: grid (b, nt)
    with no carried state, natural [b, t, E] layout throughout (the XLA
    backward materialized [b,t,nh,e] in a transposed layout — ~50 ms/step of
    pure copies at canonical scale)."""
    y = y_ref[0].astype(jnp.float32)                     # [T, E]
    l = l_ref[0].astype(jnp.float32)                     # [T, nh]
    a = jnp.exp(l - m_ref[0]) / s_ref[0]                 # [T, nh]
    g = g_ref[0]                                         # [1, E] f32
    dx_ref[0] = (_tile_heads(a, e) * g).astype(dx_ref.dtype)
    da = _head_sums(y * g, e, nh)                        # [T, nh]
    dl_ref[0] = (a * (da - inner_ref[0])).astype(dl_ref.dtype)


def _pad_inputs(y, logits_masked, t_block):
    b, t, E = y.shape
    nt = pl.cdiv(t, t_block)
    t_pad = nt * t_block - t
    if t_pad:
        y = jnp.pad(y, ((0, 0), (0, t_pad), (0, 0)))
        logits_masked = jnp.pad(logits_masked, ((0, 0), (0, t_pad), (0, 0)),
                                constant_values=NEG_INF)
    return y, logits_masked, nt, t_pad


@functools.partial(jax.jit, static_argnames=("e", "nh", "t_block", "interpret"))
def _pool_pallas_ms(y, logits_masked, *, e, nh, t_block, interpret=False):
    """Like _pool_pallas but also returns the softmax stats (m, s) [b,1,nh]."""
    b, t, E = y.shape
    y, logits_masked, nt, t_pad = _pad_inputs(y, logits_masked, t_block)
    kernel = functools.partial(_pool_ms_kernel, e=e, nh=nh)
    return pl.pallas_call(
        kernel,
        grid=(b, nt),
        in_specs=[
            pl.BlockSpec((1, t_block, E), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_block, nh), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, E), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nh), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nh), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, 1, E), y.dtype),
            jax.ShapeDtypeStruct((b, 1, nh), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, nh), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((1, nh), jnp.float32),
            pltpu.VMEM((1, nh), jnp.float32),
            pltpu.VMEM((1, E), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * (t + t_pad) * E,
            bytes_accessed=y.size * y.dtype.itemsize + b * E * 4,
            transcendentals=b * (t + t_pad) * nh,
        ),
        interpret=interpret,
    )(y, logits_masked)


@functools.partial(jax.jit, static_argnames=("e", "nh", "t_block", "interpret"))
def _pool_bwd_call(y, logits_masked, m, s, g_flat, inner, *, e, nh, t_block,
                   interpret=False):
    """-> (dx [b,t,E] y.dtype, dl [b,t,nh] f32)."""
    b, t, E = y.shape
    y_p, l_p, nt, t_pad = _pad_inputs(y, logits_masked, t_block)
    dx, dl = pl.pallas_call(
        functools.partial(_pool_bwd_kernel, e=e, nh=nh),
        grid=(b, nt),
        in_specs=[
            pl.BlockSpec((1, t_block, E), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_block, nh), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nh), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nh), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, E), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nh), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, t_block, E), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_block, nh), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, t + t_pad, E), y.dtype),
            jax.ShapeDtypeStruct((b, t + t_pad, nh), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * (t + t_pad) * E,
            bytes_accessed=2 * y.size * y.dtype.itemsize
            + b * (t + t_pad) * nh * 4,
            transcendentals=b * (t + t_pad) * nh,
        ),
        interpret=interpret,
    )(y_p, l_p, m, s, g_flat, inner)
    return dx[:, :t], dl[:, :t]


@functools.partial(jax.jit, static_argnames=("e", "nh", "t_block"))
def _pool_pallas(y: jnp.ndarray, logits_masked: jnp.ndarray, *, e: int, nh: int,
                 t_block: int) -> jnp.ndarray:
    """y: [b, t, E], logits_masked: [b, t, nh] -> pooled [b, 1, E]."""
    b, t, E = y.shape
    nt = pl.cdiv(t, t_block)
    # Pad t so every block is full; padded logits get NEG_INF -> zero weight.
    t_pad = nt * t_block - t
    if t_pad:
        y = jnp.pad(y, ((0, 0), (0, t_pad), (0, 0)))
        logits_masked = jnp.pad(logits_masked, ((0, 0), (0, t_pad), (0, 0)),
                                constant_values=NEG_INF)

    grid = (b, nt)
    kernel = functools.partial(_pool_kernel, e=e, nh=nh)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, t_block, E), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_block, nh), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
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
            flops=2 * b * (t + t_pad) * E,
            bytes_accessed=y.size * y.dtype.itemsize + b * E * 4,
            transcendentals=b * (t + t_pad) * nh,
        ),
    )(y, logits_masked)
    return out


# ---------------------------------------------------------------------------
# Public entry
# ---------------------------------------------------------------------------

def masked_attention_pool(
    xh: jnp.ndarray,               # [b, t, nh, e] (head-major)
    logits: jnp.ndarray,           # [b, t, nh]
    mask: Optional[jnp.ndarray] = None,   # [b, t] / [1, t] / [t]
    activation: str = "softmax",
    use_pallas: Optional[bool] = None,
    t_block: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Attention-pool token features per head. Returns [b, nh, e].

    `use_pallas=None` auto-selects: fused kernel on TPU for softmax activation,
    pure-XLA fallback elsewhere (CPU tests, non-softmax activations, AD).
    """
    b, t, nh, e = xh.shape
    mask = _normalize_mask(mask, b, t)

    if use_pallas is None:
        use_pallas = (activation == "softmax" and jax.default_backend() == "tpu")
    if activation != "softmax":
        use_pallas = False

    if not use_pallas and not interpret:
        return _pool_reference(xh, logits, mask, activation)

    l32 = logits.astype(jnp.float32)
    if mask is not None:
        l32 = jnp.where(mask[..., None], l32, NEG_INF)
    y = xh.reshape(b, t, nh * e)
    tb = min(t_block, max(8, t))
    if interpret:
        pooled = _pool_pallas_interpret(y, l32, e=e, nh=nh, t_block=tb)
    else:
        pooled = _pool_pallas(y, l32, e=e, nh=nh, t_block=tb)
    return pooled.reshape(b, nh, e)


FusedPoolResidual = None  # (doc anchor) residuals = (xh, logits, mask)


def _want_pallas(activation, use_pallas):
    if use_pallas is None:
        return activation == "softmax" and jax.default_backend() == "tpu"
    return bool(use_pallas) and activation == "softmax"


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_attention_pool(xh, logits, mask, activation="softmax",
                         use_pallas=None, t_block=512):
    """Differentiable fused pooling: Pallas streaming forward AND backward on
    TPU (XLA fallback elsewhere). Same signature/semantics as
    masked_attention_pool, but safe inside gradient-taking training code —
    full-bag training without materializing the per-token softmax in HBM.

    The forward saves the per-head softmax stats (running max m, denom s);
    the backward recomputes the weights in one independent streaming pass per
    t-block (inner[h] = <g, pooled>_e needs no re-reduction over t)."""
    return masked_attention_pool(xh, logits, mask, activation=activation,
                                 use_pallas=use_pallas, t_block=t_block)


def _masked_l32(logits, mask, b, t):
    l32 = logits.astype(jnp.float32)
    m = _normalize_mask(mask, b, t)
    if m is not None:
        l32 = jnp.where(m[..., None], l32, NEG_INF)
    return l32


def _fused_pool_fwd(xh, logits, mask, activation, use_pallas, t_block):
    b, t, nh, e = xh.shape
    if _want_pallas(activation, use_pallas):
        l32 = _masked_l32(logits, mask, b, t)
        y = xh.reshape(b, t, nh * e)
        tb = min(t_block, max(8, t))
        out, ms, ss = _pool_pallas_ms(y, l32, e=e, nh=nh, t_block=tb)
        return out.reshape(b, nh, e), (xh, logits, mask, ms, ss, out)
    out = masked_attention_pool(xh, logits, mask, activation=activation,
                                use_pallas=use_pallas, t_block=t_block)
    return out, (xh, logits, mask, None, None, None)


def _fused_pool_bwd(activation, use_pallas, t_block, res, g):
    """Backward of pooled[b,h,e] = sum_t a[b,t,h] x[b,t,h,e], a = softmax(l):
      dx[t,h,e] = a[t,h] g[h,e]
      dl[t,h]   = a[t,h] (da[t,h] - inner[h]),  da[t,h] = sum_e g[h,e] x[t,h,e]
      inner[h]  = sum_t a da = sum_e g[h,e] pooled[h,e]
    (softmax activation only — the training path always uses softmax)."""
    xh, logits, mask, ms, ss, out = res
    b, t, nh, e = xh.shape
    g32 = g.astype(jnp.float32)                                 # [b, nh, e]

    if ms is not None:
        l32 = _masked_l32(logits, mask, b, t)
        y = xh.reshape(b, t, nh * e)
        tb = min(t_block, max(8, t))
        g_flat = g32.reshape(b, 1, nh * e)
        inner = jnp.sum(
            g32 * out.reshape(b, nh, e).astype(jnp.float32), axis=-1
        ).reshape(b, 1, nh)                                     # [b, 1, nh]
        dx_flat, dl = _pool_bwd_call(y, l32, ms, ss, g_flat, inner,
                                     e=e, nh=nh, t_block=tb)
        return (dx_flat.reshape(b, t, nh, e),
                dl.astype(logits.dtype), None)

    from madeleine_tpu.models.abmil import activate_attention

    m = _normalize_mask(mask, b, t)
    mm = None if m is None else m[..., None]
    a = activate_attention(logits.astype(jnp.float32), activation, mm,
                           axis=-2)                             # [b, t, nh]
    dx = (a[..., None] * g32[:, None]).astype(xh.dtype)         # [b, t, nh, e]
    if activation == "softmax":
        da = jnp.einsum("bhe,bthe->bth", g32, xh.astype(jnp.float32),
                        precision=jax.lax.Precision.HIGHEST)
        inner = jnp.sum(a * da, axis=1, keepdims=True)
        dl = (a * (da - inner)).astype(logits.dtype)
    else:
        raise NotImplementedError(
            "fused_attention_pool backward supports softmax only; use the "
            "non-fused path for other activations")
    return dx, dl, None


fused_attention_pool.defvjp(_fused_pool_fwd, _fused_pool_bwd)


def _pool_pallas_interpret(y, logits_masked, *, e, nh, t_block):
    """Interpreter-mode twin of _pool_pallas for CPU tests."""
    b, t, E = y.shape
    nt = pl.cdiv(t, t_block)
    t_pad = nt * t_block - t
    if t_pad:
        y = jnp.pad(y, ((0, 0), (0, t_pad), (0, 0)))
        logits_masked = jnp.pad(logits_masked, ((0, 0), (0, t_pad), (0, 0)),
                                constant_values=NEG_INF)
    kernel = functools.partial(_pool_kernel, e=e, nh=nh)
    return pl.pallas_call(
        kernel,
        grid=(b, nt),
        in_specs=[
            pl.BlockSpec((1, t_block, E), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, t_block, nh), lambda i, j: (i, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, E), lambda i, j: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, 1, E), y.dtype),
        scratch_shapes=[
            pltpu.VMEM((1, nh), jnp.float32),
            pltpu.VMEM((1, nh), jnp.float32),
            pltpu.VMEM((1, E), jnp.float32),
        ],
        interpret=True,
    )(y, logits_masked)
