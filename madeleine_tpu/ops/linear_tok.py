"""Token-projector Linear with a layout-pinned custom-VJP (TPU training).

Semantics: y @ W + b over [b, t, E] token features (ref: Model.py:80-83 /
138-140 token_projector). XLA handles the forward fine, but its BACKWARD
layout assignment prefers a t-minor ({1,2,0}) layout for dW = y^T·dtok, and
that preference propagates into the add-fusion that merges the three dxh
cotangents (pool + gates + tokens): both Pallas kernel outputs get copied
{2,1,0}->{1,2,0}, summed there, and copied back for the pre-attn backward —
~38 ms/step of pure layout churn at canonical scale (measured; see NOTES.md).

These kernels pin every operand/result to the natural {2,1,0} layout:
  forward : per (b, t-block): tok = y_blk @ W + b
  backward: per (b, t-block): dy_blk = dtok_blk @ W^T  (written in place)
            dW += y_blk^T @ dtok_blk, db += sum(dtok_blk)   (VMEM f32
            accumulators across the sequential grid, like ops/preattn.py)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fwd_kernel(y_ref, w_ref, b_ref, o_ref):
    y = y_ref[0]
    o_ref[0] = (jax.lax.dot_general(
        y, w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b_ref[...]).astype(o_ref.dtype)


def _bwd_kernel(y_ref, g_ref, w_ref, dy_ref, dw_ref, db_ref):
    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _init():
        dw_ref[...] = jnp.zeros_like(dw_ref)
        db_ref[...] = jnp.zeros_like(db_ref)

    g = g_ref[0]                                          # [T, d_out]
    dy_ref[0] = jax.lax.dot_general(
        g, w_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dy_ref.dtype)
    dw_ref[...] += jax.lax.dot_general(
        y_ref[0], g, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)               # [E, d_out]
    db_ref[...] += jnp.sum(g.astype(jnp.float32), axis=0)


def _pad_t(x, t_block):
    b, t, d = x.shape
    nt = pl.cdiv(t, t_block)
    t_pad = nt * t_block - t
    if t_pad:
        x = jnp.pad(x, ((0, 0), (0, t_pad), (0, 0)))
    return x, nt, t_pad


@functools.partial(jax.jit, static_argnames=("t_block", "interpret"))
def _fwd_call(y, w, b, *, t_block, interpret=False):
    bb, t, E = y.shape
    d_out = w.shape[1]
    y_p, nt, t_pad = _pad_t(y, t_block)
    out = pl.pallas_call(
        _fwd_kernel,
        grid=(bb, nt),
        in_specs=[
            pl.BlockSpec((1, t_block, E), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w.shape, lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(b.shape, lambda i, j: (0,),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t_block, d_out), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bb, t + t_pad, d_out), y.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * bb * (t + t_pad) * E * d_out,
            bytes_accessed=y.size * y.dtype.itemsize
            + bb * (t + t_pad) * d_out * y.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(y_p, w, b.astype(jnp.float32))
    return out[:, :t]


@functools.partial(jax.jit, static_argnames=("t_block", "interpret"))
def _bwd_call(y, g, w, *, t_block, interpret=False):
    bb, t, E = y.shape
    d_out = w.shape[1]
    y_p, nt, t_pad = _pad_t(y, t_block)
    g_p, _, _ = _pad_t(g, t_block)
    dy, dw, db = pl.pallas_call(
        _bwd_kernel,
        grid=(bb, nt),
        in_specs=[
            pl.BlockSpec((1, t_block, E), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_block, d_out), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w.shape, lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, t_block, E), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w.shape, lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d_out,), lambda i, j: (0,),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bb, t + t_pad, E), y.dtype),
            jax.ShapeDtypeStruct(w.shape, jnp.float32),
            jax.ShapeDtypeStruct((d_out,), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * bb * (t + t_pad) * E * d_out,
            bytes_accessed=2 * y.size * y.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(y_p, g_p, w)
    return dy[:, :t], dw, db


@jax.custom_vjp
def linear_tok_train(y: jnp.ndarray, w: jnp.ndarray,
                     b: jnp.ndarray) -> jnp.ndarray:
    """y [bb, t, E] @ w [E, d_out] + b, layout-pinned fwd+bwd (TPU train path).
    Numerics: f32 MXU accumulation cast to y.dtype — identical contraction to
    the XLA `_linear` at bf16."""
    return _fwd_call(y, w, b, t_block=512)


def _lt_fwd(y, w, b):
    return _fwd_call(y, w, b, t_block=512), (y, w)


def _lt_bwd(res, g):
    y, w = res
    dy, dw, db = _bwd_call(y, g.astype(y.dtype), w, t_block=512)
    return dy, dw.astype(w.dtype), db.astype(w.dtype)


linear_tok_train.defvjp(_lt_fwd, _lt_bwd)
