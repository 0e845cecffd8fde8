"""Fused gated-attention logits for TRAINING — Pallas forward AND backward.

Semantics (ref: abmil.py:41-52, with the train-mode Dropout(0.25) on each gate
branch, abmil.py:34-39):

    per head h:  a = drop(tanh(y_h Wa_h + ba_h))
                 b = drop(sigmoid(y_h Wb_h + bb_h))
                 logits[:, h] = (a * b) wc_h + bc_h

The unfused training path materializes both [bs, t, nh, f] gate branches in
HBM (forward residuals) plus two dropout masks — per canonical batch that is
~2.7e9 of the step's ~4.8e9 dropout sites and the single largest activation
traffic. This op keeps the gates entirely in VMEM:

  forward:  per (case, token-block): gate matmuls -> tanh/sigmoid -> in-kernel
            hardware-RNG dropout (16-bit thresholds, ops/dropout.py rationale)
            -> logits [T, nh]. Only the tiny logits leave the chip.
  backward: custom VJP re-seeds the same per-(block, head, branch) streams,
            recomputes the gates, and emits dy plus ALL weight grads in one
            pass; weight-grad accumulators live in VMEM across the
            (sequential) grid via constant-index output blocks.

Residuals are just (y, seed): y is already live for the pooling/token paths,
so the op adds ZERO bytes of autodiff state.

Mask regeneration is made order-independent by re-seeding per (block, head,
branch) — forward and backward draw identical bits regardless of code motion.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from madeleine_tpu.ops.encode_fused import _sigmoid_tanh

DEFAULT_RATE = 0.25  # ref: abmil.py:34-35
# token-block size (env-tunable for sweeps; measured best at canonical scale)
DEFAULT_T_BLOCK = int(os.environ.get("MADELEINE_GATED_TBLOCK", "128"))


def _branch_mask(base_seed, h: int, branch: int, shape, rate: float):
    """Inverted-dropout keep-scale matrix in f32, from the hardware PRNG.
    Seeded per (block, head, branch) so fwd/bwd regenerate identical masks.

    rate is static: at rate<=0 the PRNG is never touched, so the gate math
    lowers in interpret mode on CPU (hardware PRNG has no interpret
    lowering) — this puts the kernel's matmul/VJP path in the CPU suite.
    Threshold bits: ops/prng_mask.py (8-bit when the block shape allows)."""
    if rate <= 0.0:
        return jnp.float32(1.0)
    from madeleine_tpu.ops.prng_mask import keep_mask

    pltpu.prng_seed(base_seed + 2 * h + branch)
    return keep_mask(shape, rate)


def _block_seed(seed_ref, nh: int):
    blk = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)
    return seed_ref[0] + blk * (2 * nh)


def _gates(yh, wa_h, ba_h, wb_h, bb_h, prec):
    a_pre = jnp.tanh(jnp.dot(yh, wa_h, preferred_element_type=jnp.float32,
                             precision=prec) + ba_h[None, :])
    b_pre = _sigmoid_tanh(jnp.dot(yh, wb_h,
                                  preferred_element_type=jnp.float32,
                                  precision=prec) + bb_h[None, :])
    return a_pre, b_pre


def _fwd_kernel(seed_ref, y_ref, wa_ref, ba_ref, wb_ref, bb_ref, wc_ref,
                bc_ref, o_ref, *, e: int, nh: int, rate: float):
    y = y_ref[0]                                          # [T, E]
    prec = (jax.lax.Precision.HIGHEST if y.dtype == jnp.float32 else None)
    base = _block_seed(seed_ref, nh)
    cols = []
    for h in range(nh):
        yh = y[:, h * e:(h + 1) * e]
        a_pre, b_pre = _gates(yh, wa_ref[h], ba_ref[h], wb_ref[h], bb_ref[h],
                              prec)
        a = a_pre * _branch_mask(base, h, 0, a_pre.shape, rate)
        b = b_pre * _branch_mask(base, h, 1, b_pre.shape, rate)
        g = a * b
        cols.append(jnp.sum(g * wc_ref[h][None, :], axis=1,
                            keepdims=True) + bc_ref[h][0])
    o_ref[0] = jnp.concatenate(cols, axis=1).astype(o_ref.dtype)


def _bwd_kernel(seed_ref, y_ref, dl_ref, wa_ref, ba_ref, wb_ref, bb_ref,
                wc_ref, bc_ref,
                dy_ref, dwa_ref, dba_ref, dwb_ref, dbb_ref, dwc_ref,
                dy_scratch, *, e: int, nh: int, rate: float):
    is_first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)

    @pl.when(is_first)
    def _init():
        dwa_ref[...] = jnp.zeros_like(dwa_ref)
        dba_ref[...] = jnp.zeros_like(dba_ref)
        dwb_ref[...] = jnp.zeros_like(dwb_ref)
        dbb_ref[...] = jnp.zeros_like(dbb_ref)
        dwc_ref[...] = jnp.zeros_like(dwc_ref)

    y = y_ref[0]                                          # [T, E]
    dl = dl_ref[0].astype(jnp.float32)                    # [T, nh]
    prec = (jax.lax.Precision.HIGHEST if y.dtype == jnp.float32 else None)
    base = _block_seed(seed_ref, nh)

    for h in range(nh):
        yh = y[:, h * e:(h + 1) * e]
        a_pre, b_pre = _gates(yh, wa_ref[h], ba_ref[h], wb_ref[h], bb_ref[h],
                              prec)
        ma = _branch_mask(base, h, 0, a_pre.shape, rate)
        mb = _branch_mask(base, h, 1, b_pre.shape, rate)
        a = a_pre * ma
        b = b_pre * mb
        g = a * b
        dl_h = dl[:, h:h + 1]                             # [T, 1]

        # logits layer (dbc = sum(dl) is computed outside — scalar
        # stores to VMEM are unsupported and XLA gets it for free)
        dwc_ref[h] += jnp.sum(g * dl_h, axis=0)
        dg = dl_h * wc_ref[h][None, :]                    # [T, f]

        # gate branches (through dropout masks)
        dza = dg * b * ma * (1.0 - a_pre * a_pre)         # [T, f]
        dzb = dg * a * mb * b_pre * (1.0 - b_pre)

        # matmul operands in the COMPUTE dtype (f32 accumulate): at bf16 this
        # matches the unfused XLA backward exactly (default matmul precision
        # truncates f32 operands to bf16); f32 operands ran the MXU in its
        # 4-6x slower f32 mode for most of the kernel's FLOPs.
        cd = y.dtype
        dza_c = dza.astype(cd)
        dzb_c = dzb.astype(cd)

        # input grad: contract over f (no explicit transposes — Mosaic)
        dyh = jax.lax.dot_general(
            dza_c, wa_ref[h], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)
        dyh += jax.lax.dot_general(
            dzb_c, wb_ref[h], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)
        dy_scratch[:, h * e:(h + 1) * e] = dyh

        # weight grads: contract over T
        dwa_ref[h] += jax.lax.dot_general(
            yh, dza_c, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)
        dba_ref[h] += jnp.sum(dza, axis=0)
        dwb_ref[h] += jax.lax.dot_general(
            yh, dzb_c, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)
        dbb_ref[h] += jnp.sum(dzb, axis=0)

    dy_ref[0] = dy_scratch[...].astype(dy_ref.dtype)


def _pad_t(y, t_block):
    b, t, E = y.shape
    nt = pl.cdiv(t, t_block)
    t_pad = nt * t_block - t
    if t_pad:
        y = jnp.pad(y, ((0, 0), (0, t_pad), (0, 0)))
    return y, nt, t_pad


@functools.partial(jax.jit,
                   static_argnames=("e", "nh", "f", "rate", "t_block",
                                    "interpret"))
def _fwd_call(y, seed, wa, ba, wb, bb, wc, bc, *, e, nh, f, rate, t_block,
              interpret=False):
    b, t, E = y.shape
    y_p, nt, t_pad = _pad_t(y, t_block)
    const3 = lambda i, j: (0, 0, 0)
    const2 = lambda i, j: (0, 0)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, e=e, nh=nh, rate=rate),
        grid=(b, nt),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, t_block, E), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nh, e, f), const3, memory_space=pltpu.VMEM),
            pl.BlockSpec((nh, f), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((nh, e, f), const3, memory_space=pltpu.VMEM),
            pl.BlockSpec((nh, f), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((nh, f), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((nh, 1), const2, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t_block, nh), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t + t_pad, nh), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * (t + t_pad) * E * f * 2,
            bytes_accessed=y.size * y.dtype.itemsize + b * t * nh * 4,
            transcendentals=2 * b * (t + t_pad) * nh * f,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024),
        interpret=interpret,
    )(seed.reshape(1), y_p, wa, ba, wb, bb, wc, bc)
    return out[:, :t]


@functools.partial(jax.jit,
                   static_argnames=("e", "nh", "f", "rate", "t_block",
                                    "interpret"))
def _bwd_call(y, dl, seed, wa, ba, wb, bb, wc, bc, *, e, nh, f, rate, t_block,
              interpret=False):
    b, t, E = y.shape
    y_p, nt, t_pad = _pad_t(y, t_block)
    dl_p = jnp.pad(dl, ((0, 0), (0, t_pad), (0, 0))) if t_pad else dl
    const3 = lambda i, j: (0, 0, 0)
    const2 = lambda i, j: (0, 0)
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, e=e, nh=nh, rate=rate),
        grid=(b, nt),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, t_block, E), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_block, nh), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nh, e, f), const3, memory_space=pltpu.VMEM),
            pl.BlockSpec((nh, f), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((nh, e, f), const3, memory_space=pltpu.VMEM),
            pl.BlockSpec((nh, f), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((nh, f), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((nh, 1), const2, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, t_block, E), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nh, e, f), const3, memory_space=pltpu.VMEM),
            pl.BlockSpec((nh, f), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((nh, e, f), const3, memory_space=pltpu.VMEM),
            pl.BlockSpec((nh, f), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((nh, f), const2, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, t + t_pad, E), y.dtype),
            jax.ShapeDtypeStruct((nh, e, f), jnp.float32),
            jax.ShapeDtypeStruct((nh, f), jnp.float32),
            jax.ShapeDtypeStruct((nh, e, f), jnp.float32),
            jax.ShapeDtypeStruct((nh, f), jnp.float32),
            jax.ShapeDtypeStruct((nh, f), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((t_block, E), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * (t + t_pad) * E * f * 6,
            bytes_accessed=2 * y.size * y.dtype.itemsize,
            transcendentals=2 * b * (t + t_pad) * nh * f,
        ),
        # weight-grad accumulators (f32) + both gate weight sets exceed the
        # 16 MB default scoped limit; the v5e has ~128 MB physical VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024),
        interpret=interpret,
    )(seed.reshape(1), y_p, dl_p, wa, ba, wb, bb, wc, bc)
    dy = outs[0][:, :t]
    return (dy,) + outs[1:]


# ---------------------------------------------------------------------------
# Public custom-VJP op
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def gated_logits_train(y: jnp.ndarray, attn, seed: jnp.ndarray,
                       rate: float = DEFAULT_RATE,
                       t_block: int = DEFAULT_T_BLOCK) -> jnp.ndarray:
    """Training-mode gated attention logits with fused in-kernel dropout.

    y: [b, t, E] head-major pre-attention features (E = nh * e)
    attn: the abmil 'attn' subtree {wa, ba, wb, bb, wc, bc}
    seed: int32 scalar (derived from the step rng)
    Returns raw logits [b, t, nh] (f32).
    """
    return _gl_fwd(y, attn, seed, rate, t_block)[0]


def _interp() -> bool:
    # off-TPU the kernel runs in interpret mode (only reachable at rate<=0,
    # where the hardware PRNG is never touched) — CPU-suite coverage
    return jax.default_backend() != "tpu"


def _gl_fwd(y, attn, seed, rate, t_block):
    nh, e, f = attn["wa"].shape
    out = _fwd_call(
        y, seed,
        attn["wa"].astype(y.dtype), attn["ba"].astype(jnp.float32),
        attn["wb"].astype(y.dtype), attn["bb"].astype(jnp.float32),
        attn["wc"].reshape(nh, f).astype(jnp.float32),
        attn["bc"].reshape(nh, 1).astype(jnp.float32),
        e=e, nh=nh, f=f, rate=rate, t_block=t_block, interpret=_interp())
    return out, (y, attn, seed)


def _gl_bwd(rate, t_block, res, g):
    y, attn, seed = res
    nh, e, f = attn["wa"].shape
    dy, dwa, dba, dwb, dbb, dwc = _bwd_call(
        y, g.astype(jnp.float32), seed,
        attn["wa"].astype(y.dtype), attn["ba"].astype(jnp.float32),
        attn["wb"].astype(y.dtype), attn["bb"].astype(jnp.float32),
        attn["wc"].reshape(nh, f).astype(jnp.float32),
        attn["bc"].reshape(nh, 1).astype(jnp.float32),
        e=e, nh=nh, f=f, rate=rate, t_block=t_block, interpret=_interp())
    dbc = jnp.sum(g, axis=(0, 1), dtype=jnp.float32)          # [nh]
    d_attn = {
        "wa": dwa.astype(attn["wa"].dtype),
        "ba": dba.astype(attn["ba"].dtype),
        "wb": dwb.astype(attn["wb"].dtype),
        "bb": dbb.astype(attn["bb"].dtype),
        "wc": dwc.reshape(attn["wc"].shape).astype(attn["wc"].dtype),
        "bc": dbc.reshape(attn["bc"].shape).astype(attn["bc"].dtype),
    }
    return dy, d_attn, None


gated_logits_train.defvjp(_gl_fwd, _gl_bwd)
