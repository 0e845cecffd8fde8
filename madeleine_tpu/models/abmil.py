"""Multi-head gated-attention MIL (ABMIL) — functional JAX core.

Re-implements the semantics of the reference's ABMILEmbedder + BatchedABMIL
(ref: madeleine/models/Model.py:314-451, madeleine/models/abmil.py:8-68) as pure
functions over an explicit parameter pytree, redesigned for TPU:

- all n_heads gated-attention nets are evaluated in one batched einsum instead of a
  Python loop over nn.ModuleList (ref: Model.py:406-411) — one MXU-shaped matmul
  per gate instead of n_heads small ones;
- softmax pooling is mask-aware, so ragged bags run as padded fixed-shape batches
  (the reference instead subsamples every bag to a fixed 2048 tokens,
  ref: wsi_dataset.py:42-50);
- the half-bag multi-view path uses masked re-softmax over a shared random
  permutation (ref: Model.py:419-440 does np.random.shuffle + fancy indexing).

Head-split layout note (checkpoint-parity critical): the reference splits the
pre-attention output of size hidden*n_heads via einops 'b t (e c) -> b t e c'
(ref: Model.py:396) — feature index = e * n_heads + c, i.e. HEAD-MINOR. That
layout strides every per-head slice, which lowers badly on TPU (lane-strided
gathers / transposes around the gate matmuls) and blocks a fused gates+pool
kernel. This build therefore uses a HEAD-MAJOR layout internally — feature
index = h * hidden + e, per-head slices contiguous — and the checkpoint bridge
(models/factory.py) permutes fc3/ln3 columns and projector/token_projector rows
once at load/export time. Semantics are bit-identical; only the memory order of
the hidden*n_heads axis differs, and every torch-interop surface converts.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Any]

LN_EPS = 1e-5  # torch nn.LayerNorm default
PRE_ATTN_DROPOUT = 0.1   # ref: Model.py:354,358,362
ATTN_DROPOUT = 0.25      # ref: abmil.py:34-35


def dot_precision(dtype):
    """HIGHEST for f32 operands: TPU's default matmul truncates f32 to bf16,
    which breaks <=1e-4 checkpoint parity. bf16 operands are MXU-native, so the
    default costs nothing there."""
    return jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None


# ---------------------------------------------------------------------------
# Initialization (torch-compatible fan-in uniform, for training from scratch;
# checkpoint loads overwrite these).
# ---------------------------------------------------------------------------

def _init_linear(rng, in_dim: int, out_dim: int, dtype=jnp.float32) -> Params:
    """Kaiming-uniform(a=sqrt(5)) + fan-in uniform bias, matching torch defaults
    so from-scratch runs start in the same regime as the reference."""
    k_w, k_b = jax.random.split(rng)
    # torch kaiming_uniform(a=sqrt(5)) bound = sqrt(6 / ((1 + a^2) * fan_in)) = sqrt(1/fan_in)
    bound_w = math.sqrt(1.0 / in_dim)
    bound_b = math.sqrt(1.0 / in_dim)
    w = jax.random.uniform(k_w, (in_dim, out_dim), dtype, -bound_w, bound_w)
    b = jax.random.uniform(k_b, (out_dim,), dtype, -bound_b, bound_b)
    return {"w": w, "b": b}


def _init_layernorm(dim: int, dtype=jnp.float32) -> Params:
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def init_abmil_params(
    rng,
    input_dim: int,
    hidden_dim: int,
    n_heads: int,
    attn_hidden_dim: int = 512,
    dtype=jnp.float32,
) -> Params:
    """Parameter pytree for the ABMIL embedder.

    Structure mirrors the reference modules one-to-one so the torch checkpoint
    bridge (models/factory.py) is a pure rename:
      pre_attn fc1/ln1/fc2/ln2/fc3/ln3   <- ref Model.py:350-363 (Sequential 0..11)
      attn.{wa,ba,wb,bb,wc,bc}, stacked over heads  <- ref abmil.py:23-39 per head
    """
    keys = jax.random.split(rng, 3 + 3 * n_heads)
    pre_attn = {
        "fc1": _init_linear(keys[0], input_dim, hidden_dim, dtype),
        "ln1": _init_layernorm(hidden_dim, dtype),
        "fc2": _init_linear(keys[1], hidden_dim, hidden_dim, dtype),
        "ln2": _init_layernorm(hidden_dim, dtype),
        "fc3": _init_linear(keys[2], hidden_dim, hidden_dim * n_heads, dtype),
        "ln3": _init_layernorm(hidden_dim * n_heads, dtype),
    }
    was, bas, wbs, bbs, wcs, bcs = [], [], [], [], [], []
    for h in range(n_heads):
        la = _init_linear(keys[3 + 3 * h], hidden_dim, attn_hidden_dim, dtype)
        lb = _init_linear(keys[4 + 3 * h], hidden_dim, attn_hidden_dim, dtype)
        lc = _init_linear(keys[5 + 3 * h], attn_hidden_dim, 1, dtype)
        was.append(la["w"]); bas.append(la["b"])
        wbs.append(lb["w"]); bbs.append(lb["b"])
        wcs.append(lc["w"]); bcs.append(lc["b"])
    attn = {
        "wa": jnp.stack(was), "ba": jnp.stack(bas),   # [nh, hidden, attn_hidden], [nh, attn_hidden]
        "wb": jnp.stack(wbs), "bb": jnp.stack(bbs),
        "wc": jnp.stack(wcs), "bc": jnp.stack(bcs),   # [nh, attn_hidden, 1], [nh, 1]
    }
    return {"pre_attn": pre_attn, "attn": attn}


# ---------------------------------------------------------------------------
# Building blocks
# ---------------------------------------------------------------------------

def layer_norm(x: jnp.ndarray, p: Params) -> jnp.ndarray:
    """LayerNorm over the last dim; statistics in fp32 (TPU numerics discipline)."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + LN_EPS)
    y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(dtype)


def _dropout(x: jnp.ndarray, rate: float, rng, row_offset=None) -> jnp.ndarray:
    """Inverted dropout; TPU hardware-RNG kernel when available (ops/dropout.py
    — threefry over the full activation set was ~60% of the train step)."""
    from madeleine_tpu.ops.dropout import dropout

    return dropout(x, rate, rng, row_offset=row_offset)


def pre_attn_mlp(
    p: Params,
    x: jnp.ndarray,
    *,
    dropout_rng=None,
    train: bool = False,
    row_offset=None,
) -> jnp.ndarray:
    """3x [Linear -> LayerNorm -> GELU(exact) -> Dropout(0.1)]; widths
    in -> hidden -> hidden -> hidden*n_heads (ref: Model.py:350-363).

    Training on TPU routes through the fused Pallas op (ops/preattn.py):
    the whole stack runs per token-block in VMEM with in-kernel hardware-RNG
    dropout and a custom-VJP backward — no intermediates or masks in HBM.

    row_offset: global index of x's first batch row (shard_map DP lane);
    see ops/dropout.py — keeps dropout draws sharding-invariant."""
    if (train and dropout_rng is not None and x.ndim == 3
            and jax.default_backend() == "tpu"):
        from madeleine_tpu.ops.preattn import preattn_train

        if row_offset is not None:
            # decorrelate shards (per-block program_id seeding is local)
            dropout_rng = jax.random.fold_in(dropout_rng, row_offset)
        seed = jax.random.randint(dropout_rng, (), 0,
                                  jnp.iinfo(jnp.int32).max, dtype=jnp.int32)
        return preattn_train(x, p, seed, PRE_ATTN_DROPOUT)

    rngs = jax.random.split(dropout_rng, 3) if (train and dropout_rng is not None) else (None,) * 3
    for i, rng in zip((1, 2, 3), rngs):
        fc, ln = p[f"fc{i}"], p[f"ln{i}"]
        x = jnp.dot(x, fc["w"], preferred_element_type=x.dtype,
                    precision=dot_precision(x.dtype)) + fc["b"]
        x = layer_norm(x, ln)
        x = jax.nn.gelu(x, approximate=False)  # torch nn.GELU default = exact erf
        if rng is not None:
            x = _dropout(x, PRE_ATTN_DROPOUT, rng, row_offset=row_offset)
    return x


def gated_attention_logits(
    attn: Params,
    xh: jnp.ndarray,
    *,
    dropout_rng=None,
    train: bool = False,
    row_offset=None,
) -> jnp.ndarray:
    """All-heads gated attention scores in one shot.

    xh: [..., t, n_heads, hidden]  (head-MAJOR pre-attention features)
    returns raw logits [..., t, n_heads]
    (ref: abmil.py:41-52 — tanh(Wa x) * sigmoid(Wb x) -> Linear -> logits,
    with Dropout(0.25) on each gate branch when training.)

    Training on TPU routes through the fused Pallas op (ops/gated_logits.py):
    gates + dropout + logits in one kernel, custom-VJP backward — the gate
    activations and their dropout masks never touch HBM.
    """
    if (train and dropout_rng is not None and xh.ndim == 4
            and jax.default_backend() == "tpu"):
        from madeleine_tpu.ops.gated_logits import gated_logits_train

        b, t, nh, e = xh.shape
        if row_offset is not None:
            # decorrelate shards (per-block program_id seeding is local)
            dropout_rng = jax.random.fold_in(dropout_rng, row_offset)
        seed = jax.random.randint(dropout_rng, (), 0,
                                  jnp.iinfo(jnp.int32).max, dtype=jnp.int32)
        return gated_logits_train(xh.reshape(b, t, nh * e), attn, seed,
                                  ATTN_DROPOUT)

    prec = dot_precision(xh.dtype)
    a = jnp.tanh(jnp.einsum("...he,hef->...hf", xh, attn["wa"],
                            precision=prec) + attn["ba"])
    b = jax.nn.sigmoid(jnp.einsum("...he,hef->...hf", xh, attn["wb"],
                                  precision=prec) + attn["bb"])
    if train and dropout_rng is not None:
        ra, rb = jax.random.split(dropout_rng)
        a = _dropout(a, ATTN_DROPOUT, ra, row_offset=row_offset)
        b = _dropout(b, ATTN_DROPOUT, rb, row_offset=row_offset)
    g = a * b
    logits = jnp.einsum("...hf,hfo->...ho", g, attn["wc"],
                        precision=prec) + attn["bc"]
    return logits.squeeze(-1)  # [..., t, n_heads]


def activate_attention(
    logits: jnp.ndarray,
    activation: str,
    mask: Optional[jnp.ndarray] = None,
    axis: int = -2,
) -> jnp.ndarray:
    """Token-dim activation of raw attention scores (ref: abmil.py:54-63),
    extended with padding-mask awareness (softmax renormalizes over valid
    tokens; elementwise activations are simply zeroed on padding)."""
    if activation == "softmax":
        l32 = logits.astype(jnp.float32)
        if mask is not None:
            l32 = jnp.where(mask, l32, -jnp.inf)
        out = jax.nn.softmax(l32, axis=axis)
        if mask is not None:
            out = jnp.where(mask, out, 0.0)  # guard all-masked rows (softmax -> nan)
        return out.astype(logits.dtype)
    if activation == "relu":
        out = jax.nn.relu(logits)
    elif activation == "leaky_relu":
        out = jax.nn.leaky_relu(logits)
    elif activation == "sigmoid":
        out = jax.nn.sigmoid(logits)
    else:
        raise NotImplementedError(f"Activation not implemented: {activation}")
    if mask is not None:
        out = jnp.where(mask, out, 0.0)
    return out


# ---------------------------------------------------------------------------
# Embedder forward
# ---------------------------------------------------------------------------

def abmil_embed(
    params: Params,
    bags: jnp.ndarray,
    *,
    n_heads: int,
    activation: str = "softmax",
    mask: Optional[jnp.ndarray] = None,
    n_views: int = 1,
    view_rng=None,
    dropout_rng=None,
    train: bool = False,
    return_attention: bool = False,
    return_tokens: bool = False,
    use_pallas: Optional[bool] = None,
    row_offset=None,
) -> Tuple[jnp.ndarray, ...]:
    """ABMIL forward (ref: Model.py:375-451).

    Args:
      bags: [b, t, input_dim] patch-feature bags (padded if ragged).
      mask: optional [b, t] bool validity mask for padded tokens.
      n_views: 1 = whole-bag pooling; 3 = whole + two disjoint random half-bags
        (ref: Model.py:419-440). Views share one random permutation across the
        batch, like the reference's single np.random.shuffle.
      use_pallas: route the masked softmax-pooling through the fused Pallas
        kernel (defaults to auto: on TPU backends, off elsewhere).

    Returns: pooled [b, nh, e] (n_views=1) or [b, n_views, nh, e], plus
      raw_attention [b, t, nh] if return_attention, plus token features
      [b, t, nh, e] if return_tokens. (Head-MAJOR layout — see module note.)
    """
    hidden = params["pre_attn"]["fc3"]["w"].shape[1] // n_heads

    if train and dropout_rng is not None:
        pre_rng, attn_rng = jax.random.split(dropout_rng)
    else:
        pre_rng = attn_rng = None

    # Fused inference fast paths (fall through to the composable path whenever
    # logits/tokens/views are needed or off-TPU):
    #  - bf16: ONE kernel runs the whole encoder (pre-attn MLP + gates + pool,
    #    ops/encode_fused.py) — HBM traffic collapses to a single input read
    #    (+50% measured throughput);
    #  - f32: XLA pre-attn + fused gates+pool (precision-guarded) to preserve
    #    <=1e-4 checkpoint parity.
    fused_ok = (
        not train and n_views == 1 and activation == "softmax"
        and not return_attention and not return_tokens
        and use_pallas is not False
        and jax.default_backend() == "tpu"
    )
    if fused_ok and bags.dtype == jnp.bfloat16:
        from madeleine_tpu.ops.encode_fused import encode_pool_fused

        return encode_pool_fused(params, bags, mask)

    y = pre_attn_mlp(params["pre_attn"], bags, dropout_rng=pre_rng, train=train,
                     row_offset=row_offset)
    # head-major split (bridge permutes the reference's '(e c)' order at load)
    xh = y.reshape(*y.shape[:-1], n_heads, hidden)

    if fused_ok:
        from madeleine_tpu.ops.gated_pool import gated_attention_pool

        return gated_attention_pool(params["attn"], xh, mask)

    raw_logits = gated_attention_logits(params["attn"], xh, dropout_rng=attn_rng,
                                        train=train, row_offset=row_offset)

    from madeleine_tpu.ops.attn_pool import (
        fused_attention_pool,
        masked_attention_pool,
    )

    def _pool(m, act):
        if train and act == "softmax":
            # differentiable fused pooling: Pallas streaming forward (on TPU),
            # exact XLA backward via custom VJP — full-bag training without
            # materializing the per-token softmax (ops/attn_pool.py)
            return fused_attention_pool(xh, raw_logits, m, act, use_pallas, 512)
        return masked_attention_pool(xh, raw_logits, mask=m, activation=act,
                                     use_pallas=use_pallas)

    if n_views == 1:
        pooled = _pool(mask, activation)
        out: Tuple[jnp.ndarray, ...] = (pooled,)
    else:
        t = bags.shape[-2]
        whole = _pool(mask, activation)
        # Two disjoint half-bag views via a shared random permutation
        # (ref: Model.py:427-437). Implemented as boolean half-masks + masked
        # re-softmax of the raw logits — identical math, static shapes.
        if view_rng is None:
            raise ValueError("n_views > 1 requires view_rng")
        perm = jax.random.permutation(view_rng, t)
        ranks = jnp.zeros((t,), jnp.int32).at[perm].set(
            jnp.arange(t, dtype=jnp.int32))
        half1 = (ranks < t // 2)
        views = []
        for half in (half1, ~half1):
            m = half[None, :] if mask is None else (mask & half[None, :])
            views.append(_pool(m, "softmax"))
        pooled = jnp.stack([whole] + views, axis=1)  # [b, 3, nh, e]
        out = (pooled,)

    if return_attention:
        out = out + (raw_logits,)
    if return_tokens:
        out = out + (xh,)
    return out if len(out) > 1 else out[0]
