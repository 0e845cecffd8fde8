"""Bag (sequence) parallelism — shard giant patch bags over the mesh.

SURVEY §5's long-context path: attention pooling is a 1-query online-softmax
reduction, so a bag sharded across devices on the token axis reduces with one
(pmax, psum, psum) triple over ICI — the context-parallel / ring-attention
analog, giving unbounded bag length across chips. The reference's only answer
to long bags is random subsampling (ref: wsi_dataset.py:42-50).

Math: with per-device token shard T_k,
  m  = pmax_k max_{t in T_k} logit_t              (per head)
  s  = psum_k sum_{t in T_k} exp(logit_t - m)
  w  = psum_k sum_{t in T_k} exp(logit_t - m) x_t
  pooled = w / s
identical to the global masked softmax pool. The token-wise pre-attention MLP
and gate scoring need no communication at all.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from madeleine_tpu.config import HE_POSITION, MadeleineConfig
from madeleine_tpu.models.abmil import gated_attention_logits, pre_attn_mlp
from madeleine_tpu.models.madeleine import _append_stain_encoding, _linear
from madeleine_tpu.ops.attn_pool import NEG_INF
from madeleine_tpu.parallel.mesh import BAG_AXIS

try:  # jax>=0.8 exposes shard_map at top level
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map

from jax.sharding import PartitionSpec as P


def _local_pool(params, feats, mask, *, cfg: MadeleineConfig, axis_name: str):
    """Per-shard compute + cross-device online-softmax combine.
    feats: [b, t_local, d]; mask: [b, t_local] bool."""
    nh = cfg.n_heads
    y = pre_attn_mlp(params["wsi_embedders"]["pre_attn"], feats)
    hidden = y.shape[-1] // nh
    xh = y.reshape(*y.shape[:-1], nh, hidden)   # head-major split
    logits = gated_attention_logits(params["wsi_embedders"]["attn"], xh)
    l32 = logits.astype(jnp.float32)
    if mask is not None:
        l32 = jnp.where(mask[..., None], l32, NEG_INF)

    m_loc = jnp.max(l32, axis=1)                          # [b, nh]
    m_glob = jax.lax.pmax(m_loc, axis_name)
    p = jnp.exp(l32 - m_glob[:, None, :])                 # [b, t_l, nh]
    s = jax.lax.psum(jnp.sum(p, axis=1), axis_name)       # [b, nh]
    w = jax.lax.psum(
        jnp.einsum("bthe,bth->bhe", xh.astype(jnp.float32), p,
                   precision=jax.lax.Precision.HIGHEST),
        axis_name)                                        # [b, nh, e]
    pooled = w / jnp.maximum(s, 1e-30)[..., None]
    b = pooled.shape[0]
    emb = _linear(params["projector"],
                  pooled.reshape(b, nh * hidden).astype(feats.dtype))
    return emb


def make_bag_parallel_encoder(cfg: MadeleineConfig, mesh,
                              stain_idx: int = HE_POSITION):
    """Build a jitted ``(params, feats [b, t, d], mask [b, t]) -> [b, e]``
    encoder with the token axis sharded over the mesh's 'bag' axis.
    t must be divisible by the bag-axis size."""

    def fn(params, feats, mask):
        if cfg.add_stain_encoding:
            feats = _append_stain_encoding(params, feats, stain_idx)
        sharded = _shard_map(
            functools.partial(_local_pool, cfg=cfg, axis_name=BAG_AXIS),
            mesh=mesh,
            in_specs=(P(), P(None, BAG_AXIS, None), P(None, BAG_AXIS)),
            out_specs=P(),
        )
        return sharded(params, feats, mask)

    return jax.jit(fn)


from madeleine_tpu.utils.cache import LruCache

_ENCODER_CACHE = LruCache(maxsize=16)


def encode_bag_parallel(
    params,
    cfg: MadeleineConfig,
    feats: jnp.ndarray,                 # [b, t, d], t divisible by mesh bag dim
    mesh,
    *,
    mask: Optional[jnp.ndarray] = None,  # [b, t]
    stain_idx: int = HE_POSITION,
) -> jnp.ndarray:
    """Convenience wrapper around `make_bag_parallel_encoder` with a per-
    (config, mesh, stain) jit cache. Returns replicated [b, embed_dim]."""
    if mask is None:
        mask = jnp.ones(feats.shape[:2], bool)
    from madeleine_tpu.config import config_cache_key

    key = (config_cache_key(cfg), mesh, stain_idx)
    fn = _ENCODER_CACHE.get_or_create(
        key, lambda: make_bag_parallel_encoder(cfg, mesh, stain_idx))
    return fn(params, feats, mask)
