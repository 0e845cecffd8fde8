"""MADELEINE multistain slide encoder — functional JAX core.

Re-implements the reference MADELEINE module (ref: madeleine/models/Model.py:45-216)
as pure functions over a parameter pytree:

  feats [bs, n_mod, n_tok, d] --(optional stain encodings, Model.py:125-132)-->
  ABMIL embedder (models/abmil.py) -->
    slide path: pooled [*, e, nh] -> flatten(e*nh) -> projector -> 512-d
    token path: per-head token feats -> flatten(e*nh) -> token_projector -> 128-d

Differences from the reference (all TPU-motivated, none semantic):
  - train forward returns dense arrays [bs, n_mod, ...] instead of per-modality
    dicts with the HE tensor replicated across a trailing stain axis
    (ref: Model.py:149-159) — the losses index modalities directly, the
    replication was only pairing sugar. `forward_train_dict` restores the
    reference's dict surface for API parity.
  - every path takes an optional [bs, t] (or [bs, n_mod, t]) validity mask so
    ragged bags run as padded batches instead of per-slide bs=1 loops
    (ref: setup_components.py:162-168 pins downstream batch_size=1).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from madeleine_tpu.config import HE_POSITION, MadeleineConfig
from madeleine_tpu.models.abmil import (
    _init_linear,
    abmil_embed,
    dot_precision,
    init_abmil_params,
)

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def init_madeleine_params(rng, cfg: MadeleineConfig, dtype=jnp.float32) -> Params:
    """Full parameter pytree.

    Mirrors reference module names for the checkpoint bridge:
      wsi_embedders.*    (ref: Model.py:85)
      token_projector    Linear(hidden*nh -> 128)  (ref: Model.py:80-83)
      projector          Linear(hidden*nh -> hidden) (ref: Model.py:88-91)
      embedding          stain-encoding table [n_mod, 32] (ref: Model.py:55)
    """
    if cfg.wsi_encoder != "abmil":
        raise ValueError(f'Unsupported wsi_encoder. Must be "abmil". Now is {cfg.wsi_encoder}.')
    k_emb, k_tok, k_proj, k_stain = jax.random.split(rng, 4)
    hidden = cfg.wsi_encoder_hidden_dim
    nh = cfg.n_heads
    params: Params = {
        "wsi_embedders": init_abmil_params(
            k_emb,
            input_dim=cfg.input_dim,
            hidden_dim=hidden,
            n_heads=nh,
            attn_hidden_dim=cfg.attention_hidden_dim,
            dtype=dtype,
        ),
        "token_projector": _init_linear(k_tok, hidden * nh, cfg.token_proj_dim, dtype),
        "projector": _init_linear(k_proj, hidden * nh, hidden, dtype),
    }
    if cfg.add_stain_encoding:
        params["embedding"] = {
            "table": jax.random.normal(
                k_stain, (cfg.n_modalities, cfg.stain_encoding_dim), dtype)
        }
    return params


def param_count(params: Params) -> int:
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(params))


# ---------------------------------------------------------------------------
# Helpers
# ---------------------------------------------------------------------------

def _linear(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    return jnp.dot(x, p["w"], preferred_element_type=x.dtype,
                   precision=dot_precision(x.dtype)) + p["b"]


def _linear_tokens(p: Params, x: jnp.ndarray, train: bool) -> jnp.ndarray:
    """token_projector matmul. On the bf16 TPU train path, route through the
    layout-pinned custom-VJP kernel (ops/linear_tok.py) so the backward's
    dW = y^T·dtok doesn't drag the whole dxh cotangent sum into a transposed
    layout (~38 ms/step of copies at canonical scale). Same contraction
    numerics (f32 MXU accumulation); f32 operands keep the HIGHEST-precision
    XLA path for checkpoint parity."""
    if (train and x.ndim == 3 and x.dtype == jnp.bfloat16
            and jax.default_backend() == "tpu"):
        from madeleine_tpu.ops.linear_tok import linear_tok_train

        return linear_tok_train(x, p["w"], p["b"])
    return _linear(p, x)


def _append_stain_encoding(params, feats: jnp.ndarray, stain_idx) -> jnp.ndarray:
    """Concat the learned per-stain code to every patch feature
    (ref: Model.py:125-132,177-189). feats [..., t, d]; stain_idx scalar or [n]."""
    table = params["embedding"]["table"]
    enc = jnp.take(table, jnp.asarray(stain_idx), axis=0)  # [..., se_dim]
    enc = jnp.broadcast_to(
        jnp.expand_dims(enc, -2), (*feats.shape[:-1], table.shape[-1])
    ).astype(feats.dtype)
    return jnp.concatenate([feats, enc], axis=-1)


# ---------------------------------------------------------------------------
# Forward passes
# ---------------------------------------------------------------------------

def forward_train(
    params: Params,
    cfg: MadeleineConfig,
    feats: jnp.ndarray,                    # [bs, n_mod, t, d]
    *,
    mask: Optional[jnp.ndarray] = None,    # [bs, n_mod, t] token validity
    n_views: int = 1,
    rng=None,                              # dropout + view rng (train mode)
    train: bool = True,
    use_pallas: Optional[bool] = None,
    axis_name: Optional[str] = None,       # shard_map data axis (DP lane)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Training forward (ref: Model.py:110-159).

    axis_name: when called inside the shard_map data-parallel train lane
    (train/trainer.py), the name of the batch mesh axis. Used only to derive
    each shard's global row offset so dropout draws are sharding-invariant
    (fused kernel seeds + software dropout keys index GLOBAL rows).

    Returns:
      slide_embs:  [bs, n_mod, n_views, embed_dim]   (projector output)
      token_embs:  [bs, n_mod, t, token_proj_dim]    (token_projector output)
    """
    bs, n_mod, t, d = feats.shape

    if train and rng is not None:
        drop_rng, view_rng = jax.random.split(rng)
    else:
        drop_rng, view_rng = None, (rng if rng is not None else jax.random.PRNGKey(0))

    def _row_offset(nrows: int):
        """Global batch index of this shard's row 0 (0 without a mesh axis)."""
        if axis_name is None:
            return jnp.zeros((), jnp.int32)
        return (jax.lax.axis_index(axis_name) * nrows).astype(jnp.int32)

    def _use_fused_encoder(drop_key) -> bool:
        """Route through the whole-encoder train kernel (ops/encoder_train.py):
        pre-attn MLP + gates + pool + token projector in ONE fwd and ONE bwd
        Pallas call — the [*, t, hidden*nh] features and their three summed
        cotangents never touch HBM. Covers n_views 1 AND 3 (the half-bag
        views are two extra bias columns + per-view accumulators in the same
        kernels); non-softmax activations take the per-op fallback chain.
        MADELEINE_FORCE_FUSED=1 overrides the backend gate so tests and the
        driver dryrun exercise this exact route in interpret mode on CPU
        (with dropout rates forced to 0 there — the TPU hardware PRNG does
        not lower in interpret mode)."""
        import os as _os

        return (train and drop_key is not None and n_views in (1, 3)
                and cfg.activation == "softmax" and use_pallas is not False
                and (jax.default_backend() == "tpu"
                     or bool(_os.environ.get("MADELEINE_FORCE_FUSED")))
                and not _os.environ.get("MADELEINE_NO_FUSED_ENCODER"))

    def _fused_tail(x, mask_m, drop_key):
        from madeleine_tpu.ops.encoder_train import (
            GATE_RATE,
            PRE_RATE,
            encoder_train,
        )

        seed = jax.random.randint(drop_key, (), 0,
                                  jnp.iinfo(jnp.int32).max, dtype=jnp.int32)
        half_mask = None
        if n_views == 3:
            # shared random disjoint half-bag split, same construction as the
            # unfused path (abmil_embed) so both routes pool identical views
            perm = jax.random.permutation(view_rng, t)
            ranks = jnp.zeros((t,), jnp.int32).at[perm].set(
                jnp.arange(t, dtype=jnp.int32))
            half_mask = ranks < t // 2
        # forced-fused off-TPU (tests/dryrun): interpret mode cannot lower the
        # hardware PRNG, so dropout is off there; real TPU keeps the ref rates
        on_tpu = jax.default_backend() == "tpu"
        pre_rate = PRE_RATE if on_tpu else 0.0
        gate_rate = GATE_RATE if on_tpu else 0.0
        # dx (input-feature grad) is dead unless x carries the learned
        # stain-encoding columns — skip its matmul + HBM write statically
        return encoder_train(x, params["wsi_embedders"]["pre_attn"],
                             params["wsi_embedders"]["attn"],
                             params["token_projector"], mask_m, seed,
                             pre_rate, gate_rate,
                             need_dx=bool(cfg.add_stain_encoding),
                             half_mask=half_mask,
                             row_offset=_row_offset(x.shape[0]))

    def _per_modality(feats_m, mask_m, mod_idx, drop_key):
        """One modality's [bs, t, d] bags -> (slide [bs, nv, e], tokens
        [bs, t, 128]). Tokens are projected to 128-d HERE so the full
        [bs, t, hidden*nh] features never outlive the modality step."""
        x = feats_m
        if cfg.add_stain_encoding:
            # Documented deviation: the reference builds train-time stain ids
            # mod-major ([i]*bs, Model.py:126-129) but flattens feats b-major
            # (Model.py:122), misassigning encodings whenever bs != 1; its eval
            # path (Model.py:186) is correct. We use the correct per-stain id.
            x = _append_stain_encoding(params, x, mod_idx)
        if _use_fused_encoder(drop_key):
            pooled, tok_emb = _fused_tail(x, mask_m, drop_key)
            nh, e = pooled.shape[-2], pooled.shape[-1]
            nv = 1 if pooled.ndim == 3 else pooled.shape[1]
            slide_emb = _linear(params["projector"],
                                pooled.reshape(bs, nv, nh * e))
            return slide_emb, tok_emb
        pooled, tokens = abmil_embed(
            params["wsi_embedders"], x,
            n_heads=cfg.n_heads, activation=cfg.activation, mask=mask_m,
            n_views=n_views, view_rng=view_rng, dropout_rng=drop_key,
            train=train, return_tokens=True, use_pallas=use_pallas,
            row_offset=_row_offset(x.shape[0]),
        )
        if n_views == 1:
            pooled = pooled[:, None]              # [bs, 1, nh, e]
        nh, e = tokens.shape[-2], tokens.shape[-1]
        # token path (Model.py:138-140); projector rows bridge-permuted
        tok_emb = _linear_tokens(params["token_projector"],
                                 tokens.reshape(bs, t, nh * e), train)
        # slide path (Model.py:143-146)
        slide_emb = _linear(params["projector"],
                            pooled.reshape(bs, pooled.shape[1], nh * e))
        return slide_emb, tok_emb

    if train and not cfg.modality_scan:
        # Joint path: fold modalities into the batch dim — one embedder call
        # over [bs*n_mod, t, d]. Larger fusion regions and no scan overhead;
        # residuals for ALL modalities are live at once, so this needs
        # remat=False headroom math to fit (with the custom-VJP train kernels
        # saving only (x, seed), canonical scale is ~3.5 GB — it fits).
        x = feats.reshape(bs * n_mod, t, d)
        mask_f = None if mask is None else mask.reshape(bs * n_mod, t)
        if cfg.add_stain_encoding:
            # row b*n_mod + m is modality m (correct per-stain id; see the
            # scan path's deviation note)
            x = _append_stain_encoding(params, x,
                                       jnp.tile(jnp.arange(n_mod), bs))
        if _use_fused_encoder(drop_rng):
            pooled, tok_emb = _fused_tail(x, mask_f, drop_rng)
            nh, e = pooled.shape[-2], pooled.shape[-1]
            nv = 1 if pooled.ndim == 3 else pooled.shape[1]
            slide_emb = _linear(params["projector"],
                                pooled.reshape(bs * n_mod, nv, nh * e))
            return (slide_emb.reshape(bs, n_mod, *slide_emb.shape[1:]),
                    tok_emb.reshape(bs, n_mod, t, tok_emb.shape[-1]))
        pooled, tokens = abmil_embed(
            params["wsi_embedders"], x,
            n_heads=cfg.n_heads, activation=cfg.activation, mask=mask_f,
            n_views=n_views, view_rng=view_rng, dropout_rng=drop_rng,
            train=True, return_tokens=True, use_pallas=use_pallas,
            row_offset=_row_offset(x.shape[0]),
        )
        if n_views == 1:
            pooled = pooled[:, None]                  # [bs*n_mod, 1, nh, e]
        nh, e = tokens.shape[-2], tokens.shape[-1]
        tok_emb = _linear_tokens(params["token_projector"],
                                 tokens.reshape(bs * n_mod, t, nh * e), True)
        slide_emb = _linear(params["projector"],
                            pooled.reshape(bs * n_mod, pooled.shape[1],
                                           nh * e))
        return (slide_emb.reshape(bs, n_mod, *slide_emb.shape[1:]),
                tok_emb.reshape(bs, n_mod, t, tok_emb.shape[-1]))

    if train:
        # Sequential scan over modalities + remat: only ONE modality's
        # embedder activations are ever live (canonical scale would otherwise
        # need >25 GB of residuals for the joint [bs*n_mod, t, *] backward).
        # Each step still feeds bs*t tokens to the MXU, so throughput holds.
        drop_keys = (jax.random.split(drop_rng, n_mod)
                     if drop_rng is not None
                     else jnp.zeros((n_mod, 2), jnp.uint32))

        def body(_, inp):
            feats_m, mask_m, mod_idx, key = inp
            out = _per_modality(feats_m, mask_m, mod_idx,
                                key if drop_rng is not None else None)
            return None, out

        scan_body = jax.checkpoint(body) if cfg.remat else body
        feats_t = jnp.swapaxes(feats, 0, 1)        # [n_mod, bs, t, d]
        mask_t = (jnp.swapaxes(mask, 0, 1) if mask is not None
                  else jnp.ones((n_mod, bs, t), bool))
        _, (slides, toks) = jax.lax.scan(
            scan_body, None,
            (feats_t, mask_t, jnp.arange(n_mod), drop_keys))
        slide_embs = jnp.swapaxes(slides, 0, 1)    # [bs, n_mod, nv, e]
        token_embs = jnp.swapaxes(toks, 0, 1)      # [bs, n_mod, t, 128]
        return slide_embs, token_embs

    # eval/parity path: all modalities vectorized at once
    outs = [
        _per_modality(feats[:, i],
                      None if mask is None else mask[:, i],
                      i, None)
        for i in range(n_mod)
    ]
    slide_embs = jnp.stack([o[0] for o in outs], axis=1)
    token_embs = jnp.stack([o[1] for o in outs], axis=1)
    return slide_embs, token_embs


def forward_train_dict(params, cfg, feats, **kw):
    """Reference-shaped output: {modality: emb} dicts, HE replicated on a
    trailing stain axis (ref: Model.py:149-159). Thin wrapper for API parity."""
    slide_embs, token_embs = forward_train(params, cfg, feats, **kw)
    n_mod = len(cfg.MODALITIES)
    wsi, tok = {}, {}
    for idx, modality in enumerate(cfg.MODALITIES):
        s, tk = slide_embs[:, idx], token_embs[:, idx]
        if modality == "HE":
            s = jnp.repeat(s[..., None], max(n_mod - 1, 1), axis=-1)
            tk = jnp.repeat(tk[..., None], max(n_mod - 1, 1), axis=-1)
        wsi[modality] = s
        tok[modality] = tk
    return wsi, tok


def encode(
    params: Params,
    cfg: MadeleineConfig,
    feats: jnp.ndarray,                    # [bs, t, d] single-stain bags
    *,
    stain_idx: int = HE_POSITION,
    mask: Optional[jnp.ndarray] = None,    # [bs, t]
    use_pallas: Optional[bool] = None,
) -> jnp.ndarray:
    """Single-stain slide encoding -> [bs, embed_dim].

    stain_idx=0 reproduces `encode_he` (ref: Model.py:97-107); other indices
    reproduce the per-stain eval branch (ref: Model.py:162-203), including the
    stain-encoding concat when enabled.
    """
    if cfg.add_stain_encoding:
        feats = _append_stain_encoding(params, feats, stain_idx)
    pooled = abmil_embed(
        params["wsi_embedders"], feats,
        n_heads=cfg.n_heads, activation=cfg.activation, mask=mask,
        train=False, use_pallas=use_pallas,
    )                                       # [bs, nh, e]
    bs, nh, e = pooled.shape
    return _linear(params["projector"], pooled.reshape(bs, nh * e))


def encode_with_attention(
    params: Params,
    cfg: MadeleineConfig,
    feats: jnp.ndarray,
    *,
    mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """HE encoding + raw attention logits (ref: Model.py:206-216)."""
    if cfg.add_stain_encoding:
        feats = _append_stain_encoding(params, feats, HE_POSITION)
    pooled, raw_attn = abmil_embed(
        params["wsi_embedders"], feats,
        n_heads=cfg.n_heads, activation=cfg.activation, mask=mask,
        train=False, return_attention=True, use_pallas=False,
    )
    bs, nh, e = pooled.shape
    emb = _linear(params["projector"], pooled.reshape(bs, nh * e))
    return emb, raw_attn


# Convenience alias matching the reference method name.
def encode_he(params, cfg, feats, *, mask=None, use_pallas=None):
    return encode(params, cfg, feats, stain_idx=HE_POSITION, mask=mask,
                  use_pallas=use_pallas)
