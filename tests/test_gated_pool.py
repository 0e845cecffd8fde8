"""Fused gates+pool kernel tests (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from madeleine_tpu.models.abmil import (
    abmil_embed,
    gated_attention_logits,
    init_abmil_params,
)
from madeleine_tpu.ops.attn_pool import masked_attention_pool
from madeleine_tpu.ops.gated_pool import gated_attention_pool


def _setup(b=2, t=70, d=16, hidden=32, nh=2, f=32, seed=0):
    rng = np.random.default_rng(seed)
    params = init_abmil_params(jax.random.PRNGKey(seed), d, hidden, nh,
                               attn_hidden_dim=f)
    xh = jnp.asarray(rng.standard_normal((b, t, nh, hidden)).astype(np.float32))
    return params, xh, rng


def test_fused_matches_unfused():
    params, xh, rng = _setup()
    mask = jnp.asarray(rng.random(xh.shape[:2]) < 0.8)
    logits = gated_attention_logits(params["attn"], xh)
    want = masked_attention_pool(xh, logits, mask, use_pallas=False)
    got = gated_attention_pool(params["attn"], xh, mask, t_block=32,
                               interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_fused_no_mask():
    params, xh, _ = _setup(seed=1)
    logits = gated_attention_logits(params["attn"], xh)
    want = masked_attention_pool(xh, logits, None, use_pallas=False)
    got = gated_attention_pool(params["attn"], xh, None, t_block=32,
                               interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_fused_single_head_and_ragged():
    params, xh, rng = _setup(b=1, t=37, nh=1, hidden=64, f=16, seed=2)
    mask = jnp.asarray(rng.random(xh.shape[:2]) < 0.7)
    logits = gated_attention_logits(params["attn"], xh)
    want = masked_attention_pool(xh, logits, mask, use_pallas=False)
    got = gated_attention_pool(params["attn"], xh, mask, t_block=16,
                               interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)
