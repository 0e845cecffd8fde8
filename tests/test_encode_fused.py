"""Whole-encoder fused kernel vs the unfused reference path (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from madeleine_tpu.models.abmil import abmil_embed, init_abmil_params
from madeleine_tpu.ops.encode_fused import encode_pool_fused


@pytest.mark.parametrize("masked", [False, True])
def test_fused_encoder_matches_unfused(masked):
    rng = np.random.default_rng(0)
    d, hidden, nh, f = 16, 32, 2, 32
    params = init_abmil_params(jax.random.PRNGKey(0), d, hidden, nh,
                               attn_hidden_dim=f)
    b, t = 3, 70
    feats = jnp.asarray(rng.standard_normal((b, t, d)).astype(np.float32))
    mask = jnp.asarray(rng.random((b, t)) < 0.8) if masked else None

    want = abmil_embed(params, feats, n_heads=nh, mask=mask, use_pallas=False)
    got = encode_pool_fused(params, feats, mask, t_block=32, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


def test_fused_encoder_single_block():
    rng = np.random.default_rng(1)
    d, hidden, nh, f = 8, 16, 1, 16
    params = init_abmil_params(jax.random.PRNGKey(1), d, hidden, nh,
                               attn_hidden_dim=f)
    feats = jnp.asarray(rng.standard_normal((2, 16, d)).astype(np.float32))
    want = abmil_embed(params, feats, n_heads=nh, use_pallas=False)
    got = encode_pool_fused(params, feats, None, t_block=16, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)
