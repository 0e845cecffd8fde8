"""Scan vs joint-batch training forward parity.

`cfg.modality_scan=False` folds the modality axis into the batch and runs the
embedder once over [bs*n_mod, t, d] instead of lax.scan over modalities —
same math, different batching (faster on TPU when residuals fit HBM). With
dropout off the two paths must agree to float tolerance, including stain
encodings, ragged masks, and multi-view.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.flatten_util
import jax.numpy as jnp

from madeleine_tpu.config import MadeleineConfig
from madeleine_tpu.models import madeleine as mtm


def _cfg(**kw):
    base = dict(patch_embedding_dim=16, wsi_encoder_hidden_dim=24,
                attention_hidden_dim=24, n_heads=2, precision="float32",
                dataset="__test__", MODALITIES=["HE", "A", "B"])
    base.update(kw)
    return MadeleineConfig(**base).finalize()


@pytest.mark.parametrize("stain_enc", [False, True])
@pytest.mark.parametrize("masked", [False, True])
def test_joint_matches_scan(stain_enc, masked):
    cfg = _cfg(add_stain_encoding=stain_enc)
    params = mtm.init_madeleine_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    bs, n_mod, t = 3, 3, 40
    feats = jnp.asarray(rng.standard_normal(
        (bs, n_mod, t, cfg.patch_embedding_dim)), jnp.float32)
    mask = (jnp.asarray(rng.random((bs, n_mod, t)) < 0.7) if masked else None)

    # rng=None => no dropout; both paths are deterministic
    s_scan, t_scan = mtm.forward_train(params, cfg, feats, mask=mask,
                                       rng=None, train=True)
    cfg_j = dataclasses.replace(cfg, modality_scan=False)
    s_joint, t_joint = mtm.forward_train(params, cfg_j, feats, mask=mask,
                                         rng=None, train=True)
    assert s_joint.shape == s_scan.shape
    assert t_joint.shape == t_scan.shape
    np.testing.assert_allclose(np.asarray(s_joint), np.asarray(s_scan),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(t_joint), np.asarray(t_scan),
                               rtol=1e-5, atol=1e-5)


def test_joint_multiview_matches_scan(monkeypatch):
    # Zero the dropout rates so the two paths' different RNG-consumption
    # patterns can't matter; the shared view permutation then must line up.
    import madeleine_tpu.models.abmil as abm
    monkeypatch.setattr(abm, "PRE_ATTN_DROPOUT", 0.0)
    monkeypatch.setattr(abm, "ATTN_DROPOUT", 0.0)

    cfg = _cfg()
    cfg_j = dataclasses.replace(cfg, modality_scan=False)
    params = mtm.init_madeleine_params(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(1)
    feats = jnp.asarray(rng.standard_normal((2, 3, 32, 16)), jnp.float32)
    key = jax.random.PRNGKey(7)
    s_scan, _ = mtm.forward_train(params, cfg, feats, rng=key, train=True,
                                  n_views=3)
    s_joint, _ = mtm.forward_train(params, cfg_j, feats, rng=key, train=True,
                                   n_views=3)
    assert s_joint.shape == s_scan.shape == (2, 3, 3, cfg.embed_dim)
    np.testing.assert_allclose(np.asarray(s_joint), np.asarray(s_scan),
                               rtol=1e-5, atol=1e-5)


def test_joint_gradients_match_scan():
    cfg = _cfg(add_stain_encoding=True)
    cfg_j = dataclasses.replace(cfg, modality_scan=False)
    params = mtm.init_madeleine_params(jax.random.PRNGKey(2), cfg)
    rng = np.random.default_rng(2)
    feats = jnp.asarray(rng.standard_normal((2, 3, 24, 16)), jnp.float32)

    def loss(p, c):
        s, tk = mtm.forward_train(p, c, feats, rng=None, train=True)
        return jnp.sum(s ** 2) + jnp.sum(tk ** 2)

    g_scan = jax.grad(loss)(params, cfg)
    g_joint = jax.grad(loss)(params, cfg_j)
    flat_s, _ = jax.flatten_util.ravel_pytree(g_scan)
    flat_j, _ = jax.flatten_util.ravel_pytree(g_joint)
    np.testing.assert_allclose(np.asarray(flat_j), np.asarray(flat_s),
                               rtol=1e-4, atol=1e-4)
