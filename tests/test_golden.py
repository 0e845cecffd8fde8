"""Torch-free golden parity suite (SURVEY §4 plan).

Asserts the JAX forward/losses against checked-in reference activations
(tests/golden/golden.npz, generated once by tests/golden/generate.py from the
reference torch model). Runs without torch or the reference checkout.
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from madeleine_tpu.config import MadeleineConfig
from madeleine_tpu.models import madeleine as mtm
from madeleine_tpu.models.factory import state_dict_to_params
from madeleine_tpu.ops import losses as L

GOLDEN = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "golden", "golden.npz")


@pytest.fixture(scope="module")
def golden():
    if not os.path.exists(GOLDEN):
        pytest.skip("golden.npz not generated")
    return np.load(GOLDEN)


@pytest.fixture(scope="module")
def model(golden):
    sd = {k[len("sd/"):]: golden[k] for k in golden.files if k.startswith("sd/")}
    params = state_dict_to_params(sd)
    cfg = MadeleineConfig(
        patch_embedding_dim=24, wsi_encoder_hidden_dim=512,
        attention_hidden_dim=512, n_heads=2, precision="float32",
        dataset="__golden__", MODALITIES=["HE", "HER2", "PGR"],
    ).finalize()
    return cfg, params


def test_encode_he_golden(golden, model):
    cfg, params = model
    got = np.asarray(mtm.encode_he(params, cfg,
                                   jnp.asarray(golden["encode_he/in"])))
    np.testing.assert_allclose(got, golden["encode_he/out"],
                               rtol=1e-4, atol=1e-5)


def test_train_forward_golden(golden, model):
    cfg, params = model
    slide, tokens = mtm.forward_train(params, cfg,
                                      jnp.asarray(golden["train/in"]),
                                      n_views=1, train=False)
    for idx, mod in enumerate(cfg.MODALITIES):
        want_s = golden[f"train/wsi/{mod}"]
        want_t = golden[f"train/tok/{mod}"]
        if mod == "HE":
            want_s, want_t = want_s[..., 0], want_t[..., 0]
        np.testing.assert_allclose(np.asarray(slide[:, idx]), want_s,
                                   rtol=1e-4, atol=1e-5, err_msg=mod)
        np.testing.assert_allclose(np.asarray(tokens[:, idx]), want_t,
                                   rtol=1e-4, atol=1e-5, err_msg=mod)


def test_attention_golden(golden, model):
    cfg, params = model
    emb, raw = mtm.encode_with_attention(params, cfg,
                                         jnp.asarray(golden["attn/in"]))
    np.testing.assert_allclose(np.asarray(emb),
                               golden["attn/emb"].squeeze(1),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(raw),
                               golden["attn/raw"].squeeze(2),
                               rtol=1e-4, atol=1e-5)


def test_infonce_golden(golden):
    q, k = jnp.asarray(golden["infonce/q"]), jnp.asarray(golden["infonce/k"])
    sym = float(L.info_nce(q, k, temperature=0.001, symmetric=True))
    asym = float(L.info_nce(q, k, temperature=0.001, symmetric=False))
    np.testing.assert_allclose(sym, golden["infonce/sym"], rtol=1e-3)
    np.testing.assert_allclose(asym, golden["infonce/asym"], rtol=1e-3)


def test_got_golden(golden):
    got = float(L.got_loss(jnp.asarray(golden["got/v"]),
                           jnp.asarray(golden["got/q"])))
    np.testing.assert_allclose(got, golden["got/out"], rtol=1e-3, atol=1e-3)


# ---------------------------------------------------------------------------
# Flagship-shape goldens (published architecture: n_heads=4, 512-d, ACROBAT
# 5 stains, with/without stain encodings). Weights are rebuilt torch-free via
# tests/golden/generate.flagship_state_dict; the npz holds only activations.
# ---------------------------------------------------------------------------

GOLDEN_FS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "golden", "golden_flagship.npz")


@pytest.fixture(scope="module")
def golden_fs():
    if not os.path.exists(GOLDEN_FS):
        pytest.skip("golden_flagship.npz not generated")
    return np.load(GOLDEN_FS)


def _flagship_model(stain_encoding: bool):
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                    "golden"))
    from generate import flagship_state_dict

    params = state_dict_to_params(flagship_state_dict(
        stain_encoding=stain_encoding))
    cfg = MadeleineConfig(
        patch_embedding_dim=512, wsi_encoder_hidden_dim=512,
        attention_hidden_dim=512, n_heads=4, precision="float32",
        dataset="ACROBAT", add_stain_encoding=stain_encoding,
    ).finalize()
    return cfg, params


@pytest.fixture(scope="module")
def flagship(golden_fs):
    return _flagship_model(stain_encoding=False)


@pytest.fixture(scope="module")
def flagship_se(golden_fs):
    return _flagship_model(stain_encoding=True)


def test_flagship_encode_he(golden_fs, flagship):
    cfg, params = flagship
    got = np.asarray(mtm.encode_he(params, cfg,
                                   jnp.asarray(golden_fs["fs/encode_he/in"])))
    np.testing.assert_allclose(got, golden_fs["fs/encode_he/out"],
                               rtol=1e-4, atol=1e-5)


def test_flagship_train_forward(golden_fs, flagship):
    cfg, params = flagship
    slide, tokens = mtm.forward_train(
        params, cfg, jnp.asarray(golden_fs["fs/train/in"]),
        n_views=1, train=False)
    for idx, mod in enumerate(cfg.MODALITIES):
        want_s = golden_fs[f"fs/train/wsi/{mod}"]
        want_t = golden_fs[f"fs/train/tok/{mod}"]
        if mod == "HE":
            want_s, want_t = want_s[..., 0], want_t[..., 0]
        np.testing.assert_allclose(np.asarray(slide[:, idx]), want_s,
                                   rtol=1e-4, atol=1e-5, err_msg=mod)
        np.testing.assert_allclose(np.asarray(tokens[:, idx]), want_t,
                                   rtol=1e-4, atol=1e-5, err_msg=mod)


def test_flagship_attention(golden_fs, flagship):
    cfg, params = flagship
    emb, raw = mtm.encode_with_attention(
        params, cfg, jnp.asarray(golden_fs["fs/attn/in"]))
    np.testing.assert_allclose(np.asarray(emb),
                               golden_fs["fs/attn/emb"].squeeze(1),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(raw),
                               golden_fs["fs/attn/raw"].squeeze(2),
                               rtol=1e-4, atol=1e-5)


def test_flagship_stain_encoding_train(golden_fs, flagship_se):
    """bs=1 train forward WITH stain encodings (bs=1 sidesteps the
    reference's train-time stain-id misassignment — documented deviation)."""
    cfg, params = flagship_se
    slide, tokens = mtm.forward_train(
        params, cfg, jnp.asarray(golden_fs["se/train/in"]),
        n_views=1, train=False)
    for idx, mod in enumerate(cfg.MODALITIES):
        want_s = golden_fs[f"se/train/wsi/{mod}"]
        want_t = golden_fs[f"se/train/tok/{mod}"]
        if mod == "HE":
            want_s, want_t = want_s[..., 0], want_t[..., 0]
        np.testing.assert_allclose(np.asarray(slide[:, idx]), want_s,
                                   rtol=1e-4, atol=1e-5, err_msg=mod)
        np.testing.assert_allclose(np.asarray(tokens[:, idx]), want_t,
                                   rtol=1e-4, atol=1e-5, err_msg=mod)


def test_flagship_stain_encoding_eval(golden_fs, flagship_se):
    """Per-stain eval branch with custom_stain_idx (ref Model.py:162-203)."""
    cfg, params = flagship_se
    feats = jnp.asarray(golden_fs["se/eval/in"][:, 0])  # [1, t, 512]
    for idx in (3, 1):
        got = np.asarray(mtm.encode(params, cfg, feats, stain_idx=idx))
        np.testing.assert_allclose(got, golden_fs[f"se/eval/{idx}"].squeeze(1),
                                   rtol=1e-4, atol=1e-5, err_msg=f"stain {idx}")
