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
