"""Checkpoint tests: orbax save/restore roundtrip, torch export/import."""

import numpy as np

import jax
import jax.numpy as jnp

from madeleine_tpu.config import MadeleineConfig
from madeleine_tpu.models.factory import (
    load_torch_state_dict,
    state_dict_to_params,
)
from madeleine_tpu.models.madeleine import encode_he, init_madeleine_params
from madeleine_tpu.train import checkpoint as ckpt
from madeleine_tpu.train.optim import make_optimizer
from madeleine_tpu.train.trainer import TrainState, init_train_state


def _cfg():
    return MadeleineConfig(
        patch_embedding_dim=8, wsi_encoder_hidden_dim=16,
        attention_hidden_dim=16, n_heads=2, precision="float32",
        dataset="__test__", MODALITIES=["HE", "X"],
    ).finalize()


def _tree_allclose(a, b):
    for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-6)


def test_train_state_roundtrip(tmp_path):
    cfg = _cfg()
    params = init_madeleine_params(jax.random.PRNGKey(0), cfg)
    tx, _ = make_optimizer(cfg, steps_per_epoch=5)
    state = init_train_state(params, tx)

    d = str(tmp_path / "state")
    ckpt.save_train_state(d, {"params": state.params,
                              "opt_state": state.opt_state,
                              "step": state.step},
                          metadata={"epoch": 3, "best_rank": 2.5})
    restored = ckpt.restore_train_state(d, {"params": state.params,
                                            "opt_state": state.opt_state,
                                            "step": state.step})
    _tree_allclose(restored["params"], state.params)
    _tree_allclose(restored["opt_state"], state.opt_state)
    meta = ckpt.load_metadata(d)
    assert meta == {"epoch": 3, "best_rank": 2.5}


def test_train_state_overwrite(tmp_path):
    cfg = _cfg()
    params = init_madeleine_params(jax.random.PRNGKey(0), cfg)
    d = str(tmp_path / "state")
    ckpt.save_train_state(d, {"params": params}, metadata={"epoch": 0})
    params2 = jax.tree.map(lambda x: x + 1.0, params)
    ckpt.save_train_state(d, {"params": params2}, metadata={"epoch": 1})
    restored = ckpt.restore_train_state(d, {"params": params})
    _tree_allclose(restored["params"], params2)
    assert ckpt.load_metadata(d)["epoch"] == 1


def test_torch_export_reimport(tmp_path):
    """model.pt written by us loads back through the torch bridge and yields
    identical encodings — guarantees reference-side consumability."""
    cfg = _cfg()
    params = init_madeleine_params(jax.random.PRNGKey(1), cfg)
    path = ckpt.save_best_torch(str(tmp_path), params, cfg)
    params2 = state_dict_to_params(load_torch_state_dict(path))

    feats = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 20, 8)).astype(np.float32))
    a = np.asarray(encode_he(params, cfg, feats))
    b = np.asarray(encode_he(params2, cfg, feats))
    np.testing.assert_allclose(a, b, rtol=1e-6)

    import json, os
    assert os.path.exists(str(tmp_path / "model_config.json"))
    saved_cfg = MadeleineConfig.from_json(str(tmp_path / "model_config.json"))
    assert saved_cfg.n_heads == cfg.n_heads


def test_exported_checkpoint_loads_in_reference(tmp_path, reference_models):
    """The ultimate interop proof: a model.pt exported from JAX params loads
    through the REFERENCE torch code (strict=True, ref Model.py:28-41) and its
    encode_he matches ours."""
    import torch
    from argparse import Namespace

    ref_model_mod, _ = reference_models

    cfg = MadeleineConfig(
        patch_embedding_dim=24, wsi_encoder_hidden_dim=512,
        attention_hidden_dim=512, n_heads=2, precision="float32",
        dataset="__test__", MODALITIES=["HE", "X", "Y"],
    ).finalize()
    params = init_madeleine_params(jax.random.PRNGKey(3), cfg)
    path = ckpt.save_best_torch(str(tmp_path), params, cfg)

    ref_cfg = Namespace(MODALITIES=list(cfg.MODALITIES), wsi_encoder="abmil",
                        patch_embedding_dim=24, wsi_encoder_hidden_dim=512,
                        activation="softmax", n_heads=2, precision="float32")
    ref = ref_model_mod.create_model(ref_cfg, device="cpu",
                                     checkpoint_path=path)
    ref.eval()

    feats = np.random.default_rng(0).standard_normal((2, 30, 24)).astype(
        np.float32)
    with torch.no_grad():
        want = ref.encode_he(torch.from_numpy(feats), device="cpu").numpy()
    got = np.asarray(encode_he(params, cfg, jnp.asarray(feats)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
