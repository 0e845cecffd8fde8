"""Checkpoint-level parity with the reference torch model.

Strategy (SURVEY §4/§7): instantiate the reference MADELEINE with random torch
init, bridge its state_dict into our JAX pytree, and assert forward-pass parity
to <=1e-4 on every inference/training branch. This is the strongest offline
stand-in for HF-checkpoint parity (no network egress in CI).
"""

from argparse import Namespace

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from madeleine_tpu.config import MadeleineConfig
from madeleine_tpu.models import madeleine as mtm
from madeleine_tpu.models.factory import (
    params_to_state_dict,
    state_dict_to_params,
)

MODALITIES = ["HE", "HER2", "PGR"]

# The reference hardcodes its attention hidden dim to 512 (ref: Model.py:71) and
# sizes the projectors from it (Model.py:80-91), so its forward only works when
# wsi_encoder_hidden_dim == 512. Parity configs must respect that constraint.
HIDDEN = 512


def _ref_config(n_heads=2, add_se=False):
    return Namespace(
        MODALITIES=list(MODALITIES),
        wsi_encoder="abmil",
        patch_embedding_dim=24,
        wsi_encoder_hidden_dim=HIDDEN,
        activation="softmax",
        n_heads=n_heads,
        precision="float32",
    )


def _our_config(n_heads=2, add_se=False):
    return MadeleineConfig(
        wsi_encoder="abmil",
        patch_embedding_dim=24,
        wsi_encoder_hidden_dim=HIDDEN,
        activation="softmax",
        n_heads=n_heads,
        add_stain_encoding=add_se,
        dataset="__test__",
        MODALITIES=list(MODALITIES),
    ).finalize()


@pytest.fixture(params=[False, True], ids=["noSE", "withSE"])
def bridged(request, reference_models):
    """(ref torch model in eval mode, our cfg, our params, add_se)."""
    import torch

    ref_model_mod, _ = reference_models
    add_se = request.param
    torch.manual_seed(0)
    ref = ref_model_mod.MADELEINE(config=_ref_config(add_se=add_se),
                                  stain_encoding=add_se)
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = state_dict_to_params(sd)
    cfg = _our_config(add_se=add_se)
    return ref, cfg, params, add_se


def test_encode_he_parity(bridged):
    import torch

    ref, cfg, params, add_se = bridged
    if add_se:
        # ref encode_he never concats stain encodings (Model.py:97-107), so it
        # shape-errors on stain-encoding models; the eval-branch parity test
        # covers HE encoding for that case.
        pytest.skip("reference encode_he unsupported with stain encodings")
    rng = np.random.default_rng(1)
    feats = rng.standard_normal((3, 50, 24)).astype(np.float32)
    with torch.no_grad():
        want = ref.encode_he(torch.from_numpy(feats), device="cpu").numpy()
    got = np.asarray(mtm.encode_he(params, cfg, jnp.asarray(feats)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_train_forward_parity(bridged):
    import torch

    ref, cfg, params, add_se = bridged
    rng = np.random.default_rng(2)
    bs, n_mod, t, d = 4, len(MODALITIES), 30, 24
    feats = rng.standard_normal((bs, n_mod, t, d)).astype(np.float32)
    slide, tokens = mtm.forward_train(params, cfg, jnp.asarray(feats),
                                      n_views=1, train=False)
    if add_se:
        # Documented deviation: the reference misassigns train-time stain ids
        # (mod-major ids onto b-major rows, Model.py:122 vs 126-129), so exact
        # train-forward parity is impossible for stain-encoding models.
        # Instead check internal consistency with the (correct) eval path.
        for idx in range(n_mod):
            want = np.asarray(mtm.encode(params, cfg,
                                         jnp.asarray(feats[:, idx]),
                                         stain_idx=idx))
            got = np.asarray(slide[:, idx, 0])
            np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5,
                                       err_msg=f"train/eval disagree, stain {idx}")
        return

    with torch.no_grad():
        wsi_ref, tok_ref = ref({"feats": torch.from_numpy(feats)}, device="cpu",
                               train=True, n_views=1)
    for idx, mod in enumerate(MODALITIES):
        want_s = wsi_ref[mod].numpy()
        want_t = tok_ref[mod].numpy()
        got_s = np.asarray(slide[:, idx])        # [bs, 1, e]
        got_t = np.asarray(tokens[:, idx])       # [bs, t, 128]
        if mod == "HE":                          # ref replicates HE on a stain axis
            want_s = want_s[..., 0]
            want_t = want_t[..., 0]
        np.testing.assert_allclose(got_s, want_s, rtol=1e-4, atol=1e-5,
                                   err_msg=f"slide emb mismatch for {mod}")
        np.testing.assert_allclose(got_t, want_t, rtol=1e-4, atol=1e-5,
                                   err_msg=f"token emb mismatch for {mod}")


def test_eval_per_stain_parity(bridged):
    import torch

    ref, cfg, params, add_se = bridged
    rng = np.random.default_rng(3)
    # ref's eval stain-encoding concat builds a [1, bs] id tensor and only
    # broadcasts correctly at bs=1 (Model.py:186-189) — downstream loaders pin
    # batch_size=1 so it never fires upstream. Our masked path has no such limit.
    bs, t, d = (1 if add_se else 2), 40, 24
    for stain_idx in range(len(MODALITIES)):
        feats = rng.standard_normal((bs, t, d)).astype(np.float32)
        with torch.no_grad():
            # ref eval branch runs [bs, 1, t, d] with custom_stain_idx
            out = ref({"feats": torch.from_numpy(feats[:, None])}, device="cpu",
                      train=False,
                      custom_stain_idx=stain_idx if stain_idx else None)
            key = MODALITIES[stain_idx] if stain_idx else "HE"
            want = out[key].numpy().squeeze(1)
        got = np.asarray(mtm.encode(params, cfg, jnp.asarray(feats),
                                    stain_idx=stain_idx))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5,
                                   err_msg=f"stain {stain_idx}")


def test_attention_branch_parity(bridged):
    import torch

    ref, cfg, params, add_se = bridged
    if add_se:
        # ref return_attention branch never concats stain encodings
        # (Model.py:206-216) and shape-errors on stain-encoding models.
        pytest.skip("reference attention branch unsupported with stain encodings")
    rng = np.random.default_rng(4)
    feats = rng.standard_normal((2, 25, 24)).astype(np.float32)
    with torch.no_grad():
        want_emb, want_attn = ref({"feats": torch.from_numpy(feats[:, None])},
                                  device="cpu", train=False, return_attention=True)
    got_emb, got_attn = mtm.encode_with_attention(params, cfg, jnp.asarray(feats))
    np.testing.assert_allclose(np.asarray(got_emb), want_emb.numpy().squeeze(1),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_attn), want_attn.numpy().squeeze(2),
                               rtol=1e-4, atol=1e-5)


def test_state_dict_roundtrip(bridged):
    ref, cfg, params, _ = bridged
    sd = params_to_state_dict(params)
    params2 = state_dict_to_params(sd)
    for (p1, l1), (p2, l2) in zip(
        jax.tree_util.tree_leaves_with_path(params),
        jax.tree_util.tree_leaves_with_path(params2),
    ):
        assert p1 == p2
        np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))

    want = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    for k, v in want.items():
        np.testing.assert_allclose(sd[k], v, rtol=0, atol=0,
                                   err_msg=f"round-trip mismatch at {k}")


def test_masked_equals_trimmed(bridged):
    """Padding + mask must equal running the unpadded bag (new capability —
    the reference has no masked path)."""
    _, cfg, params, _ = bridged
    rng = np.random.default_rng(5)
    feats = rng.standard_normal((2, 37, 24)).astype(np.float32)
    pad = np.zeros((2, 11, 24), np.float32)
    padded = jnp.asarray(np.concatenate([feats, pad], axis=1))
    mask = jnp.asarray(np.concatenate(
        [np.ones((2, 37), bool), np.zeros((2, 11), bool)], axis=1))
    want = mtm.encode_he(params, cfg, jnp.asarray(feats))
    got = mtm.encode_he(params, cfg, padded, mask=mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)
