"""Fused whole-encoder training op (ops/encoder_train.py) vs the unfused
composition — forward and full-gradient parity at rate=(0,0), which runs in
interpret mode on CPU (the hardware-PRNG dropout is the only TPU-gated part;
scripts/verify_train_kernels.py covers it on hardware).

Ref semantics: Model.py:110-146 (token/slide paths), Model.py:350-417
(pre-attn MLP + pooling), abmil.py:34-63 (gated logits).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

B, T, D, NH, E = 2, 96, 128, 2, 128
DOUT = 64
T_BLOCK = 32


@pytest.fixture(scope="module")
def setup():
    from madeleine_tpu.models.abmil import init_abmil_params
    from madeleine_tpu.models.madeleine import _init_linear

    params = init_abmil_params(jax.random.PRNGKey(1), D, E, NH, E)
    tokp = _init_linear(jax.random.PRNGKey(2), E * NH, DOUT)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, T, D)), jnp.float32)
    mask = jnp.asarray(rng.random((B, T)) < 0.8)
    return params, tokp, x, mask


def _unfused(pre, attn, tokp, x, mask):
    from madeleine_tpu.models.abmil import (
        gated_attention_logits,
        pre_attn_mlp,
    )
    from madeleine_tpu.ops.attn_pool import _pool_reference

    b, t, _ = x.shape
    y = pre_attn_mlp(pre, x, train=False)
    xh = y.reshape(b, t, NH, E)
    logits = gated_attention_logits(attn, xh, train=False)
    pooled = _pool_reference(xh, logits, mask, "softmax")      # [b, nh, e]
    tok = jnp.dot(y, tokp["w"], precision=jax.lax.Precision.HIGHEST,
                  preferred_element_type=jnp.float32).astype(x.dtype) \
        + tokp["b"]
    return pooled, tok


@pytest.mark.parametrize("masked", [False, True], ids=["dense", "ragged"])
def test_forward_matches_unfused(setup, masked):
    from madeleine_tpu.ops.encoder_train import encoder_train

    params, tokp, x, mask = setup
    m = mask if masked else None
    want_p, want_t = _unfused(params["pre_attn"], params["attn"], tokp, x, m)
    got_p, got_t = encoder_train(x, params["pre_attn"], params["attn"], tokp,
                                 m, jnp.int32(7), 0.0, 0.0, T_BLOCK)
    np.testing.assert_allclose(np.asarray(got_p), np.asarray(want_p),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_t), np.asarray(want_t),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("save_acts", [False, True],
                         ids=["recompute", "save_acts"])
@pytest.mark.parametrize("masked", [False, True], ids=["dense", "ragged"])
def test_grads_match_unfused(setup, masked, save_acts):
    from madeleine_tpu.ops.encoder_train import encoder_train

    params, tokp, x, mask = setup
    m = mask if masked else None

    def loss_f(x, pre, attn, tokp):
        p, t = encoder_train(x, pre, attn, tokp, m, jnp.int32(7), 0.0, 0.0,
                             T_BLOCK, True, save_acts)
        return jnp.sum(jnp.sin(p)) + jnp.sum(jnp.cos(t) * 0.01)

    def loss_r(x, pre, attn, tokp):
        p, t = _unfused(pre, attn, tokp, x, m)
        return jnp.sum(jnp.sin(p)) + jnp.sum(jnp.cos(t) * 0.01)

    args = (x, params["pre_attn"], params["attn"], tokp)
    gf = jax.grad(loss_f, argnums=(0, 1, 2, 3))(*args)
    gr = jax.grad(loss_r, argnums=(0, 1, 2, 3))(*args)
    flat_f, _ = jax.tree_util.tree_flatten_with_path(gf)
    flat_r, _ = jax.tree_util.tree_flatten_with_path(gr)
    assert len(flat_f) == len(flat_r)
    for (path, vf), (_, vr) in zip(flat_f, flat_r):
        scale = max(1.0, float(jnp.max(jnp.abs(vr))))
        np.testing.assert_allclose(
            np.asarray(vf), np.asarray(vr), rtol=2e-4, atol=2e-4 * scale,
            err_msg=jax.tree_util.keystr(path))


def test_ragged_tail_padding(setup):
    """t not a multiple of t_block: padded tail must not disturb pooling or
    token outputs."""
    from madeleine_tpu.ops.encoder_train import encoder_train

    params, tokp, _, _ = setup
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((1, 41, D)), jnp.float32)
    want_p, want_t = _unfused(params["pre_attn"], params["attn"], tokp, x,
                              None)
    got_p, got_t = encoder_train(x, params["pre_attn"], params["attn"], tokp,
                                 None, jnp.int32(5), 0.0, 0.0, T_BLOCK)
    assert got_t.shape == want_t.shape
    np.testing.assert_allclose(np.asarray(got_p), np.asarray(want_p),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_t), np.asarray(want_t),
                               rtol=1e-5, atol=1e-5)


def test_no_mask_equals_all_ones_mask(setup):
    """mask=None routes through the static has_mask=False kernels (no bias
    input at all); it must agree with an explicit all-True mask through the
    bias path — outputs and full gradients."""
    from madeleine_tpu.ops.encoder_train import encoder_train

    params, tokp, x, _ = setup
    ones = jnp.ones((B, T), bool)

    def loss_f(args, m):
        x, pre, attn, tokp = args
        p, t = encoder_train(x, pre, attn, tokp, m, jnp.int32(7), 0.0, 0.0,
                             T_BLOCK)
        return jnp.sum(jnp.sin(p)) + jnp.sum(jnp.cos(t) * 0.01)

    args = (x, params["pre_attn"], params["attn"], tokp)
    for a, b in zip(
            jax.tree_util.tree_leaves(jax.grad(loss_f)(args, None)),
            jax.tree_util.tree_leaves(jax.grad(loss_f)(args, ones))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def _unfused_views(pre, attn, tokp, x, mask, half):
    """Reference composition of the n_views=3 intra-modality config
    (ref Model.py:419-440): whole bag + two disjoint half-bag re-softmax
    views of the SAME gated logits."""
    from madeleine_tpu.models.abmil import (
        gated_attention_logits,
        pre_attn_mlp,
    )
    from madeleine_tpu.ops.attn_pool import _pool_reference

    b, t, _ = x.shape
    y = pre_attn_mlp(pre, x, train=False)
    xh = y.reshape(b, t, NH, E)
    logits = gated_attention_logits(attn, xh, train=False)
    m1 = half[None, :] if mask is None else (mask & half[None, :])
    m2 = (~half)[None, :] if mask is None else (mask & ~half[None, :])
    pooled = jnp.stack([_pool_reference(xh, logits, mask, "softmax"),
                        _pool_reference(xh, logits, m1, "softmax"),
                        _pool_reference(xh, logits, m2, "softmax")], axis=1)
    tok = jnp.dot(y, tokp["w"], precision=jax.lax.Precision.HIGHEST,
                  preferred_element_type=jnp.float32).astype(x.dtype) \
        + tokp["b"]
    return pooled, tok


@pytest.mark.parametrize("masked", [False, True], ids=["dense", "ragged"])
def test_multiview_forward_and_grads(setup, masked):
    """n_views=3 in the fused kernels (half-bag bias columns + per-view
    accumulators) vs the unfused composition — forward and full gradients."""
    from madeleine_tpu.ops.encoder_train import encoder_train

    params, tokp, x, mask = setup
    m = mask if masked else None
    rng = np.random.default_rng(5)
    half = np.zeros(T, bool)
    half[rng.permutation(T)[: T // 2]] = True
    half_j = jnp.asarray(half)

    want_p, want_t = _unfused_views(params["pre_attn"], params["attn"],
                                    tokp, x, m, half_j)
    got_p, got_t = encoder_train(x, params["pre_attn"], params["attn"], tokp,
                                 m, jnp.int32(7), 0.0, 0.0, T_BLOCK, True,
                                 None, half_j)
    assert got_p.shape == (B, 3, NH, E)
    np.testing.assert_allclose(np.asarray(got_p), np.asarray(want_p),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_t), np.asarray(want_t),
                               rtol=1e-5, atol=1e-5)

    def loss_f(x, pre, attn, tokp):
        p, t = encoder_train(x, pre, attn, tokp, m, jnp.int32(7), 0.0, 0.0,
                             T_BLOCK, True, None, half_j)
        return jnp.sum(jnp.sin(p)) + jnp.sum(jnp.cos(t) * 0.01)

    def loss_r(x, pre, attn, tokp):
        p, t = _unfused_views(pre, attn, tokp, x, m, half_j)
        return jnp.sum(jnp.sin(p)) + jnp.sum(jnp.cos(t) * 0.01)

    args = (x, params["pre_attn"], params["attn"], tokp)
    gf = jax.grad(loss_f, argnums=(0, 1, 2, 3))(*args)
    gr = jax.grad(loss_r, argnums=(0, 1, 2, 3))(*args)
    for (path, vf), (_, vr) in zip(
            jax.tree_util.tree_flatten_with_path(gf)[0],
            jax.tree_util.tree_flatten_with_path(gr)[0]):
        scale = max(1.0, float(jnp.max(jnp.abs(vr))))
        np.testing.assert_allclose(
            np.asarray(vf), np.asarray(vr), rtol=2e-4, atol=2e-4 * scale,
            err_msg=jax.tree_util.keystr(path))


def test_need_dx_false_same_weight_grads(setup):
    """need_dx=False (canonical no-stain-encoding config) must change NOTHING
    except dx: weight grads match need_dx=True to a few f32 ulp (the two
    settings are DIFFERENT compiled programs — XLA is free to reassociate
    the db = sum(dz) reductions differently around the skipped dz @ w1^T
    matmul, so bit-equality across them is not guaranteed), dx symbolic
    zero."""
    from madeleine_tpu.ops.encoder_train import encoder_train

    params, tokp, x, mask = setup

    def loss_f(args, need_dx):
        x, pre, attn, tokp = args
        p, t = encoder_train(x, pre, attn, tokp, mask, jnp.int32(7), 0.0,
                             0.0, T_BLOCK, need_dx)
        return jnp.sum(jnp.sin(p)) + jnp.sum(jnp.cos(t) * 0.01)

    args = (x, params["pre_attn"], params["attn"], tokp)
    g_full = jax.grad(loss_f)(args, True)
    g_nodx = jax.grad(loss_f)(args, False)
    for a, b in zip(jax.tree_util.tree_leaves(g_full[1:]),
                    jax.tree_util.tree_leaves(g_nodx[1:])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    assert np.all(np.asarray(g_nodx[0]) == 0.0)
    assert np.any(np.asarray(g_full[0]) != 0.0)


def test_ln_mxu_mean_probe_grads_match_default(setup):
    """MADELEINE_PROBE_BWD=ln_mxu_mean is the one CORRECT restructure in the
    bwd probe sweep (LN row means via an MXU matvec instead of VPU cross-lane
    reduction trees — scripts/bench_probe_bwd.py, round-5 verdict item 4);
    its full gradients must match the default LN backward. The probe set is
    read at trace time, so caches are cleared around the swap."""
    from madeleine_tpu.ops import encoder_train as et
    from madeleine_tpu.ops import preattn as pa

    params, tokp, x, mask = setup

    def loss(x, pre, attn, tokp):
        p, t = et.encoder_train(x, pre, attn, tokp, mask, jnp.int32(7), 0.0,
                                0.0, T_BLOCK)
        return jnp.sum(jnp.sin(p)) + jnp.sum(jnp.cos(t) * 0.01)

    args = (x, params["pre_attn"], params["attn"], tokp)
    g_def = jax.grad(loss, argnums=(0, 1, 2, 3))(*args)

    saved = pa._PROBE_BWD
    probe = frozenset({"ln_mxu_mean"})
    try:
        pa._PROBE_BWD = probe
        et._PROBE_BWD = probe
        jax.clear_caches()
        g_mxu = jax.grad(loss, argnums=(0, 1, 2, 3))(*args)
    finally:
        pa._PROBE_BWD = saved
        et._PROBE_BWD = saved
        jax.clear_caches()  # drop probe-traced executables

    for (path, vd), (_, vm) in zip(
            jax.tree_util.tree_flatten_with_path(g_def)[0],
            jax.tree_util.tree_flatten_with_path(g_mxu)[0]):
        scale = max(1.0, float(jnp.max(jnp.abs(vd))))
        np.testing.assert_allclose(
            np.asarray(vm), np.asarray(vd), rtol=1e-5, atol=1e-5 * scale,
            err_msg=jax.tree_util.keystr(path))


def test_save_acts_budget_boundary(setup, monkeypatch):
    """save_acts=None auto-resolution (round-3 verdict weak #5): the flip at
    ACT_BUDGET_BYTES must land exactly (<= saves, > recomputes), the HBM
    guard must veto saves that don't fit next to the batch, and a shape
    resolved to recompute must still produce save-path gradients."""
    from madeleine_tpu.ops import encoder_train as et

    saved_bytes = B * T * ((2 * E + E * NH + 2 * NH * E) * 4 + 3 * 4)
    x_bytes = B * T * D * 4

    # no discoverable HBM limit (CPU): the static budget is the only gate
    monkeypatch.setattr(et, "_device_hbm_limit", lambda: None)
    monkeypatch.setattr(et, "ACT_BUDGET_BYTES", saved_bytes)
    assert et._resolve_save_acts(None, B, T, E, E * NH, 2 * NH * E, 4) is True
    monkeypatch.setattr(et, "ACT_BUDGET_BYTES", saved_bytes - 1)
    assert et._resolve_save_acts(None, B, T, E, E * NH, 2 * NH * E, 4) is False

    # HBM guard: budget fits but saves + ~4x batch + 2 GiB margin don't
    monkeypatch.setattr(et, "ACT_BUDGET_BYTES", saved_bytes)
    tight = saved_bytes + 4 * x_bytes + 2 * 1024**3
    monkeypatch.setattr(et, "_device_hbm_limit", lambda: tight - 1)
    assert et._resolve_save_acts(None, B, T, E, E * NH, 2 * NH * E, 4,
                                 x_bytes=x_bytes) is False
    monkeypatch.setattr(et, "_device_hbm_limit", lambda: tight)
    assert et._resolve_save_acts(None, B, T, E, E * NH, 2 * NH * E, 4,
                                 x_bytes=x_bytes) is True

    # explicit save_acts and the kill switch override everything
    monkeypatch.setattr(et, "_device_hbm_limit", lambda: 0)
    assert et._resolve_save_acts(True, B, T, E, E * NH, 2 * NH * E, 4) is True
    monkeypatch.setenv("MADELEINE_ENCODER_NO_SAVE_ACTS", "1")
    assert et._resolve_save_acts(None, B, T, E, E * NH, 2 * NH * E, 4) is False
    monkeypatch.delenv("MADELEINE_ENCODER_NO_SAVE_ACTS")

    # integration: auto-resolved RECOMPUTE (budget just under the saves)
    # gradients == explicit save_acts=True gradients
    params, tokp, x, mask = setup
    monkeypatch.setattr(et, "ACT_BUDGET_BYTES", saved_bytes - 1)
    monkeypatch.setattr(et, "_device_hbm_limit", lambda: None)

    def loss(x, pre, attn, tokp, save_acts):
        p, t = et.encoder_train(x, pre, attn, tokp, mask, jnp.int32(7),
                                0.0, 0.0, T_BLOCK, True, save_acts)
        return jnp.sum(jnp.sin(p)) + jnp.sum(jnp.cos(t) * 0.01)

    args = (x, params["pre_attn"], params["attn"], tokp)
    g_auto = jax.grad(loss, argnums=(0, 1, 2, 3))(*args, None)
    g_save = jax.grad(loss, argnums=(0, 1, 2, 3))(*args, True)
    for a, b in zip(jax.tree_util.tree_leaves(g_auto),
                    jax.tree_util.tree_leaves(g_save)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)
