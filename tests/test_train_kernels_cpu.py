"""CPU (interpret-mode) coverage for the fused train kernels' math.

The hardware-PRNG dropout draw (pltpu.prng_*) has no interpret-mode lowering,
but at rate=0 the kernels never touch the PRNG (statically gated in
_layer_mask/_branch_mask), so the FULL matmul/LN/GELU/gate/custom-VJP math of
ops/preattn.py and ops/gated_logits.py lowers and runs in interpret mode on
CPU. These tests put that math in the recorded suite; the dropout masks (the
only part not coverable here) are exercised on-TPU by tests/test_gated_logits.py
and scripts/verify_train_kernels.py.

Ref semantics under test: Model.py:350-363 (pre-attn MLP), abmil.py:41-52
(gated attention logits).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    jax.default_backend() == "tpu",
    reason="interpret-mode lane; TPU backend runs the hardware tests instead")

# small shapes: interpret mode emulates the kernel block-by-block in Python
B, T, D, NH, E = 2, 64, 128, 2, 128
T_BLOCK = 32


@pytest.fixture(scope="module")
def abmil_params():
    from madeleine_tpu.models.abmil import init_abmil_params

    return init_abmil_params(jax.random.PRNGKey(1), D, E, NH, E)


@pytest.fixture(scope="module")
def x():
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.standard_normal((B, T, D)), jnp.float32)


@pytest.fixture(scope="module")
def y(abmil_params, x):
    from madeleine_tpu.models.abmil import pre_attn_mlp

    return pre_attn_mlp(abmil_params["pre_attn"], x, train=False)


def test_preattn_rate0_matches_unfused(abmil_params, x):
    from madeleine_tpu.models.abmil import pre_attn_mlp
    from madeleine_tpu.ops.preattn import preattn_train

    ref = pre_attn_mlp(abmil_params["pre_attn"], x, train=False)
    got = preattn_train(x, abmil_params["pre_attn"], jnp.int32(7), 0.0,
                        T_BLOCK)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_preattn_rate0_grads_match_unfused(abmil_params, x):
    from madeleine_tpu.models.abmil import pre_attn_mlp
    from madeleine_tpu.ops.preattn import preattn_train

    pre = abmil_params["pre_attn"]

    def lf(x, pre):
        return jnp.sum(jnp.sin(preattn_train(x, pre, jnp.int32(7), 0.0,
                                             T_BLOCK)))

    def lr(x, pre):
        return jnp.sum(jnp.sin(pre_attn_mlp(pre, x, train=False)))

    gx_f, gp_f = jax.grad(lf, argnums=(0, 1))(x, pre)
    gx_r, gp_r = jax.grad(lr, argnums=(0, 1))(x, pre)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r),
                               rtol=1e-4, atol=1e-4)
    flat_f, _ = jax.tree_util.tree_flatten_with_path(gp_f)
    flat_r, _ = jax.tree_util.tree_flatten_with_path(gp_r)
    for (path, vf), (_, vr) in zip(flat_f, flat_r):
        scale = max(1.0, float(jnp.max(jnp.abs(vr))))
        np.testing.assert_allclose(np.asarray(vf), np.asarray(vr),
                                   rtol=1e-4, atol=1e-4 * scale,
                                   err_msg=jax.tree_util.keystr(path))


def test_gated_rate0_matches_unfused(abmil_params, y):
    from madeleine_tpu.models.abmil import gated_attention_logits
    from madeleine_tpu.ops.gated_logits import gated_logits_train

    attn = abmil_params["attn"]
    ref = gated_attention_logits(attn, y.reshape(B, T, NH, E), train=False)
    got = gated_logits_train(y, attn, jnp.int32(7), 0.0, T_BLOCK)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_gated_rate0_grads_match_unfused(abmil_params, y):
    from madeleine_tpu.models.abmil import gated_attention_logits
    from madeleine_tpu.ops.gated_logits import gated_logits_train

    attn = abmil_params["attn"]

    def lf(y, attn):
        return jnp.sum(jnp.sin(gated_logits_train(y, attn, jnp.int32(7), 0.0,
                                                  T_BLOCK)))

    def lr(y, attn):
        return jnp.sum(jnp.sin(gated_attention_logits(
            attn, y.reshape(B, T, NH, E), train=False)))

    gy_f, ga_f = jax.grad(lf, argnums=(0, 1))(y, attn)
    gy_r, ga_r = jax.grad(lr, argnums=(0, 1))(y, attn)
    np.testing.assert_allclose(np.asarray(gy_f), np.asarray(gy_r),
                               rtol=1e-4, atol=1e-4)
    for k in ga_f:
        scale = max(1.0, float(jnp.max(jnp.abs(ga_r[k]))))
        np.testing.assert_allclose(np.asarray(ga_f[k]), np.asarray(ga_r[k]),
                                   rtol=1e-4, atol=1e-4 * scale, err_msg=k)


def test_preattn_ragged_tail_padding(abmil_params):
    """T not a multiple of t_block: padded tail must not leak into outputs."""
    from madeleine_tpu.models.abmil import pre_attn_mlp
    from madeleine_tpu.ops.preattn import preattn_train

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((1, 41, D)), jnp.float32)
    ref = pre_attn_mlp(abmil_params["pre_attn"], x, train=False)
    got = preattn_train(x, abmil_params["pre_attn"], jnp.int32(5), 0.0,
                        T_BLOCK)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
