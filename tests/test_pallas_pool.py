"""Pallas attention-pooling kernel tests (interpret mode on CPU).

The same kernel runs compiled on TPU; compiled-vs-XLA agreement is exercised by
the driver/bench on real hardware (observed <=2e-6 f32 / bf16-rounding bf16).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from madeleine_tpu.ops.attn_pool import masked_attention_pool


@pytest.mark.parametrize("shape", [
    (2, 100, 4, 64),    # multi-block (t_block=32)
    (1, 31, 2, 64),     # single ragged block
    (3, 64, 1, 128),    # single head
])
def test_kernel_matches_reference(shape):
    b, t, nh, e = shape
    rng = np.random.default_rng(0)
    xh = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    lg = jnp.asarray((rng.standard_normal((b, t, nh)) * 3).astype(np.float32))
    mask = jnp.asarray(rng.random((b, t)) < 0.8)
    ref = masked_attention_pool(xh, lg, mask, use_pallas=False)
    got = masked_attention_pool(xh, lg, mask, interpret=True, t_block=32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_kernel_no_mask():
    rng = np.random.default_rng(1)
    xh = jnp.asarray(rng.standard_normal((2, 90, 4, 64)).astype(np.float32))
    lg = jnp.asarray(rng.standard_normal((2, 90, 4)).astype(np.float32))
    ref = masked_attention_pool(xh, lg, None, use_pallas=False)
    got = masked_attention_pool(xh, lg, None, interpret=True, t_block=32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_kernel_extreme_logits():
    """Online softmax must survive large logit ranges without overflow."""
    rng = np.random.default_rng(2)
    xh = jnp.asarray(rng.standard_normal((1, 64, 2, 32)).astype(np.float32))
    lg = jnp.asarray((rng.standard_normal((1, 64, 2)) * 50).astype(np.float32))
    ref = masked_attention_pool(xh, lg, None, use_pallas=False)
    got = masked_attention_pool(xh, lg, None, interpret=True, t_block=16)
    assert np.all(np.isfinite(np.asarray(got)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_kernel_fully_masked_row_is_zeroish():
    """A fully padded batch row must produce finite output (content unused)."""
    rng = np.random.default_rng(3)
    xh = jnp.zeros((2, 32, 2, 16), jnp.float32).at[0].set(
        jnp.asarray(rng.standard_normal((32, 2, 16)), jnp.float32))
    lg = jnp.asarray(rng.standard_normal((2, 32, 2)).astype(np.float32))
    mask = jnp.zeros((2, 32), bool).at[0].set(True)
    got = masked_attention_pool(xh, lg, mask, interpret=True, t_block=16)
    assert np.all(np.isfinite(np.asarray(got)))
    np.testing.assert_allclose(np.asarray(got[1]), 0.0, atol=1e-6)


def test_mask_broadcast_shapes():
    rng = np.random.default_rng(4)
    xh = jnp.asarray(rng.standard_normal((3, 40, 2, 16)).astype(np.float32))
    lg = jnp.asarray(rng.standard_normal((3, 40, 2)).astype(np.float32))
    m1d = jnp.asarray(rng.random(40) < 0.7)
    a = masked_attention_pool(xh, lg, m1d, use_pallas=False)
    b = masked_attention_pool(xh, lg, jnp.broadcast_to(m1d[None], (3, 40)),
                              use_pallas=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_fused_pool_gradients_match_xla():
    """custom_vjp backward must equal XLA autodiff through the reference path."""
    from madeleine_tpu.ops.attn_pool import fused_attention_pool

    rng = np.random.default_rng(5)
    xh = jnp.asarray(rng.standard_normal((2, 50, 2, 32)).astype(np.float32))
    lg = jnp.asarray(rng.standard_normal((2, 50, 2)).astype(np.float32))
    mask = jnp.asarray(rng.random((2, 50)) < 0.85)
    g_out = jnp.asarray(rng.standard_normal((2, 2, 32)).astype(np.float32))

    def loss_ref(xh, lg):
        out = masked_attention_pool(xh, lg, mask, use_pallas=False)
        return jnp.sum(out * g_out)

    def loss_fused(xh, lg):
        out = fused_attention_pool(xh, lg, mask, "softmax", False, 32)
        return jnp.sum(out * g_out)

    gx_ref, gl_ref = jax.grad(loss_ref, argnums=(0, 1))(xh, lg)
    gx, gl = jax.grad(loss_fused, argnums=(0, 1))(xh, lg)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gl), np.asarray(gl_ref),
                               rtol=1e-4, atol=1e-6)


def test_fused_pool_forward_equals_reference():
    from madeleine_tpu.ops.attn_pool import fused_attention_pool

    rng = np.random.default_rng(6)
    xh = jnp.asarray(rng.standard_normal((3, 40, 4, 16)).astype(np.float32))
    lg = jnp.asarray(rng.standard_normal((3, 40, 4)).astype(np.float32))
    want = masked_attention_pool(xh, lg, None, use_pallas=False)
    got = fused_attention_pool(xh, lg, None, "softmax", False, 512)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


def test_pool_ms_stats_match_reference():
    """_pool_pallas_ms emits (pooled, m, s) with softmax(l)=exp(l-m)/s."""
    from madeleine_tpu.ops.attn_pool import NEG_INF, _pool_pallas_ms

    rng = np.random.default_rng(5)
    b, t, nh, e = 2, 100, 2, 64
    y = jnp.asarray(rng.standard_normal((b, t, nh * e)).astype(np.float32))
    l = jnp.asarray((rng.standard_normal((b, t, nh)) * 3).astype(np.float32))
    mask = jnp.asarray(rng.random((b, t)) < 0.8)
    l32 = jnp.where(mask[..., None], l, NEG_INF)
    out, m, s = _pool_pallas_ms(y, l32, e=e, nh=nh, t_block=32,
                                interpret=True)
    a = np.exp(np.asarray(l32) - np.asarray(m)) / np.asarray(s)
    a_ref = np.asarray(jax.nn.softmax(np.asarray(l32), axis=1))
    np.testing.assert_allclose(a, a_ref, rtol=1e-5, atol=1e-7)
    ref = masked_attention_pool(y.reshape(b, t, nh, e), l, mask,
                                use_pallas=False)
    np.testing.assert_allclose(np.asarray(out).reshape(b, nh, e),
                               np.asarray(ref), rtol=1e-5, atol=1e-6)


def test_pool_bwd_kernel_matches_xla_vjp():
    """The streaming backward kernel == the XLA softmax-pool VJP."""
    from madeleine_tpu.ops.attn_pool import (
        NEG_INF, _pool_bwd_call, _pool_pallas_ms, fused_attention_pool)

    rng = np.random.default_rng(6)
    b, t, nh, e = 2, 90, 2, 64
    xh = jnp.asarray(rng.standard_normal((b, t, nh, e)).astype(np.float32))
    l = jnp.asarray((rng.standard_normal((b, t, nh)) * 2).astype(np.float32))
    mask = jnp.asarray(rng.random((b, t)) < 0.75)
    w = jnp.asarray(rng.standard_normal((b, nh, e)).astype(np.float32))

    # XLA reference grads through the custom-vjp's fallback branch (CPU)
    def loss(xh, l):
        return jnp.sum(w * fused_attention_pool(xh, l, mask))

    dx_ref, dl_ref = jax.grad(loss, argnums=(0, 1))(xh, l)

    # kernel path (interpret mode)
    y = xh.reshape(b, t, nh * e)
    l32 = jnp.where(mask[..., None], l, NEG_INF)
    out, m, s = _pool_pallas_ms(y, l32, e=e, nh=nh, t_block=32,
                                interpret=True)
    g32 = w.astype(jnp.float32)
    inner = jnp.sum(g32 * np.asarray(out).reshape(b, nh, e), axis=-1
                    ).reshape(b, 1, nh)
    dx, dl = _pool_bwd_call(y, l32, m, s, g32.reshape(b, 1, nh * e), inner,
                            e=e, nh=nh, t_block=32, interpret=True)
    np.testing.assert_allclose(np.asarray(dx).reshape(b, t, nh, e),
                               np.asarray(dx_ref), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dl), np.asarray(dl_ref),
                               rtol=1e-4, atol=1e-5)
