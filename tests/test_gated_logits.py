"""Fused train-time gated-logits kernel (ops/gated_logits.py).

The kernel uses the TPU hardware PRNG (pltpu.prng_seed/prng_random_bits),
which has no CPU interpret-mode lowering — these tests therefore run only on
a real TPU backend and skip under the CPU-forced suite (tests/conftest.py).
scripts/verify_train_kernels.py is the manual on-TPU verification driver and
covers the same ground plus dropout statistics.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="hardware-PRNG kernel: TPU backend only")


def _setup():
    from madeleine_tpu.models.abmil import init_abmil_params

    rng = np.random.default_rng(0)
    nh, e = 4, 512
    params = init_abmil_params(jax.random.PRNGKey(1), e, e, nh, e)
    y = jnp.asarray(rng.standard_normal((2, 256, nh * e)), jnp.float32)
    return params["attn"], y, nh, e


def test_rate0_matches_unfused():
    from madeleine_tpu.models.abmil import gated_attention_logits
    from madeleine_tpu.ops.gated_logits import gated_logits_train

    attn, y, nh, e = _setup()
    b, t, E = y.shape
    ref = gated_attention_logits(attn, y.reshape(b, t, nh, e), train=False)
    got = gated_logits_train(y, attn, jnp.int32(7), 0.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-2, atol=2e-4)


def test_rate0_grads_match_unfused():
    from madeleine_tpu.models.abmil import gated_attention_logits
    from madeleine_tpu.ops.gated_logits import gated_logits_train

    attn, y, nh, e = _setup()
    b, t, E = y.shape

    def lf(y, attn):
        return jnp.sum(jnp.sin(gated_logits_train(y, attn, jnp.int32(7), 0.0)))

    def lr(y, attn):
        return jnp.sum(jnp.sin(gated_attention_logits(
            attn, y.reshape(b, t, nh, e), train=False)))

    gy_f, ga_f = jax.grad(lf, argnums=(0, 1))(y, attn)
    gy_r, ga_r = jax.grad(lr, argnums=(0, 1))(y, attn)
    np.testing.assert_allclose(np.asarray(gy_f), np.asarray(gy_r),
                               rtol=5e-2, atol=3e-3)
    for k in ga_f:
        scale = max(1.0, float(jnp.max(jnp.abs(ga_r[k]))))
        np.testing.assert_allclose(np.asarray(ga_f[k]), np.asarray(ga_r[k]),
                                   rtol=5e-2, atol=3e-3 * scale, err_msg=k)


def test_dropout_active_and_deterministic():
    from madeleine_tpu.ops.gated_logits import gated_logits_train

    attn, y, nh, e = _setup()
    a1 = np.asarray(gated_logits_train(y, attn, jnp.int32(3), 0.25))
    a2 = np.asarray(gated_logits_train(y, attn, jnp.int32(3), 0.25))
    np.testing.assert_array_equal(a1, a2)
    a0 = np.asarray(gated_logits_train(y, attn, jnp.int32(3), 0.0))
    assert (a1 != a0).mean() > 0.5


def test_mask_consistency_wc_fd():
    """dL/dwc uses the BACKWARD's regenerated gates; an FD along wc uses the
    FORWARD's masks — agreement pins fwd/bwd mask consistency."""
    from madeleine_tpu.ops.gated_logits import gated_logits_train

    attn, y, nh, e = _setup()
    rng = np.random.default_rng(5)
    seed = jnp.int32(11)

    def loss_wc(wc):
        return jnp.sum(jnp.sin(gated_logits_train(
            y, dict(attn, wc=wc), seed, 0.25)))

    d = jnp.asarray(rng.standard_normal(attn["wc"].shape), jnp.float32)
    d = d / jnp.linalg.norm(d)
    eps = 1e-3
    fd = (float(loss_wc(attn["wc"] + eps * d))
          - float(loss_wc(attn["wc"] - eps * d))) / (2 * eps)
    an = float(jnp.vdot(jax.grad(loss_wc)(attn["wc"]), d))
    assert abs(fd - an) / max(abs(fd), 1e-6) < 1e-2, (fd, an)
