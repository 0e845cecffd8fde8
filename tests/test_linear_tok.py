"""Layout-pinned token-projector kernel (ops/linear_tok.py) — interpret mode.

Pins the Pallas fwd/bwd against XLA's y @ W + b and its autodiff. The
compiled-on-TPU path is exercised by scripts/verify_train_kernels.py and the
train step itself (bf16 only; f32 stays on the HIGHEST-precision XLA path).
"""

import numpy as np

import jax
import jax.numpy as jnp

from madeleine_tpu.ops.linear_tok import _bwd_call, _fwd_call


def _data(bb=2, t=70, E=64, d_out=16, seed=0):
    rng = np.random.default_rng(seed)
    y = jnp.asarray(rng.standard_normal((bb, t, E)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((E, d_out)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((d_out,)), jnp.float32)
    return y, w, b


def test_forward_matches_xla():
    y, w, b = _data()
    ref = jnp.einsum("bte,eo->bto", y, w,
                     precision=jax.lax.Precision.HIGHEST) + b
    got = _fwd_call(y, w, b, t_block=32, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_backward_matches_xla_autodiff():
    y, w, b = _data(seed=1)
    g = jnp.asarray(np.random.default_rng(2).standard_normal(
        (y.shape[0], y.shape[1], w.shape[1])), jnp.float32)

    def loss(y, w, b):
        out = jnp.einsum("bte,eo->bto", y, w,
                         precision=jax.lax.Precision.HIGHEST) + b
        return jnp.sum(out * g)

    dy_ref, dw_ref, db_ref = jax.grad(loss, argnums=(0, 1, 2))(y, w, b)
    dy, dw, db = _bwd_call(y, g, w, t_block=32, interpret=True)
    np.testing.assert_allclose(np.asarray(dy), np.asarray(dy_ref),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(dw_ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(db), np.asarray(db_ref),
                               rtol=1e-4, atol=1e-4)


def test_ragged_t_padding():
    # t not a multiple of t_block: padded rows must not leak into dw/db
    y, w, b = _data(t=45, seed=3)
    g = jnp.asarray(np.random.default_rng(4).standard_normal(
        (2, 45, 16)), jnp.float32)
    dy, dw, db = _bwd_call(y, g, w, t_block=32, interpret=True)
    dw_ref = jnp.einsum("bte,bto->eo", y, g,
                        precision=jax.lax.Precision.HIGHEST)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(dw_ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(db),
                               np.asarray(jnp.sum(g, axis=(0, 1))),
                               rtol=1e-4, atol=1e-4)
