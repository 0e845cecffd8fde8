"""Fused IPOT Pallas kernel tests (interpret mode on CPU).

`ops/ipot.py` runs the whole proximal-point loop (ref: loss.py:179-193) in
one pallas_call per problem; the backward replays the loop in VMEM and runs
the exact adjoint of the unrolled iteration map. These tests pin both against
the XLA `ipot_plan` loop (values) and XLA autodiff through it (gradients).
Compiled-on-TPU agreement is exercised by scripts/verify_train_kernels.py.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from madeleine_tpu.ops.ipot import _bwd_call, _fwd_call
from madeleine_tpu.ops.losses import _threshold_relu, cosine_cost, ipot_plan


def _cost(b, n, m, d=64, seed=0):
    rng = np.random.default_rng(seed)
    v = jnp.asarray(rng.standard_normal((b, n, d)), jnp.float32)
    q = jnp.asarray(rng.standard_normal((b, m, d)), jnp.float32)
    return _threshold_relu(cosine_cost(v, q), None)


@pytest.mark.parametrize("beta,iters", [(0.5, 30), (0.1, 20)])
def test_forward_matches_xla_loop(beta, iters):
    C = _cost(3, 128, 128)
    T_ref = np.asarray(ipot_plan(C, beta=beta, iterations=iters))
    T_new = np.asarray(_fwd_call(C, beta=beta, iters=iters, interpret=True))
    np.testing.assert_allclose(T_new, T_ref, rtol=1e-4, atol=1e-7)


def test_backward_matches_xla_autodiff():
    iters = 10
    C = _cost(2, 128, 128, seed=3)

    # wd = sum(C * T(C)): grad = T (explicit C) + vjp_T(cotangent=C)
    def wd_ref(Cx):
        return jnp.sum(Cx * ipot_plan(Cx, beta=0.5, iterations=iters))

    g_ref = np.asarray(jax.grad(wd_ref)(C))
    T = np.asarray(ipot_plan(C, beta=0.5, iterations=iters))
    dC = np.asarray(_bwd_call(C, C, beta=0.5, iters=iters, interpret=True))
    np.testing.assert_allclose(T + dC, g_ref, rtol=1e-3,
                               atol=1e-5 * np.abs(g_ref).max())


def test_plan_router_falls_back_off_tpu():
    # On CPU, losses._plan must route to the XLA loop (no pallas compile).
    from madeleine_tpu.ops.losses import _plan

    C = _cost(2, 64, 64, seed=5)
    np.testing.assert_allclose(
        np.asarray(_plan(C, 0.5, 12)),
        np.asarray(ipot_plan(C, beta=0.5, iterations=12)),
        rtol=1e-6, atol=1e-8)


def test_gw_gamma_fused_matches_xla_loop():
    from madeleine_tpu.ops.ipot import gw_gamma_fused
    from madeleine_tpu.ops.losses import _plan

    rng = np.random.default_rng(9)
    b, n = 3, 64
    x = jnp.asarray(rng.standard_normal((b, n, 32)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((b, n, 32)), jnp.float32)
    Cs = _threshold_relu(cosine_cost(x, x), None)
    Ct = _threshold_relu(cosine_cost(y, y), None)
    p = jnp.full((b, n, 1), 1.0 / n, jnp.float32)
    cs2p = jnp.einsum("bnk,bko->bno", Cs ** 2, p)
    qtct2 = jnp.einsum("bko,bmk->bom", p, Ct ** 2)
    Cst = cs2p + qtct2
    gamma0 = jnp.full((b, n, n), 1.0 / (n * n), jnp.float32)

    def body(_, gamma):
        Cg = Cst - 2.0 * jnp.einsum(
            "bnk,bkl,bml->bnm", Cs, gamma, Ct,
            precision=jax.lax.Precision.HIGHEST)
        return _plan(Cg, 0.1, 20)

    ref = jax.lax.fori_loop(0, 5, body, gamma0)
    got = gw_gamma_fused(Cs, Ct, Cst, 0.1, 5, 20, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-7)
