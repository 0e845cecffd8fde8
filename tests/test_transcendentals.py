"""Pin the fast transcendental forms used by the fused kernels.

The bf16 train/encode paths use erf(x) ~= tanh(x*P(x^2)) and
sigmoid(z) = 0.5*(1+tanh(z/2)) (encode_fused.py; measured ~2x cheaper on the
v5e VPU, scripts/bench_vpu_ops.py). These tests pin the numerical claims the
kernels rely on: |erf err| well below bf16 resolution, exact odd symmetry,
correct tail saturation, and the sigmoid identity being exact to f32
rounding. The f32 kernel paths keep the A&S erf — also pinned here.
"""

import math

import numpy as np

import jax.numpy as jnp

from madeleine_tpu.ops.encode_fused import (
    _erf,
    _erf_auto,
    _erf_tanh,
    _gelu_grad_tanh,
    _sigmoid_tanh,
)


def test_erf_tanh_accuracy():
    x = np.linspace(-9.0, 9.0, 200001).astype(np.float32)
    ref = np.array([math.erf(float(v)) for v in x])
    got = np.asarray(_erf_tanh(jnp.asarray(x)))
    # bf16 resolution near |erf|~1 is 2^-8 ~ 3.9e-3; the fit is ~500x below
    assert np.abs(got - ref).max() < 8e-6


def test_erf_tanh_symmetry_and_tails():
    x = jnp.asarray([0.0, 1e4, -1e4, 50.0, -50.0], jnp.float32)
    got = np.asarray(_erf_tanh(x))
    np.testing.assert_allclose(got, [0.0, 1.0, -1.0, 1.0, -1.0], atol=1e-7)
    xs = jnp.asarray(np.linspace(0.01, 4, 100), jnp.float32)
    np.testing.assert_allclose(np.asarray(_erf_tanh(xs)),
                               -np.asarray(_erf_tanh(-xs)), atol=0)


def test_erf_as_accuracy():
    x = np.linspace(-6.0, 6.0, 50001).astype(np.float32)
    ref = np.array([math.erf(float(v)) for v in x])
    got = np.asarray(_erf(jnp.asarray(x)))
    # 1.5e-7 in exact arithmetic; f32 evaluation rounds to ~2.5e-6
    assert np.abs(got - ref).max() < 5e-6


def test_erf_auto_routes_by_flag():
    x = jnp.asarray(np.linspace(-3, 3, 101), jnp.float32)
    np.testing.assert_array_equal(np.asarray(_erf_auto(x, False)),
                                  np.asarray(_erf(x)))
    np.testing.assert_array_equal(np.asarray(_erf_auto(x, True)),
                                  np.asarray(_erf_tanh(x)))


def test_gelu_grad_tanh_is_true_derivative_of_tanh_gelu():
    """_gelu_grad_tanh must be the derivative of the tanh-form forward
    actually computed (v * 0.5*(1+_erf_tanh(v/sqrt(2)))) — checked against a
    float64 central difference of that exact forward."""
    v = np.linspace(-8.0, 8.0, 4001).astype(np.float64)
    eps = 1e-5

    def fwd(x):
        x = np.asarray(x, np.float64)
        c = np.asarray(list(reversed((1.12836141, 1.02912513e-1,
                                      -4.67876657e-4, -4.28175433e-4,
                                      3.39589343e-5))))
        xs = x * (2.0 ** -0.5)
        p = np.polyval(c, xs * xs)
        return x * 0.5 * (1.0 + np.tanh(xs * p))

    fd = (fwd(v + eps) - fwd(v - eps)) / (2 * eps)
    Phi = 0.5 * (1.0 + np.asarray(
        _erf_tanh(jnp.asarray(v * (2.0 ** -0.5), jnp.float32)), np.float64))
    got = np.asarray(_gelu_grad_tanh(jnp.asarray(v, jnp.float32),
                                     jnp.asarray(Phi, jnp.float32)))
    assert np.abs(got - fd).max() < 2e-5


def test_gelu_grad_tanh_vs_exact_gelu_grad():
    """Absolute error vs the EXACT gelu' (f64 erf/phi) — the bound the bf16
    training path relies on (bf16 resolution near 1 is ~2^-8 = 3.9e-3)."""
    v = np.linspace(-10.0, 10.0, 40001).astype(np.float64)
    phi = np.exp(-0.5 * v * v) / math.sqrt(2 * math.pi)
    exact = np.array([0.5 * (1 + math.erf(x * 2 ** -0.5)) for x in v]) + v * phi
    Phi = 0.5 * (1.0 + np.asarray(
        _erf_tanh(jnp.asarray(v * (2.0 ** -0.5), jnp.float32)), np.float64))
    got = np.asarray(_gelu_grad_tanh(jnp.asarray(v, jnp.float32),
                                     jnp.asarray(Phi, jnp.float32)))
    assert np.abs(got - exact).max() < 1e-4


def test_gelu_grad_tanh_tails_saturate():
    """Large |v|: tanh saturates to +-1 in f32, so (1 - T^2) must hit exactly
    0 before the Q polynomial grows — no overflow, gelu' -> {0, 1}."""
    v = jnp.asarray([40.0, 100.0, 1e4, -40.0, -100.0, -1e4], jnp.float32)
    Phi = 0.5 * (1.0 + _erf_tanh(v * (2.0 ** -0.5)))
    got = np.asarray(_gelu_grad_tanh(v, Phi))
    assert np.all(np.isfinite(got))
    np.testing.assert_allclose(got, [1, 1, 1, 0, 0, 0], atol=1e-6)


def test_sigmoid_tanh_identity():
    z = jnp.asarray(np.linspace(-30, 30, 60001), jnp.float32)
    ref = 1.0 / (1.0 + np.exp(-np.asarray(z, np.float64)))
    got = np.asarray(_sigmoid_tanh(z))
    # exact identity -> only f32 rounding differences
    assert np.abs(got - ref).max() < 3e-7
