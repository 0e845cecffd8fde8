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


def test_sigmoid_tanh_identity():
    z = jnp.asarray(np.linspace(-30, 30, 60001), jnp.float32)
    ref = 1.0 / (1.0 + np.exp(-np.asarray(z, np.float64)))
    got = np.asarray(_sigmoid_tanh(z))
    # exact identity -> only f32 rounding differences
    assert np.abs(got - ref).max() < 3e-7
