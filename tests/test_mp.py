"""Unit tests for magnitude-preserving primitives (reference models.py:37-126)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vivid_tpu.nn import mp


def test_normalize_unit_rms():
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 256)) * 3.7
    y = mp.normalize(x)
    rms = jnp.sqrt(jnp.mean(jnp.square(y), axis=1))
    np.testing.assert_allclose(rms, np.ones(4), rtol=1e-3)


def test_normalize_formula():
    # normalize(x) = x / (eps + ||x|| / sqrt(N)): ones(4) -> 1/(1e-4 + 2*0.5).
    x = jnp.zeros((2, 64))
    assert jnp.all(mp.normalize(x) == 0)
    x = jnp.ones((1, 4))
    y = mp.normalize(x, eps=1e-4)
    expected = 1.0 / (1e-4 + math.sqrt(1 / 4) * 2.0)
    np.testing.assert_allclose(y[0, 0], expected, rtol=1e-6)


def test_mp_silu_value():
    x = jnp.asarray([0.0, 1.0, -1.0])
    got = mp.mp_silu(x)
    sig = 1 / (1 + np.exp(-np.asarray(x)))
    np.testing.assert_allclose(got, np.asarray(x) * sig / 0.596, rtol=1e-6)


def test_mp_sum_matches_lerp_form():
    a = jax.random.normal(jax.random.PRNGKey(1), (128,))
    b = jax.random.normal(jax.random.PRNGKey(2), (128,))
    for t in [0.0, 0.3, 0.5, 1.0]:
        got = mp.mp_sum(a, b, t)
        want = (np.asarray(a) * (1 - t) + np.asarray(b) * t) / math.sqrt((1 - t) ** 2 + t ** 2)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_mp_sum_preserves_magnitude():
    key = jax.random.PRNGKey(3)
    a, b = jax.random.normal(key, (2, 100000))
    y = mp.mp_sum(a, b, t=0.3)
    assert abs(float(jnp.std(y)) - 1.0) < 0.02


def test_mp_cat_weights():
    a = jnp.ones((1, 4))
    b = jnp.ones((1, 12))
    y = mp.mp_cat(a, b, axis=-1, t=0.5)
    c = math.sqrt((4 + 12) / 0.5)
    np.testing.assert_allclose(y[0, :4], np.full(4, c / math.sqrt(4) * 0.5), rtol=1e-6)
    np.testing.assert_allclose(y[0, 4:], np.full(12, c / math.sqrt(12) * 0.5), rtol=1e-6)


def test_mp_cat_preserves_magnitude():
    key = jax.random.PRNGKey(4)
    a = jax.random.normal(key, (1, 64, 64, 32))
    b = jax.random.normal(jax.random.PRNGKey(5), (1, 64, 64, 96))
    y = mp.mp_cat(a, b, t=0.5)
    assert abs(float(jnp.std(y)) - 1.0) < 0.02


def test_resample_down_is_mean_pool():
    x = jnp.arange(16.0).reshape(1, 4, 4, 1)
    y = mp.resample(x, "down")
    assert y.shape == (1, 2, 2, 1)
    np.testing.assert_allclose(y[0, 0, 0, 0], (0 + 1 + 4 + 5) / 4)


def test_resample_up_is_nearest_repeat():
    x = jnp.asarray([[1.0, 2.0], [3.0, 4.0]]).reshape(1, 2, 2, 1)
    y = mp.resample(x, "up")
    assert y.shape == (1, 4, 4, 1)
    np.testing.assert_allclose(y[0, :2, :2, 0], np.ones((2, 2)))


def test_resample_round_trip_mean():
    x = jax.random.normal(jax.random.PRNGKey(6), (2, 8, 8, 3))
    y = mp.resample(mp.resample(x, "up"), "down")
    np.testing.assert_allclose(y, x, rtol=1e-5, atol=1e-6)


def test_mp_fourier_shape_and_magnitude():
    params = mp.mp_fourier_init(jax.random.PRNGKey(0), 128)
    x = jax.random.normal(jax.random.PRNGKey(1), (4096,))
    y = mp.mp_fourier_apply(params, x)
    assert y.shape == (4096, 128)
    assert abs(float(jnp.std(y)) - 1.0) < 0.05  # cos * sqrt(2) has unit variance


def test_mp_conv_linear_unit_gain():
    params = mp.mp_conv_init(jax.random.PRNGKey(0), 256, 128, ())
    x = jax.random.normal(jax.random.PRNGKey(1), (1024, 256))
    y = mp.mp_conv_apply(params, x)
    assert y.shape == (1024, 128)
    # Normalized weight rows have magnitude 1/sqrt(fan_in) -> unit output std.
    assert abs(float(jnp.std(y)) - 1.0) < 0.1


def test_mp_conv_gain_scales_output():
    params = mp.mp_conv_init(jax.random.PRNGKey(0), 16, 16, ())
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 16))
    y1 = mp.mp_conv_apply(params, x, gain=1.0)
    y2 = mp.mp_conv_apply(params, x, gain=2.0)
    np.testing.assert_allclose(y2, 2 * y1, rtol=1e-5)
    y0 = mp.mp_conv_apply(params, x, gain=0.0)
    assert jnp.all(y0 == 0)


def test_mp_conv_2d_same_shape():
    params = mp.mp_conv_init(jax.random.PRNGKey(0), 8, 16, (3, 3))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 8))
    y = mp.mp_conv_apply(params, x)
    assert y.shape == (2, 32, 32, 16)


def test_force_weight_normalize():
    params = {"a": {"w": jax.random.normal(jax.random.PRNGKey(0), (3, 3, 8, 16)) * 5},
              "gain": jnp.ones(())}
    out = mp.force_weight_normalize(params)
    norms = jnp.linalg.norm(out["a"]["w"].reshape(-1, 16), axis=0)
    np.testing.assert_allclose(norms, np.full(16, math.sqrt(72)), rtol=1e-3)
    assert out["gain"] == params["gain"]


def test_mp_conv_bf16_compute_fp32_weight_math():
    params = mp.mp_conv_init(jax.random.PRNGKey(0), 8, 8, ())
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 8), jnp.bfloat16)
    y = mp.mp_conv_apply(params, x)
    assert y.dtype == jnp.bfloat16
