"""Parity tests for the no-max big-S attention kernel (kernels/flash.py
flash_nomax) in Pallas interpret mode on CPU.

The kernel drops the online softmax max entirely: q/k are pixel-normalized
at every production call site (nn/blocks.py split_qkv), so scaled logits
are bounded by sqrt(D) and exp(s - sqrt(D)) cannot overflow — softmax with
a CONSTANT shift is exact. These tests pin that exactness against the
einsum reference, plus the custom_vjp wrapper's gradient fallback.
Chip-side parity at the real SR shapes lives in tests/test_tpu_kernels.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vivid_tpu.kernels.attention import reference_attention
from vivid_tpu.kernels.flash import flash_nomax
from vivid_tpu.nn.mp import normalize


def _mk(b, h, s, sk, d, seed=0):
    key = jax.random.PRNGKey(seed)
    q = normalize(jax.random.normal(key, (b, h, s, d), jnp.bfloat16), axis=-1)
    k = normalize(jax.random.normal(jax.random.fold_in(key, 1),
                                    (b, h, sk, d), jnp.bfloat16), axis=-1)
    v = jax.random.normal(jax.random.fold_in(key, 2), (b, h, sk, d),
                          jnp.bfloat16)
    return q, k, v


@pytest.mark.parametrize("shape,blocks,chains", [
    ((1, 2, 256, 512, 32), (128, 256), 2),
    ((1, 2, 256, 512, 32), (256, 512), 1),
    ((2, 1, 256, 256, 64), (128, 128), 1),
    ((1, 1, 384, 640, 32), (128, 128), 1),   # non-power-of-two S/Sk
])
def test_nomax_matches_reference(shape, blocks, chains):
    b, h, s, sk, d = shape
    q, k, v = _mk(b, h, s, sk, d)
    ref = reference_attention(q, k, v)
    out = flash_nomax(q, k, v, block_q=blocks[0], block_k=blocks[1],
                      chains=chains, interpret=True)
    assert out.dtype == v.dtype
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               atol=2e-3, rtol=2e-2)


def test_nomax_vjp_wrapper_grads(monkeypatch):
    """_flash_nomax_call: interpret-mode forward + composite backward must
    match reference_attention's gradients."""
    monkeypatch.setenv("VIVID_PALLAS_INTERPRET", "1")
    from vivid_tpu.kernels.attention import _flash_nomax_call
    q, k, v = _mk(1, 2, 256, 512, 32, seed=3)
    q32, k32, v32 = (t.astype(jnp.float32) for t in (q, k, v))

    def loss_ref(q_, k_, v_):
        return jnp.sum(jnp.square(reference_attention(q_, k_, v_)))

    def loss_nomax(q_, k_, v_):
        return jnp.sum(jnp.square(_flash_nomax_call(
            q_.astype(jnp.bfloat16), k_.astype(jnp.bfloat16),
            v_.astype(jnp.bfloat16)).astype(jnp.float32)))

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q32, k32, v32)
    g_new = jax.grad(loss_nomax, argnums=(0, 1, 2))(q32, k32, v32)
    for a, b_ in zip(g_new, g_ref):
        na = np.asarray(a, np.float32)
        nb = np.asarray(b_, np.float32)
        denom = np.abs(nb).max() + 1e-6
        assert np.abs(na - nb).max() / denom < 3e-2


@pytest.mark.parametrize("shape,blocks,chains", [
    ((1, 2, 256, 512, 32), (128, 256), 2),
    ((2, 1, 256, 256, 64), (128, 128), 1),
])
def test_nomax_biased_matches_reference(shape, blocks, chains):
    """Biased variant: dynamic shift = sqrt(D) + max(bias) through SMEM.
    Bias mimics the epipolar form (bounded sigmoid mixing + learned offset,
    geometry/epipolar.py get_epipolar_attn), including positive offsets that
    break the static sqrt(D) bound."""
    b, h, s, sk, d = shape
    q, k, v = _mk(b, h, s, sk, d, seed=7)
    key = jax.random.PRNGKey(11)
    bias = (3.0 * jax.nn.sigmoid(jax.random.normal(key, (b, h, s, sk)))
            + 2.5).astype(jnp.float32)
    ref = reference_attention(q, k, v, bias)
    out = flash_nomax(q, k, v, bias, block_q=blocks[0], block_k=blocks[1],
                      chains=chains, interpret=True)
    assert out.dtype == v.dtype
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               atol=2e-3, rtol=2e-2)


def test_nomax_biased_vjp_wrapper_grads(monkeypatch):
    """_flash_nomax_biased_call: interpret-mode forward + composite backward
    (incl. the bias cotangent) must match reference_attention's gradients."""
    monkeypatch.setenv("VIVID_PALLAS_INTERPRET", "1")
    from vivid_tpu.kernels.attention import _flash_nomax_biased_call
    q, k, v = _mk(1, 2, 256, 512, 32, seed=5)
    bias = 0.5 * jax.random.normal(jax.random.PRNGKey(9),
                                   (1, 2, 256, 512), jnp.float32)
    q32, k32, v32 = (t.astype(jnp.float32) for t in (q, k, v))

    def loss_ref(q_, k_, v_, b_):
        return jnp.sum(jnp.square(reference_attention(q_, k_, v_, b_)))

    def loss_nomax(q_, k_, v_, b_):
        return jnp.sum(jnp.square(_flash_nomax_biased_call(
            q_.astype(jnp.bfloat16), k_.astype(jnp.bfloat16),
            v_.astype(jnp.bfloat16), b_).astype(jnp.float32)))

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q32, k32, v32, bias)
    g_new = jax.grad(loss_nomax, argnums=(0, 1, 2, 3))(q32, k32, v32, bias)
    for a, b_ in zip(g_new, g_ref):
        na = np.asarray(a, np.float32)
        nb = np.asarray(b_, np.float32)
        denom = np.abs(nb).max() + 1e-6
        assert np.abs(na - nb).max() / denom < 3e-2


def test_nomax_requires_aligned_blocks():
    q, k, v = _mk(1, 1, 256, 512, 32)
    with pytest.raises(AssertionError):
        flash_nomax(q, k, v, block_q=192, block_k=512, interpret=True)
