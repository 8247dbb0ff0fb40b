"""Exactness of the zero-feature attention sink (uncond fast path)."""

import jax
import jax.numpy as jnp
import numpy as np

from vivid_tpu.nn.blocks import attention_with_zero_sink
from vivid_tpu.kernels.attention import reference_attention
from vivid_tpu.nn.precond import PrecondConfig, precond_apply, precond_init, zero_features

TINY = dict(model_channels=16, channel_mult=(1, 2), num_blocks=1,
            attn_resolutions=(8,), channels_per_head=8, use_bf16=False,
            remat=False)


def test_sink_equals_materialized_zero_columns():
    B, S, H, D, NZ = 2, 16, 2, 8, 32
    # [B, H, S, D] — the kernel's native layout.
    q = jax.random.normal(jax.random.PRNGKey(0), (B, H, S, D))
    k = jax.random.normal(jax.random.PRNGKey(1), (B, H, S, D))
    v = jax.random.normal(jax.random.PRNGKey(2), (B, H, S, D))
    kz = jnp.concatenate([k, jnp.zeros((B, H, NZ, D))], axis=2)
    vz = jnp.concatenate([v, jnp.zeros((B, H, NZ, D))], axis=2)
    want = reference_attention(q, kz, vz)
    got = attention_with_zero_sink(q, k, v, NZ)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_uncond_fast_path_equals_injected_zeros():
    cfg = PrecondConfig(img_resolution=16, num_sources=2, uncond=True, **TINY)
    params = precond_init(jax.random.PRNGKey(0), cfg)
    dst = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
    sigma = jnp.exp(jax.random.normal(jax.random.PRNGKey(2), (2,)))
    fast = precond_apply(params, cfg, None, dst, sigma, None)
    slow = precond_apply(params, cfg, None, dst, sigma, None,
                         inject_features=zero_features(cfg, 2, jnp.float32))
    np.testing.assert_allclose(np.asarray(fast), np.asarray(slow),
                               rtol=1e-5, atol=1e-6)
