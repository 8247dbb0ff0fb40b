"""Deterministic RNG utilities.

The reference reseeds torch/numpy every step by hashing (seed, rank, cur_nimg)
(torch_utils/misc.py:23-26, training_loop.py:508) and uses a per-seed
generator stack for sampling (generate_images.py:120-134) so noise is
independent of device order and batching. The JAX-native equivalents:

  * step_key(seed, nimg)    — folds the step counter into a base key.
  * seeded_normal(seeds, shape) — one independent stream per sample seed
    (StackedRandomGenerator analogue): noise[i] depends only on seeds[i].
"""

import jax
import jax.numpy as jnp


def base_key(seed: int) -> jax.Array:
    return jax.random.PRNGKey(seed)


def step_key(key: jax.Array, cur_nimg) -> jax.Array:
    return jax.random.fold_in(key, jnp.asarray(cur_nimg, jnp.uint32))


def per_seed_keys(seeds) -> jax.Array:
    seeds = jnp.asarray(seeds, jnp.uint32)
    return jax.vmap(lambda s: jax.random.fold_in(jax.random.PRNGKey(0), s))(seeds)


def seeded_normal(seeds, shape, dtype=jnp.float32) -> jax.Array:
    """noise[i] ~ N(0,1) of `shape`, a pure function of seeds[i] alone —
    invariant to batch composition and device order."""
    keys = per_seed_keys(seeds)
    return jax.vmap(lambda k: jax.random.normal(k, shape, dtype))(keys)


def split_like(key: jax.Array, n: int):
    return list(jax.random.split(key, n))
