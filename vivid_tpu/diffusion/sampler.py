"""Deterministic/stochastic 2nd-order Heun EDM sampler with autoguidance.

Parity surface: generate_images.py:43-118. TPU-native shape: the whole
sampling loop is a single `lax.scan` over the sigma schedule (the reference's
"prime target for a single jitted lax.scan", SURVEY.md §3.2) — one compiled
program per (model, shape), 2N-1 denoiser evaluations:
N-1 scanned Heun steps + one final Euler step.

Autoguidance: D = ref + guidance * (D - ref) with `ref` from the weaker /
unconditional net (generate_images.py:58-62). Guidance is a traced scalar, so
changing it does not recompile.

The reference's dual-source even/odd interleave disappears here: x is [B,...]
throughout (the interleaved rows were kept bit-identical by construction,
generate_images.py:96-111).
"""

import math
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vivid_tpu.nn.precond import precond_apply


def sigma_schedule(num_steps=32, sigma_min=0.002, sigma_max=80.0, rho=7.0):
    """EDM rho-schedule + terminal zero (generate_images.py:68-70). Static."""
    i = np.arange(num_steps, dtype=np.float64)
    t = (sigma_max ** (1 / rho)
         + i / (num_steps - 1) * (sigma_min ** (1 / rho) - sigma_max ** (1 / rho))) ** rho
    return np.concatenate([t, [0.0]]).astype(np.float32)


def edm_sampler(denoise: Callable, noise: jax.Array,
                gnet_denoise: Optional[Callable] = None,
                num_steps: int = 32, sigma_min: float = 0.002,
                sigma_max: float = 80.0, rho: float = 7.0, guidance=1.0,
                S_churn: float = 0.0, S_min: float = 0.0,
                S_max: float = float("inf"), S_noise: float = 1.0,
                rng: Optional[jax.Array] = None,
                seeds: Optional[jax.Array] = None) -> jax.Array:
    """denoise(x, t[B]) -> D_x. noise: [B, H, W, C] ~ N(0,1).

    Fully traceable: wrap in jit at the call site (the CLI does). Guidance may
    be a traced scalar; use gnet_denoise=None for no guidance.

    `seeds` ([B] ints) gives every sample its own churn-noise stream, so
    S_churn>0 results for sample i depend only on seeds[i] — invariant to
    batch composition, the StackedRandomGenerator contract
    (generate_images.py:78-84,120-134). Without seeds, per-sample streams
    are split from `rng` (deterministic, but batch-position-dependent).
    """
    t_steps = sigma_schedule(num_steps, sigma_min, sigma_max, rho)
    b = noise.shape[0]

    def guided(x, t):
        d = denoise(x, jnp.full((b,), t, jnp.float32))
        if gnet_denoise is None:
            return d
        ref = gnet_denoise(x, jnp.full((b,), t, jnp.float32))
        return ref + guidance * (d - ref)

    churn_gamma = min(S_churn / num_steps, math.sqrt(2.0) - 1.0) if S_churn > 0 else 0.0
    base_rng = rng if rng is not None else jax.random.PRNGKey(0)
    if churn_gamma > 0:
        if seeds is not None:
            from vivid_tpu.core.rngs import per_seed_keys
            sample_keys = per_seed_keys(seeds)          # [B] keys, one/sample
        else:
            sample_keys = jax.random.split(base_rng, b)

    # The 2N-1 denoiser evaluations are scanned as *half-steps* with exactly
    # ONE guided-denoise call in the body (selects steer the Euler vs Heun
    # phase). This keeps a single copy of the model(s) in the compiled
    # program — the naive two-calls-per-step body made XLA compile ~6 model
    # instances and blew up compile time. Numerics are identical.
    phases, t_as, t_bs, idxs = [], [], [], []
    for i in range(num_steps - 1):
        for phase in (0, 1):
            phases.append(phase)
            t_as.append(t_steps[i])
            t_bs.append(t_steps[i + 1])
            idxs.append(i)
    phases.append(0)                       # final Euler step to sigma = 0
    t_as.append(t_steps[num_steps - 1])
    t_bs.append(0.0)
    idxs.append(num_steps - 1)
    scan_in = (jnp.asarray(phases), jnp.asarray(t_as, jnp.float32),
               jnp.asarray(t_bs, jnp.float32), jnp.asarray(idxs))

    def half_step(state, inputs):
        x, x_hat, d_cur, t_hat = state
        phase, t_a, t_b, idx = inputs
        is_euler = (phase == 0)

        # Churn (applies at the start of each full step, phase 0 only).
        if churn_gamma > 0:
            use_churn = (t_a >= S_min) & (t_a <= S_max) & is_euler
            gamma = jnp.where(use_churn, churn_gamma, 0.0)
            t_hat_new = t_a + gamma * t_a
            # One stream per sample: fold the step index into each sample's
            # key so eps[i] is a function of (seeds[i], step) only.
            eps = jax.vmap(
                lambda k: jax.random.normal(
                    jax.random.fold_in(k, idx.astype(jnp.uint32)),
                    x.shape[1:], x.dtype))(sample_keys)
            x_hat_new = jnp.where(
                is_euler,
                x + jnp.sqrt(jnp.maximum(t_hat_new ** 2 - t_a ** 2, 0.0))
                * S_noise * eps,
                x)
        else:
            t_hat_new = t_a
            x_hat_new = x

        x_in = jnp.where(is_euler, x_hat_new, x)
        t_in = jnp.where(is_euler, t_hat_new, t_b)
        d = (x_in - guided(x_in, t_in)) / t_in

        # Euler phase: provisional x at t_b; remember (x_hat, d_cur, t_hat).
        x_euler = x_hat_new + (t_b - t_hat_new) * d
        # Heun phase: combine with the stored Euler slope.
        x_heun = x_hat + (t_b - t_hat) * (0.5 * d_cur + 0.5 * d)

        new_x = jnp.where(is_euler, x_euler, x_heun)
        new_x_hat = jnp.where(is_euler, x_hat_new, x_hat)
        new_d_cur = jnp.where(is_euler, d, d_cur)
        new_t_hat = jnp.where(is_euler, t_hat_new, t_hat)
        return (new_x, new_x_hat, new_d_cur, new_t_hat), None

    x0 = noise.astype(jnp.float32) * float(t_steps[0])
    init = (x0, x0, jnp.zeros_like(x0), jnp.asarray(t_steps[0], jnp.float32))
    (x, _, _, _), _ = jax.lax.scan(half_step, init, scan_in)
    return x


def make_denoiser(params, cfg, src=None, geometry=None, conditioning_image=None,
                  rng=None, precompute_features: Optional[bool] = None):
    """Bind an NVPrecond (params, cfg) + conditioning into a `denoise(x, t)`
    closure for edm_sampler. When the model was trained with `no_time_enc`,
    encoder features are computed ONCE here and injected into every sampler
    step (reference inject_features path, generate_images.py:52-53 /
    models.py:664-667) — under jit this hoists ~half the FLOPs out of the
    denoising loop."""
    features = None
    if precompute_features is None:
        precompute_features = cfg.no_time_enc and not cfg.uncond
    if precompute_features:
        b = src.shape[0]
        features = precond_apply(params, cfg, src, jnp.zeros(src.shape[:1] + src.shape[2:]),
                                 jnp.ones((b,)), geometry, return_features=True)

    def denoise(x, t):
        return precond_apply(params, cfg, src, x, t, geometry,
                             conditioning_image=conditioning_image,
                             inject_features=features, rng=rng)

    return denoise
