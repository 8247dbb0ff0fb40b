"""EDM2 training losses with learned-uncertainty weighting.

Parity surface: NVLoss / SRNVLoss (training_loop.py:47-99) and the trainer's
dual-source loss inlining (training_loop.py:538-564). Dual-source pairing is
explicit here: sigma and noise are drawn once per *pair* (the reference's
repeat_interleave(2) simply duplicated them onto interleaved rows).

Loss (learned variance): clamp(logvar, ±20);
    weight * exp(-logvar) * (D - tgt)^2 + logvar,
weight = (sigma^2 + sd^2) / (sigma * sd)^2. `plain_mse` bypass returns the
weighted MSE mean (PLAIN_MSE global made a proper option).

The trainer-side mean±3*std loss clamp (training_loop.py:558-564) is provided
as `clamp_loss` (stop-gradient statistics, same semantics as the reference's
.item() detach).
"""

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from vivid_tpu.nn.precond import precond_apply


def down_up_resize(x, factor: int = 4):
    """Low-res SR conditioning ([B, H, W, C]): torchvision-bilinear down by
    `factor`, torchvision-bilinear back up — the exact resize chain the
    reference trains with (training_loop.py:89-93; torchvision resize
    defaults to bilinear, antialias=True on current releases, and antialias
    is a no-op on the upscale leg either way). Implemented as precomputed
    separable weight-matrix matmuls (metrics/resize_jax.py, PIL-parity
    tested) so the conditioning distribution matches a reference-trained
    SR checkpoint's."""
    b, h, w, c = x.shape
    from vivid_tpu.metrics.resize_jax import resize_bilinear_aa
    low = resize_bilinear_aa(x, h // factor, w // factor)
    return resize_bilinear_aa(low, h, w)


def clamp_loss(loss):
    """Clamp elementwise loss to mean ± 3 std (statistics detached)."""
    m = jax.lax.stop_gradient(jnp.mean(loss))
    s = jax.lax.stop_gradient(jnp.std(loss))
    return jnp.clip(loss, m - 3 * s, m + 3 * s)


@dataclass(frozen=True)
class NVLoss:
    P_mean: float = -0.4
    P_std: float = 1.0
    sigma_data: float = 0.5
    plain_mse: bool = False
    logvar_clamp: float = 20.0

    def sample_sigma(self, rng, batch):
        rnd = jax.random.normal(rng, (batch, 1, 1, 1))
        return jnp.exp(rnd * self.P_std + self.P_mean)

    def __call__(self, params, cfg, rng, src, tgt, geometry, train=True):
        """src: [B, n_src, H, W, Cs]; tgt: [B, H, W, C]; geometry: [B, n_src, 20].
        Returns elementwise loss [B, H, W, C] (or scalar for plain_mse)."""
        k_sigma, k_noise, k_net = jax.random.split(rng, 3)
        b = tgt.shape[0]
        sigma = self.sample_sigma(k_sigma, b)
        weight = (sigma ** 2 + self.sigma_data ** 2) / (sigma * self.sigma_data) ** 2
        noise = jax.random.normal(k_noise, tgt.shape, tgt.dtype) * sigma
        noisy = tgt + noise

        if self.plain_mse:
            denoised = precond_apply(params, cfg, src, noisy, sigma.reshape(b),
                                     geometry, train=train, rng=k_net)
            return jnp.mean(weight * (denoised - tgt) ** 2)

        denoised, logvar = precond_apply(params, cfg, src, noisy, sigma.reshape(b),
                                         geometry, return_logvar=True,
                                         train=train, rng=k_net)
        logvar = jnp.clip(logvar, -self.logvar_clamp, self.logvar_clamp)
        return weight * jnp.exp(-logvar) * (denoised - tgt) ** 2 + logvar


@dataclass(frozen=True)
class SRNVLoss(NVLoss):
    """Super-resolution variant: conditions the net on a 4x down/up-resized
    target (training_loop.py:77-99)."""

    def __call__(self, params, cfg, rng, src, tgt, geometry, train=True):
        k_sigma, k_noise, k_net = jax.random.split(rng, 3)
        b = tgt.shape[0]
        sigma = self.sample_sigma(k_sigma, b)
        weight = (sigma ** 2 + self.sigma_data ** 2) / (sigma * self.sigma_data) ** 2
        noise = jax.random.normal(k_noise, tgt.shape, tgt.dtype) * sigma
        low_res = down_up_resize(tgt, 4)
        denoised, logvar = precond_apply(params, cfg, src, tgt + noise,
                                         sigma.reshape(b), geometry,
                                         conditioning_image=low_res,
                                         return_logvar=True, train=train, rng=k_net)
        logvar = jnp.clip(logvar, -self.logvar_clamp, self.logvar_clamp)
        return weight * jnp.exp(-logvar) * (denoised - tgt) ** 2 + logvar
