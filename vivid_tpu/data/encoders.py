"""Pixel <-> latent codecs.

Parity surface: training/encoders.py — `StandardRGBEncoder` maps uint8 pixels
to roughly unit-variance latents (x/127.5 - 1) and back
((x*127.5 + 128).clip(0,255) -> uint8). Channel-last arrays.
"""

import jax.numpy as jnp

from vivid_tpu.core.registry import register


class Encoder:
    def init(self, device=None):
        pass

    def encode_latents(self, x):
        raise NotImplementedError

    def decode(self, x):
        raise NotImplementedError


@register("vivid_tpu.data.encoders.StandardRGBEncoder")
class StandardRGBEncoder(Encoder):
    def encode_latents(self, x):
        return jnp.asarray(x, jnp.float32) / 127.5 - 1.0

    def decode(self, x):
        x = jnp.asarray(x, jnp.float32) * 127.5 + 128.0
        return jnp.clip(x, 0, 255).astype(jnp.uint8)
