"""Torch/PIL-exact antialiased bicubic resize as an on-device matmul.

The reference's FD-DINOv2 preprocessing resizes with
`F.interpolate(mode="bicubic", antialias=True)` (calculate_metrics.py:56-84).
torch's antialiased path reproduces PIL's resampling: a separable filter
whose support scales with the downscale factor, edge-clamped taps, weights
normalized per output pixel. That is a LINEAR map per axis, so we precompute
the [out, in] weight matrix on the host (float64, like torch's accumulation
type) and apply the resize as two dense matmuls inside jit — MXU-friendly
and bit-faithful to the torch kernel (parity-tested in
tests/test_dinov2.py). Mirrors the tf1_resize_bilinear approach already used
for the Inception detector (metrics/inception_jax.py:212-234).
"""

from functools import lru_cache

import numpy as np
import jax.numpy as jnp

# torch's ANTIALIASED bicubic is PIL-compatible and uses a=-0.5 (PIL's
# bicubic coefficient), unlike torch's non-antialiased bicubic (a=-0.75) —
# verified against F.interpolate(..., antialias=True) basis responses.
_A = -0.5


def _cubic(x):
    x = np.abs(x)
    return np.where(
        x <= 1.0, ((_A + 2.0) * x - (_A + 3.0)) * x * x + 1.0,
        np.where(x < 2.0, (((x - 5.0) * x + 8.0) * x - 4.0) * _A, 0.0))


@lru_cache(maxsize=None)
def bicubic_aa_matrix(in_size: int, out_size: int) -> np.ndarray:
    """[out, in] float32 weight matrix of PIL/torch-aa bicubic resampling
    along one axis (support 2, a=-0.5 — see _A above, filter scaled by the
    downscale factor, edge-clamped, per-row normalized)."""
    scale = in_size / out_size
    filterscale = max(scale, 1.0)
    support = 2.0 * filterscale
    w = np.zeros((out_size, in_size), np.float64)
    for i in range(out_size):
        center = (i + 0.5) * scale
        xmin = max(int(center - support + 0.5), 0)
        xmax = min(int(center + support + 0.5), in_size)
        taps = np.arange(xmin, xmax, dtype=np.float64)
        ww = _cubic((taps - center + 0.5) / filterscale)
        w[i, xmin:xmax] = ww / ww.sum()
    return w.astype(np.float32)


def resize_bicubic_aa(x, out_h: int, out_w: int):
    """NHWC fp32 -> NHWC fp32 resized with torch's antialiased bicubic
    semantics. Jit-safe; the weight matrices are trace-time constants."""
    in_h, in_w = x.shape[1], x.shape[2]
    if (in_h, in_w) == (out_h, out_w):
        return x
    wh = jnp.asarray(bicubic_aa_matrix(in_h, out_h))
    ww = jnp.asarray(bicubic_aa_matrix(in_w, out_w))
    x = jnp.einsum("oh,bhwc->bowc", wh, x)
    return jnp.einsum("pw,bhwc->bhpc", ww, x)


def _triangle(x):
    x = np.abs(x)
    return np.where(x < 1.0, 1.0 - x, 0.0)


@lru_cache(maxsize=None)
def bilinear_aa_matrix(in_size: int, out_size: int) -> np.ndarray:
    """[out, in] float32 weight matrix of PIL/torch-aa BILINEAR resampling
    along one axis: triangle filter, support 1 scaled by the downscale
    factor, edge-clamped taps, per-row normalized. For upscales the filter
    scale is 1, so this degenerates to classic bilinear interpolation —
    matching torch, where antialias only changes downscales."""
    scale = in_size / out_size
    filterscale = max(scale, 1.0)
    support = 1.0 * filterscale
    w = np.zeros((out_size, in_size), np.float64)
    for i in range(out_size):
        center = (i + 0.5) * scale
        xmin = max(int(center - support + 0.5), 0)
        xmax = min(int(center + support + 0.5), in_size)
        taps = np.arange(xmin, xmax, dtype=np.float64)
        ww = _triangle((taps - center + 0.5) / filterscale)
        w[i, xmin:xmax] = ww / ww.sum()
    return w.astype(np.float32)


def resize_bilinear_aa(x, out_h: int, out_w: int):
    """NHWC resized with torchvision's antialiased bilinear semantics
    (the reference's training_loop.py:89-93 SR conditioning resize).
    Jit-safe; weight matrices are trace-time constants."""
    in_h, in_w = x.shape[1], x.shape[2]
    if (in_h, in_w) == (out_h, out_w):
        return x
    wh = jnp.asarray(bilinear_aa_matrix(in_h, out_h), x.dtype)
    ww = jnp.asarray(bilinear_aa_matrix(in_w, out_w), x.dtype)
    x = jnp.einsum("oh,bhwc->bowc", wh, x)
    return jnp.einsum("pw,bhwc->bhpc", ww, x)
