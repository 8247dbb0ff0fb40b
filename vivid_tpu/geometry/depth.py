"""Depth-model conditioning utilities.

Parity surface: training/utils.py:107-139, 232-243 — DepthAnythingV2 input
prep (518px bicubic + ImageNet normalize), inference + bilinear resize, and
channel-append with optional inverse-depth normalization.

The depth network itself is an *external* dependency in the reference too
(README.md:20-23: clone Depth-Anything-V2 + download weights). Here any
callable `depth_model: [B,H,W,3] float -> [B,h,w]` works; `resolve_depth_model`
raises a clear error for the named sizes unless weights are present.
"""

from typing import Callable, Optional

import jax.numpy as jnp
import jax

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def depth_prepare(x, size: int = 518):
    """[B,H,W,3] in [0,255] -> bicubic `size`-square, ImageNet-normalized."""
    x = jnp.asarray(x, jnp.float32) / 255.0
    x = jax.image.resize(x, (x.shape[0], size, size, x.shape[-1]), method="cubic")
    mean = jnp.asarray(IMAGENET_MEAN).reshape(1, 1, 1, 3)
    std = jnp.asarray(IMAGENET_STD).reshape(1, 1, 1, 3)
    return (x - mean) / std


def get_depth(depth_model: Callable, image, shape=None):
    """Run the depth model and bilinearly resize to `shape` (H, W).
    Returns [B, H, W, 1] float32."""
    shape = shape or image.shape[1:3]
    depth = jnp.asarray(depth_model(depth_prepare(image)), jnp.float32)
    if depth.ndim == 3:
        depth = depth[..., None]
    return jax.image.resize(depth, (depth.shape[0],) + tuple(shape) + (1,),
                            method="bilinear")


def add_depth(depth_model: Callable, image, src, inv_norm: bool = False):
    """Append predicted depth as an extra channel of `src` [B,H,W,C].
    inv_norm applies the reference's inverse-depth normalization
    ((1/d)/max, then standardize with the recorded constants 0.4947/0.2294)."""
    depth = get_depth(depth_model, image, src.shape[1:3])
    if inv_norm:
        depth = 1.0 / depth
        depth = depth / jnp.max(depth, axis=(1, 2, 3), keepdims=True)
        depth = (depth - 0.4947) / 0.2294
    return jnp.concatenate([src, depth.astype(src.dtype)], axis=-1)


def resolve_depth_model(depth_model, weights_dir: Optional[str] = None):
    """None/callable passthrough; named sizes require external weights
    (the reference loads depth_anything_v2_metric_hypersim_{vits,vitb,vitl}.pth)."""
    if depth_model is None or callable(depth_model):
        return depth_model
    if isinstance(depth_model, str):
        raise NotImplementedError(
            f"Depth model {depth_model!r}: DepthAnythingV2 is an external "
            "dependency (reference README.md:20-23). Provide a callable "
            "depth_model([B,H,W,3])->[B,h,w] instead, or omit depth "
            "conditioning.")
    return depth_model
