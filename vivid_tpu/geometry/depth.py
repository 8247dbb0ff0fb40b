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
    """None/callable passthrough; 'small'|'base'|'large' builds the JAX-native
    DepthAnythingV2 (geometry/depth_anything.py) from the same metric-hypersim
    checkpoint files the reference loads (training/utils.py:232-243), found in
    $VIVID_DEPTH_DIR (default '.'). Weights stay an external artifact
    (reference README.md:20-23) — only their absence errors, with the path."""
    if depth_model is None or callable(depth_model):
        return depth_model
    if isinstance(depth_model, str):
        import os
        from vivid_tpu.geometry.depth_anything import (ENCODER_NAMES,
                                                       load_depth_anything)
        if depth_model not in ENCODER_NAMES:
            raise ValueError(f"Unknown depth model {depth_model!r}; expected "
                             f"one of {sorted(ENCODER_NAMES)} or a callable")
        fname = (f"depth_anything_v2_metric_hypersim_"
                 f"{ENCODER_NAMES[depth_model]}.pth")
        d = weights_dir or os.environ.get("VIVID_DEPTH_DIR", ".")
        path = os.path.join(d, fname)
        if not os.path.exists(path):
            raise FileNotFoundError(
                f"DepthAnythingV2 weights not found at {path}. Download "
                f"{fname} (Depth-Anything-V2 metric hypersim release) into "
                "$VIVID_DEPTH_DIR, or pass a callable depth model.")
        return load_depth_anything(depth_model, path)
    return depth_model
