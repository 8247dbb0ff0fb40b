"""JAX-native FD-DINOv2 detector.

The reference computes FD-DINOv2 features with torch-hub dinov2_vitl14
(calculate_metrics.py:56-84): bicubic-224 antialiased resize, /255, ImageNet
normalize, forward, take the final-norm class token (1024-d). Here the ViT
AND the preprocessing run on the accelerator: the antialiased bicubic resize
is a precomputed separable weight-matrix matmul with torch-exact semantics
(metrics/resize_jax.py, parity-tested vs F.interpolate to <6e-3 on the 0-255
scale), so a 1-core host never bottlenecks metric evaluation. The torch CPU
preprocess is kept as the parity oracle.

Weights: the torch-hub checkpoint file
`$VIVID_DETECTOR_DIR/torch_hub/checkpoints/dinov2_vitl14_pretrain.pth` is
loaded directly as a state dict (no hub code execution needed). The 37x37
positional grid is interpolated to 16x16 (224 px) once at load time with the
original bicubic interpolate_pos_encoding semantics.
"""

import os

import numpy as np
import jax

from vivid_tpu.nn.dinov2 import VIT_SIZES, params_from_state_dict, vit_forward

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)
INPUT_SIZE = 224
FEATURE_DIM = 1024


def find_checkpoint(weights_dir):
    for cand in (
        os.path.join(weights_dir, "torch_hub", "checkpoints",
                     "dinov2_vitl14_pretrain.pth"),
        os.path.join(weights_dir, "dinov2_vitl14_pretrain.pth"),
    ):
        if os.path.exists(cand):
            return cand
    return None


def load_dinov2_vitl14(path):
    """-> (params, cfg) ready for 224px inputs."""
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    cfg = VIT_SIZES["vitl"]
    params = params_from_state_dict(sd, cfg,
                                    pos_grid=INPUT_SIZE // cfg.patch_size)
    return params, cfg


def preprocess_torch(images_uint8):
    """uint8 NHWC -> fp32 NHWC 224px, ImageNet-normalized — torch CPU for
    exact parity with the reference's antialiased bicubic resize."""
    import torch
    import torch.nn.functional as F
    with torch.no_grad():
        t = torch.as_tensor(np.asarray(images_uint8, np.float32))
        t = t.permute(0, 3, 1, 2)
        if t.shape[-2:] != (INPUT_SIZE, INPUT_SIZE):
            t = F.interpolate(t, size=(INPUT_SIZE, INPUT_SIZE),
                              mode="bicubic", antialias=True)
        t = t / 255.0
        mean = torch.tensor(IMAGENET_MEAN).reshape(1, -1, 1, 1)
        std = torch.tensor(IMAGENET_STD).reshape(1, -1, 1, 1)
        return (t - mean).div_(std).permute(0, 2, 3, 1).contiguous().numpy()


def preprocess_jax(images):
    """fp32 NHWC (0-255 scale) -> fp32 NHWC 224px ImageNet-normalized,
    entirely on-device (jit-safe)."""
    import jax.numpy as jnp
    from vivid_tpu.metrics.resize_jax import resize_bicubic_aa
    x = resize_bicubic_aa(images.astype(jnp.float32), INPUT_SIZE, INPUT_SIZE)
    x = x / 255.0
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)
    return (x - mean) / std


def make_feature_fn(params, cfg):
    # One jitted program: resize + normalize + ViT — the host only ships the
    # raw uint8 batch.
    fn = jax.jit(lambda p, x: vit_forward(p, cfg, preprocess_jax(x))[0])

    def features(images_uint8):
        # Ship uint8 across the host->device link (1 byte/px, not 4);
        # preprocess_jax casts to fp32 on-device.
        x = np.ascontiguousarray(images_uint8)
        return np.asarray(fn(params, x), np.float32)

    return features
