"""JAX-native FD-DINOv2 detector.

The reference computes FD-DINOv2 features with torch-hub dinov2_vitl14
(calculate_metrics.py:56-84): bicubic-224 antialiased resize, /255, ImageNet
normalize, forward, take the final-norm class token (1024-d). Here the ViT
runs on the accelerator via the shared functional DINOv2 backbone
(vivid_tpu.nn.dinov2, HF-parity-tested); preprocessing stays on torch CPU for
bit-parity with the reference's resize kernel (torch bicubic a=-0.75 differs
from jax.image's Keys cubic).

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


def make_feature_fn(params, cfg):
    fn = jax.jit(lambda p, x: vit_forward(p, cfg, x)[0])  # cls token

    def features(images_uint8):
        x = preprocess_torch(images_uint8)
        return np.asarray(fn(params, x), np.float32)

    return features
