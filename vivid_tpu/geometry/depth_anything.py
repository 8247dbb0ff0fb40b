"""JAX-native DepthAnythingV2 (metric): DINOv2 ViT backbone + DPT head.

The reference conditions on depth from the external Depth-Anything-V2 repo
(training/utils.py:232-243 builds DepthAnythingV2(encoder=vits|vitb|vitl) and
loads depth_anything_v2_metric_hypersim_{vits,vitb,vitl}.pth). Here the same
network runs natively on the TPU: a functional ViT + DPT in jnp, weights
imported from the original .pth state dict by name.

Numerics are validated against the HuggingFace `DepthAnythingForDepthEstimation`
implementation with shared random weights (tests/test_depth_anything.py) —
covering the ViT block math, the reassemble/fusion necks (align_corners=True
bilinear, pre-act residual units, transposed-conv resizes) and the metric
sigmoid*max_depth head.

Input contract: [B, H, W, 3] ImageNet-normalized (depth_prepare output),
H = W = multiple of 14 (the pipeline uses 518). Output: [B, H, W] metric
depth.
"""

from dataclasses import dataclass
from typing import Dict, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from vivid_tpu.nn.dinov2 import (ViTConfig, expected_vit_shapes,
                                 params_from_state_dict as vit_params,
                                 vit_forward)


@dataclass(frozen=True)
class DAV2Config:
    embed_dim: int
    depth: int
    num_heads: int
    layer_idx: Tuple[int, ...]      # blocks whose outputs feed the DPT head
    features: int                   # fusion width
    out_channels: Tuple[int, ...]   # reassemble widths (shallow -> deep)
    patch_size: int = 14
    max_depth: float = 20.0         # metric-hypersim checkpoints


SIZES: Dict[str, DAV2Config] = {
    "small": DAV2Config(384, 12, 6, (2, 5, 8, 11), 64, (48, 96, 192, 384)),
    "base": DAV2Config(768, 12, 12, (2, 5, 8, 11), 128, (96, 192, 384, 768)),
    "large": DAV2Config(1024, 24, 16, (4, 11, 17, 23), 256,
                        (256, 512, 1024, 1024)),
}
ENCODER_NAMES = {"small": "vits", "base": "vitb", "large": "vitl"}


# ---------------------------------------------------------------------------
# Primitives.

def _conv(p, x, stride=1, padding="SAME"):
    y = jax.lax.conv_general_dilated(
        x, p["w"], (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + p["b"] if "b" in p else y


def _conv_transpose_exact(p, x, k):
    """Torch ConvTranspose2d with kernel == stride (the DPT resize layers):
    out[b, i*k+di, j*k+dj, o] = sum_c x[b,i,j,c] W[c,o,di,dj] + bias.
    Weight stored in torch layout [Cin, Cout, k, k]."""
    b, h, w, _ = x.shape
    o = p["w"].shape[1]
    y = jnp.einsum("bijc,coyx->biyjxo", x, p["w"])
    return y.reshape(b, h * k, w * k, o) + p["b"]


def resize_bilinear_ac(x, out_hw):
    """Bilinear resize with align_corners=True (torch F.interpolate semantics
    used throughout the DPT head; jax.image.resize only does half-pixel)."""
    h, w = x.shape[1:3]
    oh, ow = out_hw
    ys = jnp.linspace(0.0, h - 1.0, oh) if oh > 1 else jnp.zeros((1,))
    xs = jnp.linspace(0.0, w - 1.0, ow) if ow > 1 else jnp.zeros((1,))
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, h - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, w - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    wy = (ys - y0).astype(x.dtype)[None, :, None, None]
    wx = (xs - x0).astype(x.dtype)[None, None, :, None]
    rows = x[:, y0] * (1 - wy) + x[:, y1] * wy
    return rows[:, :, x0] * (1 - wx) + rows[:, :, x1] * wx


# ---------------------------------------------------------------------------
# DPT head (the ViT backbone lives in vivid_tpu.nn.dinov2).

def _vit_cfg(cfg: DAV2Config) -> ViTConfig:
    return ViTConfig(embed_dim=cfg.embed_dim, depth=cfg.depth,
                     num_heads=cfg.num_heads, patch_size=cfg.patch_size)

def _residual_unit(p, x):
    h = _conv(p["conv1"], jax.nn.relu(x))
    h = _conv(p["conv2"], jax.nn.relu(h))
    return h + x


def dav2_apply(params, cfg: DAV2Config, x):
    """[B, H, W, 3] normalized -> [B, H, W] metric depth."""
    feats, (ph, pw) = vit_forward(params, _vit_cfg(cfg), x,
                                  out_indices=cfg.layer_idx)

    # Reassemble: tokens -> spatial maps at 4 scales (4x, 2x, 1x, 0.5x).
    maps = []
    for i, f in enumerate(feats):
        m = f.reshape(f.shape[0], ph, pw, cfg.embed_dim)
        m = _conv(params["projects"][i], m)
        if i == 0:
            m = _conv_transpose_exact(params["resize0"], m, 4)
        elif i == 1:
            m = _conv_transpose_exact(params["resize1"], m, 2)
        elif i == 3:
            m = _conv(params["resize3"], m, stride=2, padding=((1, 1), (1, 1)))
        maps.append(_conv(params["layer_rn"][i], m))

    # Fusion: deepest first; each step fuses the next-shallower map and
    # upsamples to its size (align_corners=True), final step scales 2x.
    fused = None
    for j, m in enumerate(reversed(maps)):            # j=0 deepest
        p = params["fusion"][j]
        h = m if fused is None else fused + _residual_unit(p["res1"], m)
        h = _residual_unit(p["res2"], h)
        if j < len(maps) - 1:
            size = maps[len(maps) - 2 - j].shape[1:3]
        else:
            size = (h.shape[1] * 2, h.shape[2] * 2)
        h = resize_bilinear_ac(h, size)
        fused = _conv(p["proj"], h)

    h = _conv(params["head"]["conv1"], fused)
    h = resize_bilinear_ac(h, (ph * cfg.patch_size, pw * cfg.patch_size))
    h = jax.nn.relu(_conv(params["head"]["conv2"], h))
    h = _conv(params["head"]["conv3"], h)
    depth = jax.nn.sigmoid(h[..., 0]) * cfg.max_depth
    return depth


# ---------------------------------------------------------------------------
# Weight import from the original .pth state dict.

def _t(a):
    if hasattr(a, "detach"):
        a = a.detach().cpu().numpy()
    return jnp.asarray(np.asarray(a, np.float32))


def _conv_p(sd, name, bias=True):
    p = {"w": _t(sd[f"{name}.weight"]).transpose(2, 3, 1, 0)}  # OIHW->HWIO
    if bias:
        p["b"] = _t(sd[f"{name}.bias"])
    return p


def params_from_state_dict(sd, cfg: DAV2Config) -> dict:
    """Map the original DepthAnythingV2 checkpoint (pretrained.* ViT +
    depth_head.* DPT, torch layouts) into the functional param tree."""
    params = vit_params(sd, _vit_cfg(cfg), prefix="pretrained.")
    params.update({
        "projects": [_conv_p(sd, f"depth_head.projects.{i}")
                     for i in range(4)],
        # Transposed convs keep torch [Cin, Cout, k, k] layout.
        "resize0": {"w": _t(sd["depth_head.resize_layers.0.weight"]),
                    "b": _t(sd["depth_head.resize_layers.0.bias"])},
        "resize1": {"w": _t(sd["depth_head.resize_layers.1.weight"]),
                    "b": _t(sd["depth_head.resize_layers.1.bias"])},
        "resize3": _conv_p(sd, "depth_head.resize_layers.3"),
        "layer_rn": [_conv_p(sd, f"depth_head.scratch.layer{i + 1}_rn",
                             bias=False) for i in range(4)],
        # fusion[j] is the j-th applied stage (deepest first) = refinenet4..1.
        "fusion": [],
        "head": {
            "conv1": _conv_p(sd, "depth_head.scratch.output_conv1"),
            "conv2": _conv_p(sd, "depth_head.scratch.output_conv2.0"),
            "conv3": _conv_p(sd, "depth_head.scratch.output_conv2.2"),
        },
    })
    for j in range(4):
        rn = f"depth_head.scratch.refinenet{4 - j}"
        entry = {
            "proj": _conv_p(sd, f"{rn}.out_conv"),
            "res2": {"conv1": _conv_p(sd, f"{rn}.resConfUnit2.conv1"),
                     "conv2": _conv_p(sd, f"{rn}.resConfUnit2.conv2")},
        }
        if f"{rn}.resConfUnit1.conv1.weight" in sd:
            entry["res1"] = {"conv1": _conv_p(sd, f"{rn}.resConfUnit1.conv1"),
                             "conv2": _conv_p(sd, f"{rn}.resConfUnit1.conv2")}
        params["fusion"].append(entry)
    return params


def expected_state_dict_shapes(cfg: DAV2Config, num_tokens: int = 1370):
    """The original checkpoint's key -> shape contract (used to synthesize
    stub checkpoints in tests and to validate real ones)."""
    c, f = cfg.embed_dim, cfg.features
    sd = expected_vit_shapes(_vit_cfg(cfg), num_tokens, prefix="pretrained.")
    oc = cfg.out_channels
    for i in range(4):
        sd[f"depth_head.projects.{i}.weight"] = (oc[i], c, 1, 1)
        sd[f"depth_head.projects.{i}.bias"] = (oc[i],)
        sd[f"depth_head.scratch.layer{i + 1}_rn.weight"] = (f, oc[i], 3, 3)
    sd["depth_head.resize_layers.0.weight"] = (oc[0], oc[0], 4, 4)
    sd["depth_head.resize_layers.0.bias"] = (oc[0],)
    sd["depth_head.resize_layers.1.weight"] = (oc[1], oc[1], 2, 2)
    sd["depth_head.resize_layers.1.bias"] = (oc[1],)
    sd["depth_head.resize_layers.3.weight"] = (oc[3], oc[3], 3, 3)
    sd["depth_head.resize_layers.3.bias"] = (oc[3],)
    for n in range(1, 5):
        rn = f"depth_head.scratch.refinenet{n}"
        for u in ("resConfUnit1", "resConfUnit2"):
            sd[f"{rn}.{u}.conv1.weight"] = (f, f, 3, 3)
            sd[f"{rn}.{u}.conv1.bias"] = (f,)
            sd[f"{rn}.{u}.conv2.weight"] = (f, f, 3, 3)
            sd[f"{rn}.{u}.conv2.bias"] = (f,)
        sd[f"{rn}.out_conv.weight"] = (f, f, 1, 1)
        sd[f"{rn}.out_conv.bias"] = (f,)
    sd["depth_head.scratch.output_conv1.weight"] = (f // 2, f, 3, 3)
    sd["depth_head.scratch.output_conv1.bias"] = (f // 2,)
    sd["depth_head.scratch.output_conv2.0.weight"] = (32, f // 2, 3, 3)
    sd["depth_head.scratch.output_conv2.0.bias"] = (32,)
    sd["depth_head.scratch.output_conv2.2.weight"] = (1, 32, 1, 1)
    sd["depth_head.scratch.output_conv2.2.bias"] = (1,)
    return sd


def load_depth_anything(size: str, weights_path: str):
    """Build a jitted depth callable [B,H,W,3]-normalized -> [B,H,W] from an
    original metric checkpoint (.pth)."""
    import torch
    cfg = SIZES[size]
    sd = torch.load(weights_path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "model" in sd and hasattr(sd["model"], "keys"):
        sd = sd["model"]
    params = params_from_state_dict(sd, cfg)
    fn = jax.jit(lambda p, x: dav2_apply(p, cfg, x))
    return lambda x: fn(params, x)
