"""Functional DINOv2 ViT backbone (shared by the DepthAnythingV2 depth model
and the FD-DINOv2 metric detector).

Matches the original facebookresearch/dinov2 eval forward for vits/vitb/vitl
(patch 14, layerscale, exact GELU, LN eps 1e-6, no register tokens):
patch-embed conv -> [cls ‖ patches] + pos -> pre-norm attention/MLP blocks ->
final LayerNorm. Numerics validated against the HuggingFace Dinov2
implementation with shared random weights (tests/test_depth_anything.py,
tests/test_dinov2.py).

Param tree (per block: norm1, q, k, v, proj, ls1, norm2, fc1, fc2, ls2;
top level: cls_token, pos_embed, patch_embed, blocks, norm) — built from an
original-naming torch state dict by `params_from_state_dict` (optionally
prefixed, e.g. 'pretrained.' inside DepthAnythingV2 checkpoints).
"""

from dataclasses import dataclass
from typing import Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

LN_EPS = 1e-6


@dataclass(frozen=True)
class ViTConfig:
    embed_dim: int
    depth: int
    num_heads: int
    patch_size: int = 14


VIT_SIZES = {
    "vits": ViTConfig(384, 12, 6),
    "vitb": ViTConfig(768, 12, 12),
    "vitl": ViTConfig(1024, 24, 16),
}


def layernorm(p, x):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + LN_EPS) * p["g"] + p["b"]


def linear(p, x):
    return x @ p["w"] + p["b"]


def vit_block(p, x, num_heads):
    b, n, c = x.shape
    d = c // num_heads
    h = layernorm(p["norm1"], x)
    q = linear(p["q"], h).reshape(b, n, num_heads, d)
    k = linear(p["k"], h).reshape(b, n, num_heads, d)
    v = linear(p["v"], h).reshape(b, n, num_heads, d)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(d)
    probs = jax.nn.softmax(logits, axis=-1)
    attn = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, n, c)
    x = x + linear(p["proj"], attn) * p["ls1"]
    h = layernorm(p["norm2"], x)
    h = linear(p["fc2"], jax.nn.gelu(linear(p["fc1"], h), approximate=False))
    return x + h * p["ls2"]


def vit_forward(params, cfg: ViTConfig, x,
                out_indices: Optional[Sequence[int]] = None):
    """x: [B, H, W, 3] normalized, H=W multiple of patch_size, matching the
    pos_embed grid.

    out_indices=None  -> (cls [B, C], patch-mean [B, C]) after the final norm.
    out_indices=(...) -> list of final-normed patch-token maps [B, N, C] at
                         those block indices (the DPT feature contract),
                         plus the (ph, pw) grid.
    """
    b = x.shape[0]
    patches = jax.lax.conv_general_dilated(
        x, params["patch_embed"]["w"], (cfg.patch_size, cfg.patch_size),
        "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    patches = patches + params["patch_embed"]["b"]
    ph, pw = patches.shape[1:3]
    tokens = patches.reshape(b, ph * pw, cfg.embed_dim)
    cls = jnp.broadcast_to(params["cls_token"], (b, 1, cfg.embed_dim))
    tokens = jnp.concatenate([cls, tokens], axis=1)
    pos = params["pos_embed"]
    assert pos.shape[0] == tokens.shape[1], (
        f"pos_embed has {pos.shape[0]} tokens, input needs {tokens.shape[1]} "
        "— interpolate the pos grid at weight-load time for this input size")
    tokens = tokens + pos[None]

    if out_indices is None:
        for i in range(cfg.depth):
            tokens = vit_block(params["blocks"][i], tokens, cfg.num_heads)
        tokens = layernorm(params["norm"], tokens)
        return tokens[:, 0], jnp.mean(tokens[:, 1:], axis=1)

    out, want = [], set(out_indices)
    for i in range(cfg.depth):
        tokens = vit_block(params["blocks"][i], tokens, cfg.num_heads)
        if i in want:
            out.append(layernorm(params["norm"], tokens)[:, 1:])
    return out, (ph, pw)


# ---------------------------------------------------------------------------
# Weight import (original DINOv2 state-dict naming).

def _t(a):
    if hasattr(a, "detach"):
        a = a.detach().cpu().numpy()
    return jnp.asarray(np.asarray(a, np.float32))


def _lin_p(sd, name):
    return {"w": _t(sd[f"{name}.weight"]).T, "b": _t(sd[f"{name}.bias"])}


def _ln_p(sd, name):
    return {"g": _t(sd[f"{name}.weight"]), "b": _t(sd[f"{name}.bias"])}


def params_from_state_dict(sd, cfg: ViTConfig, prefix: str = "",
                           pos_grid: Optional[int] = None) -> dict:
    """Build the param tree from an original-naming torch state dict.
    `prefix` is e.g. 'pretrained.' inside DepthAnythingV2 checkpoints.
    `pos_grid` interpolates the positional grid to pos_grid x pos_grid
    patches at load time (torch bicubic, antialias=False — the original
    interpolate_pos_encoding), so the jitted forward needs no dynamic
    interpolation."""
    c = cfg.embed_dim
    blocks = []
    for i in range(cfg.depth):
        pre = f"{prefix}blocks.{i}"
        qkv_w = _t(sd[f"{pre}.attn.qkv.weight"])   # [3C, C]
        qkv_b = _t(sd[f"{pre}.attn.qkv.bias"])
        blocks.append({
            "norm1": _ln_p(sd, f"{pre}.norm1"),
            "q": {"w": qkv_w[:c].T, "b": qkv_b[:c]},
            "k": {"w": qkv_w[c:2 * c].T, "b": qkv_b[c:2 * c]},
            "v": {"w": qkv_w[2 * c:].T, "b": qkv_b[2 * c:]},
            "proj": _lin_p(sd, f"{pre}.attn.proj"),
            "ls1": _t(sd[f"{pre}.ls1.gamma"]),
            "norm2": _ln_p(sd, f"{pre}.norm2"),
            "fc1": _lin_p(sd, f"{pre}.mlp.fc1"),
            "fc2": _lin_p(sd, f"{pre}.mlp.fc2"),
            "ls2": _t(sd[f"{pre}.ls2.gamma"]),
        })
    pos = _t(sd[f"{prefix}pos_embed"])[0]          # [N+1, C]
    if pos_grid is not None:
        n_have = int(round((pos.shape[0] - 1) ** 0.5))
        if n_have != pos_grid:
            import torch
            import torch.nn.functional as F
            grid = torch.as_tensor(np.asarray(pos[1:], np.float32))
            grid = grid.reshape(1, n_have, n_have, c).permute(0, 3, 1, 2)
            grid = F.interpolate(grid, size=(pos_grid, pos_grid),
                                 mode="bicubic", antialias=False,
                                 align_corners=False)
            grid = grid.permute(0, 2, 3, 1).reshape(pos_grid * pos_grid, c)
            pos = jnp.concatenate([pos[:1], jnp.asarray(grid.numpy())], 0)
    return {
        "cls_token": _t(sd[f"{prefix}cls_token"]).reshape(1, c),
        "pos_embed": pos,
        "patch_embed": {
            "w": _t(sd[f"{prefix}patch_embed.proj.weight"]).transpose(2, 3, 1, 0),
            "b": _t(sd[f"{prefix}patch_embed.proj.bias"]),
        },
        "blocks": blocks,
        "norm": _ln_p(sd, f"{prefix}norm"),
    }


def expected_vit_shapes(cfg: ViTConfig, num_tokens: int, prefix: str = ""):
    """key -> shape contract of an original-naming checkpoint (stub tests)."""
    c = cfg.embed_dim
    sd = {
        f"{prefix}cls_token": (1, 1, c),
        f"{prefix}pos_embed": (1, num_tokens, c),
        f"{prefix}patch_embed.proj.weight": (c, 3, cfg.patch_size,
                                             cfg.patch_size),
        f"{prefix}patch_embed.proj.bias": (c,),
        f"{prefix}norm.weight": (c,), f"{prefix}norm.bias": (c,),
    }
    for i in range(cfg.depth):
        pre = f"{prefix}blocks.{i}"
        sd.update({
            f"{pre}.norm1.weight": (c,), f"{pre}.norm1.bias": (c,),
            f"{pre}.attn.qkv.weight": (3 * c, c), f"{pre}.attn.qkv.bias": (3 * c,),
            f"{pre}.attn.proj.weight": (c, c), f"{pre}.attn.proj.bias": (c,),
            f"{pre}.ls1.gamma": (c,), f"{pre}.ls2.gamma": (c,),
            f"{pre}.norm2.weight": (c,), f"{pre}.norm2.bias": (c,),
            f"{pre}.mlp.fc1.weight": (4 * c, c), f"{pre}.mlp.fc1.bias": (4 * c,),
            f"{pre}.mlp.fc2.weight": (c, 4 * c), f"{pre}.mlp.fc2.bias": (c,),
        })
    return sd
