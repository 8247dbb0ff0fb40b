"""Magnitude-preserving primitives (EDM2).

Numerics parity with the reference (training/models.py:37-126), re-laid-out
for TPU: tensors are channel-last [B, H, W, C]; conv weights are HWIO
[kh, kw, cin, cout]; linear weights are [cin, cout]. Norm math always runs in
float32 regardless of the compute dtype, exactly like the reference.

The resample filter is the fixed f=[1,1] separable kernel, which reduces to a
2x2 mean-pool (down) and nearest-neighbour 2x repeat (up) — implemented as
such instead of grouped convolutions (identical results, far cheaper on VPU).
"""

import math
import os
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def normalize(x, axis=None, eps: float = 1e-4):
    """Scale `x` to unit *RMS* magnitude over `axis` (default: all dims but
    the first): x / (eps + ||x|| / sqrt(N)) with N the group size. This is the
    reference's `normalize` (models.py:37-42), where
    `torch.add(eps, norm, alpha=sqrt(norm.numel()/x.numel()))` evaluates to
    eps + norm/sqrt(N). Norm math is float32."""
    if axis is None:
        axis = tuple(range(1, x.ndim))
    elif isinstance(axis, int):
        axis = (axis,)
    x32 = x.astype(jnp.float32)
    norm = jnp.sqrt(jnp.sum(jnp.square(x32), axis=axis, keepdims=True))
    numel_ratio = math.sqrt(float(norm.size) / float(x.size))
    denom = eps + numel_ratio * norm
    # Keep the divide in x.dtype. An f32-divide-then-downcast variant wins
    # 20% on an ISOLATED SR level-0 block (tools/sr_block_lab.py) but is
    # neutral in the full SR model and a consistent ~3% LOSS on the base
    # forward (11.8 -> 12.1 ms, interleaved A/B) — XLA's fusion choices
    # around the extra f32 stream differ per graph. Measured, not worth it.
    return x / denom.astype(x.dtype)


def mp_silu(x):
    """Magnitude-preserving SiLU (EDM2 Eq. 81)."""
    return jax.nn.silu(x) / 0.596


def mp_sum(a, b, t=0.5):
    """Magnitude-preserving lerp (EDM2 Eq. 88)."""
    return (a + t * (b - a)) / math.sqrt((1 - t) ** 2 + t ** 2)


def mp_cat(a, b, axis=-1, t=0.5):
    """Magnitude-preserving concatenation (EDM2 Eq. 103). Channel axis is last
    by convention here."""
    na = a.shape[axis]
    nb = b.shape[axis]
    c = math.sqrt((na + nb) / ((1 - t) ** 2 + t ** 2))
    wa = c / math.sqrt(na) * (1 - t)
    wb = c / math.sqrt(nb) * t
    return jnp.concatenate([wa * a, wb * b], axis=axis)


def resample(x, mode: str = "keep"):
    """2x spatial up/down-sampling of [B, H, W, C] with the fixed [1,1] filter:
    down == 2x2 mean pool, up == nearest 2x repeat."""
    if mode == "keep":
        return x
    b, h, w, c = x.shape
    if mode == "down":
        return x.reshape(b, h // 2, 2, w // 2, 2, c).mean(axis=(2, 4))
    assert mode == "up"
    x = jnp.repeat(x, 2, axis=1)
    return jnp.repeat(x, 2, axis=2)


# ---------------------------------------------------------------------------
# MPFourier — random Fourier features (EDM2 Eq. 75). Non-trainable buffers.

def mp_fourier_init(key, num_channels: int, bandwidth: float = 1.0):
    kf, kp = jax.random.split(key)
    return {
        "freqs": 2 * jnp.pi * jax.random.normal(kf, (num_channels,), jnp.float32) * bandwidth,
        "phases": 2 * jnp.pi * jax.random.uniform(kp, (num_channels,), jnp.float32),
    }


def mp_fourier_apply(params, x):
    """x: [...] scalars -> [..., C] features, computed in fp32 then cast back."""
    y = x.astype(jnp.float32)
    y = y[..., None] * params["freqs"].astype(jnp.float32) + params["phases"].astype(jnp.float32)
    return (jnp.cos(y) * np.sqrt(2.0)).astype(x.dtype)


# ---------------------------------------------------------------------------
# MPConv — magnitude-preserving conv / linear (EDM2 Eq. 47), weight normalized
# in the forward pass. Forced weight normalization (Eq. 66) is available as a
# separate parameter transform (`force_weight_normalize`) applied by the train
# step when configured — the reference default trains without it
# (models.py:116-118, commented out upstream mechanism).

def mp_conv_init(key, in_channels: int, out_channels: int,
                 kernel: Sequence[int] = ()) -> dict:
    """kernel: () for linear, (kh, kw) for conv. Weight ~ N(0, 1) like the
    reference; actual magnitude comes from forward-time normalization."""
    shape = tuple(kernel) + (in_channels, out_channels)
    return {"w": jax.random.normal(key, shape, jnp.float32)}


def _normalized_weight(w, gain):
    """RMS-normalize each output-channel filter (norm -> sqrt(fan_in)), then
    apply the magnitude-preserving gain/sqrt(fan_in) scale — net effect: each
    filter has L2 norm == gain, so unit-variance inputs stay unit-variance."""
    w32 = w.astype(jnp.float32)
    axes = tuple(range(w32.ndim - 1))  # all but the output-channel axis
    norm = jnp.sqrt(jnp.sum(jnp.square(w32), axis=axes, keepdims=True))
    numel_ratio = math.sqrt(float(norm.size) / float(w32.size))
    w32 = w32 / (1e-4 + numel_ratio * norm)
    fan_in = float(np.prod(w32.shape[:-1]))
    return w32 * (gain / math.sqrt(fan_in))


# Conv outputs with spatial area above this are tagged "mpconv_out_hires":
# the save_dots remat policy keeps regular conv/attention outputs but DROPS
# hires ones (recomputed in backward). At SR resolution the 256px level-0
# activations dominate residency ([B,256,256,64] per conv across the stack
# — save_dots used to OOM 16GB HBM there); everything at <=128px is kept.
# VIVID_REMAT_HIRES_AREA overrides the threshold (HBM-headroom experiments:
# 64*64=4096 drops the 128px class too, trading recompute for residency).
REMAT_HIRES_AREA = int(os.environ.get("VIVID_REMAT_HIRES_AREA",
                                      str(128 * 128)))


def mp_conv_apply(params, x, gain=1.0):
    """Linear ([..., cin] @ [cin, cout]) or same-padded conv2d
    ([B,H,W,cin] * [kh,kw,cin,cout]); weight normalization in fp32, compute in
    x.dtype."""
    from jax.ad_checkpoint import checkpoint_name
    w = _normalized_weight(params["w"], gain)
    # "wnorm" tag: lets the save_dots policy optionally keep the normalized
    # weight (VIVID_SAVE_WNORM=1). Chip A/B measured that saving it is a
    # ~1.5% LOSS at flagship b=32 — XLA already hoists the re-normalization
    # out of the backward recompute — so the policy default leaves it out
    # (nn/unet.py _remat_wrap); the tag alone costs nothing.
    w = checkpoint_name(w.astype(x.dtype), "wnorm")
    if w.ndim == 2:
        return checkpoint_name(x @ w, "mpconv_out")
    assert w.ndim == 4
    pad_h = w.shape[0] // 2
    pad_w = w.shape[1] // 2
    # The "mpconv_out"/"mpconv_out_hires" checkpoint names drive the
    # selective remat policy (UNetConfig.remat="save_dots"): keep conv/linear
    # outputs (except hires ones, see REMAT_HIRES_AREA), recompute the cheap
    # elementwise chains in the backward pass.
    name = ("mpconv_out_hires"
            if x.shape[1] * x.shape[2] > REMAT_HIRES_AREA else "mpconv_out")
    return checkpoint_name(jax.lax.conv_general_dilated(
        x, w,
        window_strides=(1, 1),
        padding=((pad_h, pad_h), (pad_w, pad_w)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ), name)


def mp_conv_apply_wpacked(params, xp, gain=1.0):
    """MPConv on a width-packed tensor (nn/wpack.py): xp [B, H, W/2, 2*cin]
    -> [B, H, W/2, 2*cout]. The weight is RMS-normalized UNPACKED (identical
    filter norms to the plain path), then embedded into the packed
    [3,3,2cin,2cout] / block-diagonal [1,1,2cin,2cout] kernel — numerics are
    exact vs mp_conv_apply on the unpacked tensor (tests/test_wpack.py).
    Purpose: C<128 conv stacks at large spatial (the SR 256px level 0)
    half-fill the TPU's 128 lanes/MXU; packing two adjacent pixels per
    channel row runs ~1.8x faster despite the 2x embedded MACs
    (tools/sr_conv_lab.py)."""
    from jax.ad_checkpoint import checkpoint_name
    from vivid_tpu.nn.wpack import pack_conv_weight, pack_conv_weight_1x1
    w = _normalized_weight(params["w"], gain).astype(xp.dtype)
    assert w.ndim == 4, w.shape
    wp = (pack_conv_weight(w) if w.shape[0] == 3
          else pack_conv_weight_1x1(w))
    pad = ((wp.shape[0] // 2,) * 2, (wp.shape[1] // 2,) * 2)
    name = ("mpconv_out_hires"  # unpacked area (W is halved by packing)
            if xp.shape[1] * xp.shape[2] * 2 > REMAT_HIRES_AREA
            else "mpconv_out")
    return checkpoint_name(jax.lax.conv_general_dilated(
        xp, wp, window_strides=(1, 1), padding=pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ), name)


def force_weight_normalize(params):
    """Forced weight normalization (EDM2 Eq. 66): renormalize every MPConv
    weight leaf to unit magnitude per output channel. Apply to the param tree
    after each optimizer step when `force_wn` is enabled."""

    def norm_leaf(path, leaf):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if name == "w" and leaf.ndim in (2, 4):
            axes = tuple(range(leaf.ndim - 1))
            norm = jnp.sqrt(jnp.sum(jnp.square(leaf.astype(jnp.float32)),
                                    axis=axes, keepdims=True))
            numel_ratio = math.sqrt(float(norm.size) / float(leaf.size))
            return (leaf / (1e-4 + numel_ratio * norm)).astype(leaf.dtype)
        return leaf

    return jax.tree_util.tree_map_with_path(norm_leaf, params)
