"""Width-packed (pixel-pair) execution for narrow-channel conv stacks.

TPU motivation: vector lanes and the MXU are 128 wide. A C=64 conv stack
(the SR model's 256px level 0 — /root/reference/training/models.py:579-582
runs its production super-resolution at model_channels=64) leaves half of
every register row and every MXU tile idle, and measured ~24 TF/s in-model
(docs/PERF.md). Packing two horizontally-adjacent pixels into one 128-wide
channel row [B, H, W, C] -> [B, H, W/2, 2C] fills the lanes; the 3x3 conv
is re-expressed EXACTLY on the packed layout with an embedded
[3, 3, 2C, 2C] kernel (2x the MACs, half of them structural zeros — but the
MXU runs them at full width, measured net ~1.8x faster at the SR level-0
shape, tools/sr_conv_lab.py variant f vs a).

Channel order convention: packed channel index = (parity p, channel c) with
parity-major flattening, i.e. packed[..., p*C + c] = x[..., 2*j + p, c].

Kernel embedding (exact, incl. SAME zero-padding parity):
    out[b, h, j, (q, co)] = sum_{ky, dx, ci} W[ky, dx+1, ci, co]
                            * x[b, h+ky-1, 2j+q+dx, ci]
    and 2j+q+dx = 2*(j+kx'-1) + p  with  kx' ∈ {0,1,2}, p ∈ {0,1}
  => W'[ky, kx', (p, ci), (q, co)] = W[ky, (2*(kx'-1)+p-q)+1, ci, co]
     when 2*(kx'-1)+p-q ∈ {-1, 0, 1}, else 0.

All ops in a packed region work on free minor-dim reshapes
([..., 2C] <-> [..., 2, C]): pixel norm / mp_sum / mp_cat / silu / gains
need no layout copies. Numerics are bit-identical to the unpacked path for
the conv (same dot contractions, zeros add exactly 0) — parity-tested in
tests/test_wpack.py.
"""

import jax
import jax.numpy as jnp
import numpy as np


def wpack(x):
    """[B, H, W, C] -> [B, H, W//2, 2C], parity-major packed channels."""
    b, h, w, c = x.shape
    assert w % 2 == 0, w
    # [b, h, w/2, 2, c] -> channels (p, c) flattened
    return x.reshape(b, h, w // 2, 2 * c)


def wunpack(x):
    """[B, H, W2, 2C] -> [B, H, 2*W2, C]."""
    b, h, w2, c2 = x.shape
    assert c2 % 2 == 0, c2
    return x.reshape(b, h, w2 * 2, c2 // 2)


def pack_conv_weight(w):
    """[3, 3, C, C2] -> [3, 3, 2C, 2C2] embedded kernel (see module doc).
    Works for any in/out channel counts; kernel must be 3x3."""
    kh, kw, cin, cout = w.shape
    assert (kh, kw) == (3, 3), (kh, kw)
    wp = jnp.zeros((3, 3, 2 * cin, 2 * cout), w.dtype)
    for kxp in range(3):
        for p in range(2):
            for q in range(2):
                dx = 2 * (kxp - 1) + p - q
                if -1 <= dx <= 1:
                    wp = wp.at[:, kxp, p * cin:(p + 1) * cin,
                               q * cout:(q + 1) * cout].set(w[:, dx + 1])
    return wp


def pack_conv_weight_1x1(w):
    """[1, 1, C, C2] (or [C, C2]) -> [1, 1, 2C, 2C2] block-diagonal."""
    if w.ndim == 2:
        w = w[None, None]
    _, _, cin, cout = w.shape
    wp = jnp.zeros((1, 1, 2 * cin, 2 * cout), w.dtype)
    for p in range(2):
        wp = wp.at[:, :, p * cin:(p + 1) * cin,
                   p * cout:(p + 1) * cout].set(w)
    return wp


def packed_channel_op(x, fn, parts=2):
    """Apply fn on the per-pixel channel slice of a packed tensor: views the
    minor dim as [parts, C], maps fn over the real channel axis, flattens
    back. fn must be elementwise or reduce over the LAST axis only (pixel
    norm, gains, mp_cat handled by callers via this view)."""
    b, h, w2, c2 = x.shape
    y = fn(x.reshape(b, h, w2, parts, c2 // parts))
    return y.reshape(b, h, w2, -1)


def tile_gain(c, parts=2):
    """Per-channel gain [B, C] -> packed [B, parts*C] (parity-major)."""
    return jnp.concatenate([c] * parts, axis=-1)
