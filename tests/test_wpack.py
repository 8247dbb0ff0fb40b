"""Width-packed (pixel-pair) conv execution: exactness vs the plain path.

The SR model's 256px level-0 stack runs C=64 convs that half-fill the TPU's
128-wide lanes/MXU; nn/wpack.py re-expresses them on a [B, H, W/2, 2C]
layout with an embedded [3,3,2C,2C] kernel. These tests pin the math: the
packed conv must match the plain conv EXACTLY (the embedded zeros contribute
exact zeros; same contraction order per output)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vivid_tpu.nn.wpack import (pack_conv_weight, pack_conv_weight_1x1,
                                packed_channel_op, tile_gain, wpack, wunpack)


def _conv(x, w):
    pad = (w.shape[0] // 2, w.shape[1] // 2)
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), ((pad[0], pad[0]), (pad[1], pad[1])),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def test_pack_roundtrip():
    x = jnp.arange(2 * 4 * 6 * 3, dtype=jnp.float32).reshape(2, 4, 6, 3)
    np.testing.assert_array_equal(wunpack(wpack(x)), x)
    # parity-major channel order: packed[..., j, p*C+c] == x[..., 2j+p, c]
    p = wpack(x)
    np.testing.assert_array_equal(p[:, :, 1, 3 + 2], x[:, :, 3, 2])
    np.testing.assert_array_equal(p[:, :, 1, 2], x[:, :, 2, 2])


@pytest.mark.parametrize("cin,cout", [(8, 8), (8, 16), (5, 7)])
def test_packed_conv3x3_exact(cin, cout):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 6, 8, cin))
    w = jax.random.normal(jax.random.fold_in(key, 1), (3, 3, cin, cout))
    ref = _conv(x, w)
    out = wunpack(_conv(wpack(x), pack_conv_weight(w)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-5)


def test_packed_conv1x1_exact():
    key = jax.random.PRNGKey(2)
    x = jax.random.normal(key, (2, 4, 8, 6))
    w = jax.random.normal(jax.random.fold_in(key, 1), (1, 1, 6, 10))
    ref = _conv(x, w)
    out = wunpack(_conv(wpack(x), pack_conv_weight_1x1(w)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-5)


def test_packed_channel_op_and_gain():
    from vivid_tpu.nn.mp import normalize
    key = jax.random.PRNGKey(3)
    x = jax.random.normal(key, (2, 4, 8, 6))
    ref = normalize(x, axis=-1)
    out = wunpack(packed_channel_op(
        wpack(x), lambda v: normalize(v, axis=-1)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)

    g = jax.random.normal(jax.random.fold_in(key, 1), (2, 6))
    ref2 = x * g[:, None, None, :]
    out2 = wunpack(wpack(x) * tile_gain(g)[:, None, None, :])
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref2),
                               rtol=1e-6, atol=1e-6)
