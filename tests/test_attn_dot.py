"""VIVID_ATTN_DOT=1 runs the packed path's 1x1 attention convs as dots on
the flattened token axis (nn/blocks.py _attn_dot). Numerics must match the
conv form: same normalized weight, same contraction — only the op (and the
XLA layout it implies) changes. Pins outputs and grads, self and xattn."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vivid_tpu.nn.blocks import BlockConfig, block_apply, block_init


def _run(cfg, params, x, emb, feats, monkeypatch, dot: bool):
    monkeypatch.setenv("VIVID_PALLAS_INTERPRET", "1")  # packed path off-TPU
    monkeypatch.setenv("VIVID_ATTN_DOT", "1" if dot else "0")

    def loss(p):
        y = block_apply(p, cfg, x, emb, features=feats, train=True)
        return jnp.sum(y.astype(jnp.float32) ** 2), y

    (val, y), g = jax.value_and_grad(loss, has_aux=True)(params)
    return y, val, g


@pytest.mark.parametrize("xattn", [False, True])
def test_attn_dot_matches_conv(xattn, monkeypatch):
    cfg = BlockConfig(in_channels=64, out_channels=64, emb_channels=32,
                      attention=True, xattn=xattn, num_cross_sources=2,
                      channels_per_head=32)
    key = jax.random.PRNGKey(0)
    params = block_init(key, cfg)
    ks = jax.random.split(key, 4)
    x = jax.random.normal(ks[0], (2, 8, 8, 64), jnp.float32)
    emb = jax.random.normal(ks[1], (2, 32), jnp.float32)
    feats = None
    if xattn:
        feats = [jax.random.normal(k, (2, 8, 8, 64), jnp.float32)
                 for k in ks[2:]]

    y0, v0, g0 = _run(cfg, params, x, emb, feats, monkeypatch, dot=False)
    y1, v1, g1 = _run(cfg, params, x, emb, feats, monkeypatch, dot=True)

    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(float(v1), float(v0), rtol=1e-5)
    l0, td0 = jax.tree_util.tree_flatten(g0)
    l1, td1 = jax.tree_util.tree_flatten(g1)
    assert td0 == td1
    for a, b in zip(l0, l1):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)
