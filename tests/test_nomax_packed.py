"""Parity tests for the grid-scheduled packed no-max attention kernel
(kernels/flash.py flash_nomax_packed) in Pallas interpret mode on CPU.

Same contract as the whole-row packed kernels (qkv [B, S, 3HD] part-major in,
[B, S, HD] (head, d)-packed out, in-kernel RMS norm, zero-sink closed form)
but on flash_nomax's pipelined (B, H, n_q, n_k) grid — the whole-row kernels'
single giant grid step is schedule-bound on chip (docs/PERF.md round-4 kernel
attack). Shiftless softmax is exact: in-kernel norm bounds scaled logits by
sqrt(D). Pinned against the exact XLA composites in kernels/attention.py.
Chip-side parity at production shapes lives in tests/test_tpu_kernels.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vivid_tpu.kernels.attention import (_xla_self_attention_from_packed,
                                         _xla_xattn_from_packed)
from vivid_tpu.kernels.flash import flash_nomax_packed

EPS = 1e-4


def _mk_packed(b, s, h, d, parts, seed=0):
    key = jax.random.PRNGKey(seed)
    return jax.random.normal(key, (b, s, parts * h * d), jnp.bfloat16)


# Head counts satisfy the head-group channel gate (blocks along the packed
# channel axis are 128 lanes wide: d=32 needs H % 4 == 0, d=64 needs H even
# — as all production shapes do).
@pytest.mark.parametrize("b,s,h,d,sink", [
    (1, 128, 4, 32, 0),
    (2, 128, 4, 32, 256),   # uncond zero-sink path
    (1, 256, 2, 64, 0),
])
def test_nomax_packed_self(b, s, h, d, sink):
    from vivid_tpu.kernels.flash import flash_fused_packed
    qkv = _mk_packed(b, s, h, d, 3, seed=s + sink)
    out = flash_nomax_packed(qkv, (), h, norm_eps=EPS, zero_sink=sink,
                             block_q=128, block_k=128, interpret=True)
    assert out.dtype == qkv.dtype and out.shape == (b, s, h * d)
    # Tight vs the proven whole-row kernel (same math, different schedule;
    # measured identical error vs an fp32 ground truth)...
    whole = flash_fused_packed(qkv, h, norm_eps=EPS, zero_sink=sink,
                               interpret=True)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(whole, np.float32),
                               atol=2e-3, rtol=2e-2)
    # ...and loose vs the XLA bf16 composite (two independent bf16
    # approximations; their mutual gap reaches ~7e-3 at these shapes).
    ref = _xla_self_attention_from_packed(qkv, h, sink, EPS)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               atol=1e-2, rtol=2e-2)


@pytest.mark.parametrize("b,s,h,d,feat_lens", [
    (1, 128, 4, 32, (128, 128)),   # dual-source, equal lengths
    (1, 256, 4, 32, (128,)),       # mixed lengths exercise the seg offsets
    (2, 128, 2, 64, (128, 128)),
])
def test_nomax_packed_xattn(b, s, h, d, feat_lens):
    from vivid_tpu.kernels.flash import flash_fused_packed_xattn
    qkv = _mk_packed(b, s, h, d, 3, seed=1)
    feats = tuple(_mk_packed(b, sf, h, d, 2, seed=10 + i)
                  for i, sf in enumerate(feat_lens))
    out = flash_nomax_packed(qkv, feats, h, norm_eps=EPS,
                             block_q=128, block_k=128, interpret=True)
    assert out.dtype == qkv.dtype and out.shape == (b, s, h * d)
    whole = flash_fused_packed_xattn(qkv, feats, h, norm_eps=EPS,
                                     interpret=True)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(whole, np.float32),
                               atol=2e-3, rtol=2e-2)
    ref = _xla_xattn_from_packed(qkv, feats, (), h, EPS)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               atol=1e-2, rtol=2e-2)


def test_nomax_packed_chains_match():
    qkv = _mk_packed(1, 256, 4, 32, 3, seed=4)
    a = flash_nomax_packed(qkv, (), 4, norm_eps=EPS, block_q=128,
                           block_k=256, chains=2, interpret=True)
    b_ = flash_nomax_packed(qkv, (), 4, norm_eps=EPS, block_q=128,
                            block_k=256, chains=1, interpret=True)
    np.testing.assert_allclose(np.asarray(a, np.float32),
                               np.asarray(b_, np.float32),
                               atol=2e-3, rtol=2e-2)


def test_nomax_packed_dispatch_grads(monkeypatch):
    """VIVID_NOMAX_PACKED=1 must keep the packed custom_vjp differentiable
    (nomax forward, packed/composite backward) and match the flag-off path's
    gradients — the flag swaps only the forward schedule."""
    monkeypatch.setenv("VIVID_PALLAS_INTERPRET", "1")
    from vivid_tpu.kernels.attention import (self_attention_from_packed,
                                             xattn_from_packed)
    qkv = _mk_packed(1, 128, 4, 32, 3, seed=6).astype(jnp.float32)
    feats = tuple(_mk_packed(1, 128, 4, 32, 2, seed=20 + i)
                  .astype(jnp.float32) for i in range(2))

    def loss(x, fs):
        y1 = self_attention_from_packed(x.astype(jnp.bfloat16), 4,
                                        zero_sink=256, eps=EPS)
        y2 = xattn_from_packed(x.astype(jnp.bfloat16),
                               tuple(f.astype(jnp.bfloat16) for f in fs), 4,
                               eps=EPS)
        return jnp.sum(jnp.square(y1.astype(jnp.float32))
                       + jnp.square(y2.astype(jnp.float32)))

    monkeypatch.setenv("VIVID_NOMAX_PACKED", "0")
    v0, g0 = jax.value_and_grad(loss, argnums=(0, 1))(qkv, feats)
    monkeypatch.setenv("VIVID_NOMAX_PACKED", "1")
    v1, g1 = jax.value_and_grad(loss, argnums=(0, 1))(qkv, feats)

    np.testing.assert_allclose(float(v1), float(v0), rtol=1e-3)
    for a, b_ in zip(jax.tree_util.tree_leaves(g1),
                     jax.tree_util.tree_leaves(g0)):
        na, nb = np.asarray(a, np.float32), np.asarray(b_, np.float32)
        assert np.abs(na - nb).max() / (np.abs(nb).max() + 1e-6) < 3e-2
