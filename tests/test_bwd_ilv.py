"""VIVID_BWD_ILV=n — statically-unrolled query-chunking of the packed
attention BACKWARD kernels (kernels/flash.py pick_q_chunk_bwd +
_kernel_packed_bwd_common static_chunks path).

The round-5 schedule experiment (docs/PERF.md "remaining backward-kernel
lead"): the whole-row backward's dataflow-independent chains appear to be
serialized by Mosaic's stack-buffer reuse; n unrolled half-size chunk bodies
give the scheduler buffers it cannot merge. The math is EXACT — same
operations in the same accumulation order as the fori_loop/whole-row forms —
so kernel-level outputs must match the default path tightly, and the
dispatch-level custom_vjp gradients must agree. Interpret mode on CPU; the
chip A/B lives in tools/round5_bwd_ilv_jobs.sh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

EPS = 1e-4


def _mk(b, s, h, d, parts, seed=0):
    key = jax.random.PRNGKey(seed)
    return jax.random.normal(key, (b, s, parts * h * d), jnp.bfloat16)


def _picker_states(monkeypatch, s, sk, h):
    """(default, ilv=2) pick_q_chunk_bwd results for the test shape."""
    from vivid_tpu.kernels.flash import pick_q_chunk_bwd
    monkeypatch.delenv("VIVID_BWD_ILV", raising=False)
    base = pick_q_chunk_bwd(s, sk, h)
    monkeypatch.setenv("VIVID_BWD_ILV", "2")
    ilv = pick_q_chunk_bwd(s, sk, h)
    return base, ilv


def test_picker_gates(monkeypatch):
    from vivid_tpu.kernels.flash import pick_q_chunk_bwd
    (cq0, _, st0), (cq2, _, st2) = _picker_states(monkeypatch, 1024, 3072, 4)
    assert (cq0, st0) == (1024, False)        # proven whole-row envelope
    assert (cq2, st2) == (512, True)          # split in two, unrolled
    # Out-of-envelope shapes (SR H=8) never take the static path.
    monkeypatch.setenv("VIVID_BWD_ILV", "2")
    cq, _, st = pick_q_chunk_bwd(1024, 21504, 8)
    assert not st and 1024 % cq == 0
    # Rows that don't tile by 64*n stay whole-row.
    cq, _, st = pick_q_chunk_bwd(192, 192, 2)
    assert (cq, st) == (192, False)


@pytest.mark.parametrize("sink", [0, 256])
def test_self_bwd_ilv_parity(monkeypatch, sink):
    from vivid_tpu.kernels.flash import flash_fused_packed_bwd
    qkv = _mk(2, 128, 4, 32, 3, seed=1 + sink)
    g = jax.random.normal(jax.random.PRNGKey(9), (2, 128, 128), jnp.bfloat16)
    monkeypatch.delenv("VIVID_BWD_ILV", raising=False)
    base = flash_fused_packed_bwd(qkv, g, 4, norm_eps=EPS, zero_sink=sink,
                                  interpret=True)
    monkeypatch.setenv("VIVID_BWD_ILV", "2")
    ilv = flash_fused_packed_bwd(qkv, g, 4, norm_eps=EPS, zero_sink=sink,
                                 interpret=True)
    # dq is bitwise-identical (per-row math, chunk-invariant); dk/dv change
    # accumulation order (one whole-row dot -> two half-row dots + add), so
    # isolated elements may round to the neighboring bf16 — one output ULP.
    np.testing.assert_allclose(np.asarray(ilv, np.float32),
                               np.asarray(base, np.float32),
                               atol=1e-3, rtol=1e-2)


@pytest.mark.parametrize("n_bias", [0, 2])
def test_xattn_bwd_ilv_parity(monkeypatch, n_bias):
    from vivid_tpu.kernels.flash import flash_fused_packed_xattn_bwd
    b, s, h, d = 1, 128, 4, 32
    qkv = _mk(b, s, h, d, 3, seed=3)
    feats = tuple(_mk(b, s, h, d, 2, seed=11 + i) for i in range(2))
    biases = tuple(
        jax.random.normal(jax.random.PRNGKey(31 + i), (b, h, s, s),
                          jnp.float32) * 0.1
        for i in range(n_bias)) or None
    g = jax.random.normal(jax.random.PRNGKey(7), (b, s, h * d), jnp.bfloat16)
    monkeypatch.delenv("VIVID_BWD_ILV", raising=False)
    base = flash_fused_packed_xattn_bwd(qkv, feats, g, h, biases=biases,
                                        norm_eps=EPS, interpret=True)
    monkeypatch.setenv("VIVID_BWD_ILV", "2")
    ilv = flash_fused_packed_xattn_bwd(qkv, feats, g, h, biases=biases,
                                       norm_eps=EPS, interpret=True)
    for a, b_ in zip(jax.tree_util.tree_leaves(ilv),
                     jax.tree_util.tree_leaves(base)):
        # bf16-output ULP tolerance — see test_self_bwd_ilv_parity.
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b_, np.float32),
                                   atol=1e-3, rtol=1e-2)


def test_dispatch_grads_ilv(monkeypatch):
    """The flag must ride the production custom_vjp dispatch unchanged —
    value and gradients agree with the default path through
    self_attention_from_packed + xattn_from_packed."""
    monkeypatch.setenv("VIVID_PALLAS_INTERPRET", "1")
    from vivid_tpu.kernels.attention import (self_attention_from_packed,
                                             xattn_from_packed)
    qkv = _mk(1, 128, 4, 32, 3, seed=6).astype(jnp.float32)
    feats = tuple(_mk(1, 128, 4, 32, 2, seed=20 + i).astype(jnp.float32)
                  for i in range(2))

    def loss(x, fs):
        y1 = self_attention_from_packed(x.astype(jnp.bfloat16), 4,
                                        zero_sink=256, eps=EPS)
        y2 = xattn_from_packed(x.astype(jnp.bfloat16),
                               tuple(f.astype(jnp.bfloat16) for f in fs), 4,
                               eps=EPS)
        return jnp.sum(jnp.square(y1.astype(jnp.float32))
                       + jnp.square(y2.astype(jnp.float32)))

    monkeypatch.delenv("VIVID_BWD_ILV", raising=False)
    v0, g0 = jax.value_and_grad(loss, argnums=(0, 1))(qkv, feats)
    monkeypatch.setenv("VIVID_BWD_ILV", "2")
    v1, g1 = jax.value_and_grad(loss, argnums=(0, 1))(qkv, feats)

    np.testing.assert_allclose(float(v1), float(v0), rtol=1e-5)
    for a, b_ in zip(jax.tree_util.tree_leaves(g1),
                     jax.tree_util.tree_leaves(g0)):
        na, nb = np.asarray(a, np.float32), np.asarray(b_, np.float32)
        assert np.abs(na - nb).max() / (np.abs(nb).max() + 1e-6) < 3e-3
