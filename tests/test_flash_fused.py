"""Parity tests for the from-scratch fused flash kernel (kernels/flash.py).

The kernel itself runs in Pallas interpret mode here (the suite pins the CPU
backend); real-chip numerics were validated on the v5e (maxdiff 1 bf16 ulp
vs the unfused composite at the production shape, docs/PERF.md). The
dispatcher's CPU/XLA fallback path is exercised by every model/golden test.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vivid_tpu.kernels.flash import flash_fused


def _reference(q, k, v, bias=None, norm_eps=None, zero_sink=0):
    def n(x):
        x = x.astype(jnp.float32)
        if norm_eps is None:
            return x
        d = x.shape[-1]
        return x / (norm_eps
                    + jnp.sqrt(jnp.sum(x * x, -1, keepdims=True) / d))

    q, k, v = n(q), n(k), n(v)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(q.shape[-1])
    if bias is not None:
        s = s + bias
    if zero_sink:
        m = jnp.maximum(jnp.max(s, -1, keepdims=True), 0.0)
        e = jnp.exp(s - m)
        p = e / (jnp.sum(e, -1, keepdims=True) + zero_sink * jnp.exp(-m))
    else:
        p = jax.nn.softmax(s, -1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


CASES = [
    # (B, H, Sq, Sk, bias, norm_eps, zero_sink) — multi-k-block cases
    # exercise the online-softmax carry; zero-sink the closed-form tail.
    ((1, 2, 256, 256), False, None, 0),
    ((1, 2, 256, 768), True, 1e-4, 0),
    ((2, 1, 256, 256), False, 1e-4, 512),
    ((1, 1, 512, 1024), True, None, 0),
    ((1, 1, 512, 1536), False, 1e-4, 2048),
]


@pytest.mark.parametrize("shape,with_bias,eps,zs", CASES)
def test_interpret_parity(shape, with_bias, eps, zs):
    B, H, Sq, Sk = shape
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (B, H, Sq, 64), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(key, 1), (B, H, Sk, 64),
                          jnp.float32)
    v = jax.random.normal(jax.random.fold_in(key, 2), (B, H, Sk, 64),
                          jnp.float32)
    bias = (0.3 * jax.random.normal(jax.random.fold_in(key, 3),
                                    (B, H, Sq, Sk), jnp.float32)
            if with_bias else None)
    got = np.asarray(flash_fused(q, k, v, bias, norm_eps=eps, zero_sink=zs,
                                 block_q=256, block_k=256, interpret=True))
    want = np.asarray(_reference(q, k, v, bias, eps, zs))
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=0)


PACKED_CASES = [
    # (B, S, H, D, zero_sink)
    ((2, 256, 2, 64), 0),
    ((1, 512, 3, 32), 0),
    ((2, 256, 2, 64), 512),
    ((1, 1024, 2, 64), 2048),
    # SR-uncond shape: H=8 forces the multi-chunk query loop
    # (pick_q_chunk -> cq=512 < S; the unchunked kernel OOM'd Mosaic).
    ((1, 1024, 8, 32), 2048),
]


@pytest.mark.parametrize("shape,zs", PACKED_CASES)
def test_packed_self_interpret_parity(shape, zs):
    from vivid_tpu.kernels.flash import flash_fused_packed
    from vivid_tpu.kernels.attention import _xla_self_attention_from_packed
    B, S, H, D = shape
    qkv = jax.random.normal(jax.random.PRNGKey(0), (B, S, 3 * H * D),
                            jnp.float32)
    got = np.asarray(flash_fused_packed(qkv, H, zero_sink=zs, interpret=True))
    want = np.asarray(_xla_self_attention_from_packed(qkv, H, zs, 1e-4))
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=0)


@pytest.mark.parametrize("B,S,Sf,H,D,n,with_bias",
                         [(2, 256, 256, 2, 64, 2, False),
                          (1, 512, 256, 3, 32, 1, False),
                          (1, 256, 512, 2, 64, 2, False),
                          (2, 256, 256, 2, 64, 2, True),
                          (1, 256, 512, 2, 32, 1, True),
                          # the SR 32x32 serving shape that OOM'd Mosaic
                          # unchunked (b>=16 cascade): pick_q_chunk -> 256,
                          # 4 query chunks per head, with and without bias
                          (1, 1024, 1024, 8, 32, 2, False),
                          (1, 1024, 1024, 8, 32, 2, True)])
def test_packed_xattn_interpret_parity(B, S, Sf, H, D, n, with_bias):
    from vivid_tpu.kernels.flash import flash_fused_packed_xattn
    from vivid_tpu.kernels.attention import _xla_xattn_from_packed
    key = jax.random.PRNGKey(0)
    qkv = jax.random.normal(key, (B, S, 3 * H * D), jnp.float32)
    feats = tuple(jax.random.normal(jax.random.fold_in(key, i + 1),
                                    (B, Sf, 2 * H * D), jnp.float32)
                  for i in range(n))
    biases = tuple(0.5 * jax.random.normal(jax.random.fold_in(key, 10 + i),
                                           (B, H, S, Sf), jnp.float32)
                   for i in range(n)) if with_bias else ()
    got = np.asarray(flash_fused_packed_xattn(qkv, feats, H, biases=biases,
                                              interpret=True))
    want = np.asarray(_xla_xattn_from_packed(qkv, feats, biases, H, 1e-4))
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=0)


def test_packed_backwards_match_autodiff():
    """Packed custom VJPs: backward equals autodiff of the XLA composite."""
    from vivid_tpu.kernels.attention import (_packed_bwd, _xattn_packed_bwd,
                                             _xla_self_attention_from_packed,
                                             _xla_xattn_from_packed)
    key = jax.random.PRNGKey(5)
    qkv = jax.random.normal(key, (1, 64, 3 * 2 * 16), jnp.float32)
    g = jax.random.normal(jax.random.fold_in(key, 1), (1, 64, 2 * 16),
                          jnp.float32)
    (got,) = _packed_bwd(2, 128, 1e-4, qkv, g)
    want = jax.vjp(lambda x: _xla_self_attention_from_packed(x, 2, 128, 1e-4),
                   qkv)[1](g)[0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)

    feats = (jax.random.normal(jax.random.fold_in(key, 2), (1, 32, 2 * 2 * 16),
                               jnp.float32),)
    biases = (0.3 * jax.random.normal(jax.random.fold_in(key, 3),
                                      (1, 2, 64, 32), jnp.float32),)
    gq, gf, gb = _xattn_packed_bwd(2, 1e-4, (qkv, feats, biases), g)
    wq, wf, wb = jax.vjp(
        lambda x, fs, bs: _xla_xattn_from_packed(x, fs, bs, 2, 1e-4),
        qkv, feats, biases)[1](g)
    np.testing.assert_allclose(np.asarray(gq), np.asarray(wq), atol=2e-5)
    np.testing.assert_allclose(np.asarray(gf[0]), np.asarray(wf[0]), atol=2e-5)
    np.testing.assert_allclose(np.asarray(gb[0]), np.asarray(wb[0]), atol=2e-5)


@pytest.mark.parametrize("shape,zs", [((2, 256, 2, 64), 0),
                                      ((1, 512, 3, 32), 0),
                                      ((2, 256, 2, 64), 512),
                                      ((1, 1024, 2, 64), 2048),
                                      # H=8 at S=1024: tiles=5 budget forces
                                      # cq=256 — the multi-chunk (4-iter)
                                      # fori_loop backward with dk/dv carry
                                      # accumulation.
                                      ((1, 1024, 8, 16), 64)])
def test_packed_bwd_kernel_interpret_parity(shape, zs):
    """The Pallas packed backward kernel (interpret) equals autodiff of the
    XLA composite."""
    from vivid_tpu.kernels.flash import flash_fused_packed_bwd
    from vivid_tpu.kernels.attention import _xla_self_attention_from_packed
    B, S, H, D = shape
    key = jax.random.PRNGKey(11)
    qkv = jax.random.normal(key, (B, S, 3 * H * D), jnp.float32)
    g = jax.random.normal(jax.random.fold_in(key, 1), (B, S, H * D),
                          jnp.float32)
    got = np.asarray(flash_fused_packed_bwd(qkv, g, H, zero_sink=zs,
                                            interpret=True))
    want = np.asarray(jax.vjp(
        lambda x: _xla_self_attention_from_packed(x, H, zs, 1e-4),
        qkv)[1](g)[0])
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=0)


@pytest.mark.parametrize("B,S,Sf,H,D,n,with_bias",
                         [(2, 256, 256, 2, 64, 2, False),
                          (1, 256, 512, 2, 64, 2, True),
                          (1, 512, 256, 3, 32, 1, True),
                          # H=8, Sk=1536: tiles=5 budget forces cq=128 — the
                          # multi-chunk backward with per-segment dk/dv
                          # accumulation AND chunked dbias writes.
                          (1, 512, 512, 8, 16, 2, True)])
def test_packed_xattn_bwd_kernel_interpret_parity(B, S, Sf, H, D, n,
                                                  with_bias):
    from vivid_tpu.kernels.flash import flash_fused_packed_xattn_bwd
    from vivid_tpu.kernels.attention import _xla_xattn_from_packed
    key = jax.random.PRNGKey(12)
    qkv = jax.random.normal(key, (B, S, 3 * H * D), jnp.float32)
    feats = tuple(jax.random.normal(jax.random.fold_in(key, i + 1),
                                    (B, Sf, 2 * H * D), jnp.float32)
                  for i in range(n))
    biases = tuple(0.5 * jax.random.normal(jax.random.fold_in(key, 10 + i),
                                           (B, H, S, Sf), jnp.float32)
                   for i in range(n)) if with_bias else ()
    g = jax.random.normal(jax.random.fold_in(key, 20), (B, S, H * D),
                          jnp.float32)
    dq, df, db = flash_fused_packed_xattn_bwd(qkv, feats, g, H, biases=biases,
                                              interpret=True)
    wq, wf, wb = jax.vjp(
        lambda x, fs, bs: _xla_xattn_from_packed(x, fs, bs, H, 1e-4),
        qkv, feats, biases)[1](g)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(wq), atol=2e-4)
    for a, b in zip(df, wf):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)
    for a, b in zip(db, wb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_packed_custom_vjp_grad_through_model_path(monkeypatch):
    """jax.grad through self_attention_from_packed with the kernels forced on
    (interpret) equals grad of the XLA composite — the exact train-path
    integration (custom_vjp fwd = packed kernel, bwd = packed bwd kernel)."""
    monkeypatch.setenv("VIVID_PALLAS_INTERPRET", "1")
    from vivid_tpu.kernels.attention import (_xla_self_attention_from_packed,
                                             self_attention_from_packed)
    key = jax.random.PRNGKey(13)
    qkv = jax.random.normal(key, (1, 64, 3 * 2 * 64), jnp.float32)
    tgt = jax.random.normal(jax.random.fold_in(key, 1), (1, 64, 2 * 64),
                            jnp.float32)
    loss = lambda f: lambda x: jnp.sum((f(x) - tgt) ** 2)
    got = jax.grad(loss(lambda x: self_attention_from_packed(x, 2,
                                                             zero_sink=32)))(qkv)
    want = jax.grad(loss(lambda x: _xla_self_attention_from_packed(
        x, 2, 32, 1e-4)))(qkv)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_attention_from_raw_cpu_matches_composite():
    """The dispatcher's fallback (active on CPU) must equal normalize +
    plain attention — this is what every golden test runs through."""
    from vivid_tpu.kernels.attention import attention_from_raw
    from vivid_tpu.nn.blocks import attention, attention_with_zero_sink
    from vivid_tpu.nn.mp import normalize

    key = jax.random.PRNGKey(7)
    q = jax.random.normal(key, (2, 2, 64, 16), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(key, 1), (2, 2, 192, 16),
                          jnp.float32)
    v = jax.random.normal(jax.random.fold_in(key, 2), (2, 2, 192, 16),
                          jnp.float32)
    qn, kn, vn = (normalize(t, axis=-1) for t in (q, k, v))

    got = np.asarray(attention_from_raw(q, k, v))
    want = np.asarray(attention(qn, kn, vn))
    np.testing.assert_allclose(got, want, atol=1e-6)

    got = np.asarray(attention_from_raw(q, k, v, zero_sink=128))
    want = np.asarray(attention_with_zero_sink(qn, kn, vn, 128))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_pallas_raw_backward_matches_autodiff():
    """The custom VJP's backward (vjp of the unfused composite) must match
    direct autodiff of the same math."""
    from vivid_tpu.kernels.attention import _pallas_raw_bwd

    key = jax.random.PRNGKey(3)
    q = jax.random.normal(key, (1, 2, 32, 16), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(key, 1), (1, 2, 96, 16),
                          jnp.float32)
    v = jax.random.normal(jax.random.fold_in(key, 2), (1, 2, 96, 16),
                          jnp.float32)
    g = jax.random.normal(jax.random.fold_in(key, 4), (1, 2, 32, 16),
                          jnp.float32)

    gq, gk, gv, gb = _pallas_raw_bwd(0, 1e-4, (q, k, v, None), g)
    assert gb is None
    want = jax.vjp(lambda q_, k_, v_: _reference(q_, k_, v_, norm_eps=1e-4),
                   q, k, v)[1](g)
    for a, b in zip((gq, gk, gv), want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
