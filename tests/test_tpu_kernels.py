"""Opt-in REAL-TPU kernel validation (the suite normally pins the CPU
backend; these are the chip-parity checks run by hand while building the
packed kernels, codified so any round can re-run them in one command):

    VIVID_TPU_TESTS=1 python -m pytest tests/test_tpu_kernels.py -q

Each test compares the Pallas path against the exact XLA composite ON THE
SAME CHIP (bf16): op-level diffs must stay at bf16-ulp scale, and the
full-model forward must agree above the 40 dB golden gate. Model-level
checks randomize every scalar gain first — fresh EDM2 nets zero-init their
output gains, so F(x) == 0 and a naive parity check passes vacuously."""

import os

import numpy as np
import pytest

RUN = os.environ.get("VIVID_TPU_TESTS") == "1"
pytestmark = pytest.mark.skipif(
    not RUN, reason="real-TPU kernel tests are opt-in (VIVID_TPU_TESTS=1)")

if RUN:
    # A pre-set disable flag would silently turn the op-level comparisons
    # into XLA-vs-XLA (vacuously green); fail loudly instead.
    assert not os.environ.get("VIVID_DISABLE_PALLAS"), \
        "unset VIVID_DISABLE_PALLAS before running the TPU kernel tests"

if RUN:  # keep the CPU-pinned suite from touching the TPU backend
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp_cache"))


def _randomize_gains(params):
    import jax
    import jax.numpy as jnp
    cnt = [0]

    def rnd(x):
        if hasattr(x, "ndim") and x.ndim == 0:
            cnt[0] += 1
            return jnp.asarray(np.random.RandomState(cnt[0]).randn(), x.dtype)
        return x

    out = jax.tree.map(rnd, params)
    assert cnt[0] > 0
    return out


def _psnr(a, b):
    mse = float(np.mean((a - b) ** 2))
    span = float(b.max() - b.min()) or 1.0
    return 10 * np.log10(span ** 2 / max(mse, 1e-20))


@pytest.mark.parametrize("shape,bias_on,zs", [
    ((16, 6, 1024, 3072), False, 0),
    ((4, 6, 1024, 3072), True, 0),
    ((16, 4, 1024, 1024), False, 2048),
    ((16, 3, 256, 768), True, 0),
])
def test_raw_attention_chip_parity(shape, bias_on, zs):
    import jax
    import jax.numpy as jnp
    from vivid_tpu.kernels.attention import (attention_from_raw,
                                             _xla_attention_from_raw)
    assert jax.devices()[0].platform == "tpu"
    B, H, Sq, Sk = shape
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (B, H, Sq, 64), jnp.bfloat16)
    k = jax.random.normal(jax.random.fold_in(key, 1), (B, H, Sk, 64),
                          jnp.bfloat16)
    v = jax.random.normal(jax.random.fold_in(key, 2), (B, H, Sk, 64),
                          jnp.bfloat16)
    bias = (0.3 * jax.random.normal(jax.random.fold_in(key, 3),
                                    (B, H, Sq, Sk), jnp.float32)
            if bias_on else None)
    got = np.asarray(jax.jit(
        lambda *a: attention_from_raw(*a, zero_sink=zs))(q, k, v, bias),
        np.float32)
    os.environ["VIVID_DISABLE_PALLAS"] = "1"
    try:
        want = np.asarray(jax.jit(
            lambda *a: _xla_attention_from_raw(*a, zs))(q, k, v, bias),
            np.float32)
    finally:
        del os.environ["VIVID_DISABLE_PALLAS"]
    assert np.abs(got - want).max() < 0.02


@pytest.mark.parametrize("shape,zs", [
    ((4, 1024, 6), 0),
    ((4, 1024, 4), 2048),
    ((2, 256, 3), 0),
])
def test_packed_bwd_chip_parity(shape, zs):
    """jax.grad through self_attention_from_packed ON THE CHIP: the packed
    Pallas backward kernel (the default train path) vs the XLA composite's
    autodiff. Interpret-mode parity exists (test_flash_fused) but does not
    exercise Mosaic compilation/tiling/bf16 lane behavior."""
    import jax
    import jax.numpy as jnp
    from vivid_tpu.kernels.attention import self_attention_from_packed
    assert jax.devices()[0].platform == "tpu"
    B, S, H = shape
    qkv = jax.random.normal(jax.random.PRNGKey(0), (B, S, 3 * H * 64),
                            jnp.bfloat16)

    def loss(x):
        o = self_attention_from_packed(x, H, zero_sink=zs)
        return jnp.sum(o.astype(jnp.float32) * jnp.cos(
            jnp.arange(o.size, dtype=jnp.float32).reshape(o.shape) * 0.01))

    got = np.asarray(jax.jit(jax.grad(loss))(qkv), np.float32)
    os.environ["VIVID_DISABLE_PALLAS"] = "1"
    try:
        want = np.asarray(jax.jit(jax.grad(lambda x: loss(x) * 1.0))(qkv),
                          np.float32)
    finally:
        del os.environ["VIVID_DISABLE_PALLAS"]
    assert np.abs(want).max() > 0, "vacuous gradient"
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel < 2e-2, f"rel L2 {rel:.4f}"
    assert np.abs(got - want).max() < 0.05


@pytest.mark.parametrize("bias_on,n_src", [(False, 2), (True, 2), (False, 1)])
def test_packed_xattn_bwd_chip_parity(bias_on, n_src):
    """Same as above for the cross-attention packed backward: dqkv, dfeats
    and (epipolar) dbias all match the XLA composite's autodiff on-chip."""
    import jax
    import jax.numpy as jnp
    from vivid_tpu.kernels.attention import xattn_from_packed
    assert jax.devices()[0].platform == "tpu"
    B, S, Sf, H = 2, 1024, 1024, 4
    key = jax.random.PRNGKey(0)
    qkv = jax.random.normal(key, (B, S, 3 * H * 64), jnp.bfloat16)
    feats = tuple(
        jax.random.normal(jax.random.fold_in(key, i), (B, Sf, 2 * H * 64),
                          jnp.bfloat16) for i in range(n_src))
    biases = tuple(
        0.3 * jax.random.normal(jax.random.fold_in(key, 10 + i),
                                (B, H, S, Sf), jnp.float32)
        for i in range(n_src)) if bias_on else ()

    def loss(x, f, bs):
        o = xattn_from_packed(x, f, H, biases=bs)
        return jnp.sum(o.astype(jnp.float32) * jnp.cos(
            jnp.arange(o.size, dtype=jnp.float32).reshape(o.shape) * 0.01))

    argnums = (0, 1, 2) if bias_on else (0, 1)
    got = jax.jit(jax.grad(loss, argnums=argnums))(qkv, feats, biases)
    os.environ["VIVID_DISABLE_PALLAS"] = "1"
    try:
        want = jax.jit(jax.grad(lambda *a: loss(*a) * 1.0,
                                argnums=argnums))(qkv, feats, biases)
    finally:
        del os.environ["VIVID_DISABLE_PALLAS"]
    for g, w in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
        g, w = np.asarray(g, np.float32), np.asarray(w, np.float32)
        assert np.abs(w).max() > 0, "vacuous gradient leaf"
        rel = np.linalg.norm(g - w) / np.linalg.norm(w)
        assert rel < 2e-2, f"rel L2 {rel:.4f}"


def test_full_model_grad_chip_parity():
    """Per-parameter gradients of a scalar loss through the full dual-source
    model agree on-chip between the packed Pallas train path and the XLA
    fallback — the whole-model integration of the backward kernels."""
    import jax
    import jax.numpy as jnp
    from vivid_tpu.nn.precond import (PrecondConfig, precond_apply,
                                      precond_init)
    cfg = PrecondConfig(img_resolution=64, num_sources=2, model_channels=64,
                        extra_attn=1, use_bf16=True, remat=False,
                        epipolar_attention_bias=True)
    params = _randomize_gains(precond_init(jax.random.PRNGKey(0), cfg))
    key = jax.random.PRNGKey(1)
    b = 2
    src = jax.random.normal(key, (b, 2, 64, 64, 3))
    dst = jax.random.normal(jax.random.fold_in(key, 1), (b, 64, 64, 3))
    sigma = jnp.exp(jax.random.normal(jax.random.fold_in(key, 2), (b,)))
    geo = 0.3 * jax.random.normal(jax.random.fold_in(key, 3), (b, 2, 20))
    tgt = jax.random.normal(jax.random.fold_in(key, 4), dst.shape)

    def loss(p, mul):
        out = precond_apply(p, cfg, src, dst, sigma, geo)
        return jnp.mean((out - tgt) ** 2) * mul

    ga = jax.jit(jax.grad(loss))(params, 1.0)
    os.environ["VIVID_DISABLE_PALLAS"] = "1"
    try:
        gc = jax.jit(jax.grad(loss))(params, 1.0 + 0.0)
    finally:
        del os.environ["VIVID_DISABLE_PALLAS"]
    flat_a = np.concatenate([np.asarray(x, np.float64).ravel()
                             for x in jax.tree.leaves(ga)])
    flat_c = np.concatenate([np.asarray(x, np.float64).ravel()
                             for x in jax.tree.leaves(gc)])
    assert np.abs(flat_c).max() > 0, "vacuous gradient"
    rel = np.linalg.norm(flat_a - flat_c) / np.linalg.norm(flat_c)
    assert rel < 2e-2, f"whole-tree grad rel L2 {rel:.4f}"


@pytest.mark.parametrize("uncond,epipolar,cph", [
    (False, False, 64), (True, False, 64), (False, True, 64),
    (False, False, 32),
])
def test_full_model_chip_parity(uncond, epipolar, cph):
    import jax
    import jax.numpy as jnp
    from vivid_tpu.nn.precond import (PrecondConfig, precond_apply,
                                      precond_init)
    cfg = PrecondConfig(img_resolution=64, num_sources=2, model_channels=64,
                        extra_attn=1, use_bf16=True, remat=False,
                        uncond=uncond, epipolar_attention_bias=epipolar,
                        channels_per_head=cph)
    params = _randomize_gains(precond_init(jax.random.PRNGKey(0), cfg))
    key = jax.random.PRNGKey(1)
    b = 4
    src = jax.random.normal(key, (b, 2, 64, 64, 3))
    dst = jax.random.normal(jax.random.fold_in(key, 1), (b, 64, 64, 3))
    sigma = jnp.exp(jax.random.normal(jax.random.fold_in(key, 2), (b,)))
    geo = 0.3 * jax.random.normal(jax.random.fold_in(key, 3), (b, 2, 20))

    f1 = jax.jit(lambda p, s, d, sg, g: precond_apply(p, cfg, s, d, sg, g))
    a = np.asarray(f1(params, src, dst, sigma, geo), np.float64)
    os.environ["VIVID_DISABLE_PALLAS"] = "1"
    try:
        f2 = jax.jit(
            lambda p, s, d, sg, g: precond_apply(p, cfg, s, d, sg, g) * 1.0)
        c = np.asarray(f2(params, src, dst, sigma, geo), np.float64)
    finally:
        del os.environ["VIVID_DISABLE_PALLAS"]
    d = np.abs(a - c)
    assert (d > 0).mean() > 0.5, "vacuous comparison — U-Net output inert"
    assert _psnr(a, c) > 40, f"PSNR {_psnr(a, c):.1f} dB"


@pytest.mark.parametrize("shape,zs,n_feats", [
    ((4, 1024, 4), 0, 0),       # base-model self-attention level
    ((4, 1024, 4), 2048, 0),    # uncond zero-sink
    ((2, 1024, 4), 0, 2),       # dual-source joint xattn
    ((4, 256, 6), 0, 2),        # mid level
])
def test_nomax_packed_chip_parity(shape, zs, n_feats):
    """flash_nomax_packed (grid-pipelined packed forward, VIVID_NOMAX_PACKED
    route) vs the whole-row packed kernel AND the XLA composite on the chip
    at production shapes."""
    import jax
    import jax.numpy as jnp
    from vivid_tpu.kernels.attention import (_xla_self_attention_from_packed,
                                             _xla_xattn_from_packed)
    from vivid_tpu.kernels.flash import (flash_fused_packed,
                                         flash_fused_packed_xattn,
                                         flash_nomax_packed)
    assert jax.devices()[0].platform == "tpu"
    B, S, H = shape
    key = jax.random.PRNGKey(3)
    qkv = jax.random.normal(key, (B, S, 3 * H * 64), jnp.bfloat16)
    feats = tuple(
        jax.random.normal(jax.random.fold_in(key, i), (B, S, 2 * H * 64),
                          jnp.bfloat16) for i in range(n_feats))
    if n_feats:
        got = np.asarray(jax.jit(lambda x, f: flash_nomax_packed(
            x, f, H, norm_eps=1e-4))(qkv, feats), np.float32)
        whole = np.asarray(jax.jit(lambda x, f: flash_fused_packed_xattn(
            x, f, H, norm_eps=1e-4))(qkv, feats), np.float32)
        want = np.asarray(jax.jit(lambda x, f: _xla_xattn_from_packed(
            x, f, (), H, 1e-4))(qkv, feats), np.float32)
    else:
        got = np.asarray(jax.jit(lambda x: flash_nomax_packed(
            x, (), H, norm_eps=1e-4, zero_sink=zs))(qkv), np.float32)
        whole = np.asarray(jax.jit(lambda x: flash_fused_packed(
            x, H, norm_eps=1e-4, zero_sink=zs))(qkv), np.float32)
        want = np.asarray(jax.jit(lambda x: _xla_self_attention_from_packed(
            x, H, zs, 1e-4))(qkv), np.float32)
    assert np.abs(got - whole).max() < 0.01   # same math, other schedule
    assert np.abs(got - want).max() < 0.02


@pytest.mark.parametrize("shape", [
    (2, 4, 4096, 8192, 32),    # SR 64x64-level xattn shape (d=32)
    (1, 2, 4096, 4096, 64),    # big-S d=64 (SR encoder-level)
])
def test_nomax_chip_parity(shape):
    """flash_nomax (the big-S no-max kernel on the SR serving path) vs the
    einsum reference ON THE CHIP, with pixel-normalized q/k as the
    production sites guarantee (the constant softmax shift sqrt(D) is only
    exact under that bound)."""
    import jax
    import jax.numpy as jnp
    from vivid_tpu.kernels.attention import reference_attention
    from vivid_tpu.kernels.flash import flash_nomax
    from vivid_tpu.nn.mp import normalize
    assert jax.devices()[0].platform == "tpu"
    B, H, Sq, Sk, D = shape
    key = jax.random.PRNGKey(0)
    q = normalize(jax.random.normal(key, (B, H, Sq, D), jnp.bfloat16),
                  axis=-1)
    k = normalize(jax.random.normal(jax.random.fold_in(key, 1),
                                    (B, H, Sk, D), jnp.bfloat16), axis=-1)
    v = jax.random.normal(jax.random.fold_in(key, 2), (B, H, Sk, D),
                          jnp.bfloat16)
    got = np.asarray(jax.jit(flash_nomax)(q, k, v), np.float32)
    want = np.asarray(jax.jit(reference_attention)(q, k, v), np.float32)
    assert np.abs(got - want).max() < 0.02


def test_nomax_biased_chip_parity():
    """Biased flash_nomax (dynamic shift = sqrt(D)+max(bias) through SMEM —
    the epipolar big-S path) vs the einsum reference ON THE CHIP. The bias
    mimics get_epipolar_attn's form including a positive learned offset
    that breaks the static sqrt(D) bound."""
    import jax
    import jax.numpy as jnp
    from vivid_tpu.kernels.attention import reference_attention
    from vivid_tpu.kernels.flash import flash_nomax
    from vivid_tpu.nn.mp import normalize
    assert jax.devices()[0].platform == "tpu"
    B, H, Sq, Sk, D = 1, 2, 4096, 8192, 32
    key = jax.random.PRNGKey(2)
    q = normalize(jax.random.normal(key, (B, H, Sq, D), jnp.bfloat16),
                  axis=-1)
    k = normalize(jax.random.normal(jax.random.fold_in(key, 1),
                                    (B, H, Sk, D), jnp.bfloat16), axis=-1)
    v = jax.random.normal(jax.random.fold_in(key, 2), (B, H, Sk, D),
                          jnp.bfloat16)
    bias = (3.0 * jax.nn.sigmoid(jax.random.normal(
        jax.random.fold_in(key, 3), (B, H, Sq, Sk))) + 2.5).astype(
        jnp.float32)
    got = np.asarray(jax.jit(flash_nomax)(q, k, v, bias), np.float32)
    want = np.asarray(jax.jit(reference_attention)(q, k, v, bias),
                      np.float32)
    assert np.abs(got - want).max() < 0.02


def test_nomax_dispatch_grad_chip():
    """_attention_local routes big-S unbiased shapes to the no-max kernel;
    its custom_vjp keeps the stock flash backward. Chip check: forward
    matches einsum, gradient matches the einsum gradient."""
    import jax
    import jax.numpy as jnp
    from vivid_tpu.kernels.attention import (_attention_local,
                                             reference_attention)
    from vivid_tpu.nn.mp import normalize
    assert jax.devices()[0].platform == "tpu"
    B, H, Sq, Sk, D = 1, 2, 4096, 4096, 32
    key = jax.random.PRNGKey(1)
    q = normalize(jax.random.normal(key, (B, H, Sq, D), jnp.float32),
                  axis=-1).astype(jnp.bfloat16)
    k = normalize(jax.random.normal(jax.random.fold_in(key, 1),
                                    (B, H, Sk, D), jnp.float32),
                  axis=-1).astype(jnp.bfloat16)
    v = jax.random.normal(jax.random.fold_in(key, 2), (B, H, Sk, D),
                          jnp.bfloat16)

    def loss(fn, q_, k_, v_):
        return jnp.sum(jnp.square(fn(q_, k_, v_).astype(jnp.float32)))

    g_new = jax.jit(jax.grad(lambda *a: loss(_attention_local, *a),
                             argnums=(0, 1, 2)))(q, k, v)
    g_ref = jax.jit(jax.grad(lambda *a: loss(reference_attention, *a),
                             argnums=(0, 1, 2)))(q, k, v)
    for a, b in zip(g_new, g_ref):
        na, nb = np.asarray(a, np.float32), np.asarray(b, np.float32)
        denom = np.abs(nb).max() + 1e-6
        assert np.abs(na - nb).max() / denom < 3e-2
