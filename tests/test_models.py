"""Model architecture tests: shapes, param-count parity with the reference's
profiled sizes (visualize.json / experiments/log.txt), and forward smoke tests
on tiny configs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vivid_tpu.nn.blocks import BlockConfig, block_apply, block_init
from vivid_tpu.nn.precond import (NVPrecond, PrecondConfig, precond_apply,
                                  precond_init, zero_features)
from vivid_tpu.nn.unet import (UNetConfig, attention_feature_spec, build_plan,
                               unet_apply, unet_init)


def n_params(tree):
    return sum(x.size for x in jax.tree.leaves(tree))


def n_trainable(tree):
    # Fourier freqs/phases are non-trainable buffers in the reference count.
    def walk(d, path=()):
        total = 0
        for k, v in d.items():
            if isinstance(v, dict):
                total += walk(v, path + (k,))
            elif not any("fourier" in p for p in path + (k,)):
                total += v.size
        return total
    return walk(tree)


TINY = dict(model_channels=16, channel_mult=(1, 2), num_blocks=1,
            attn_resolutions=(8,), channels_per_head=8)


def test_block_shapes_plain():
    cfg = BlockConfig(in_channels=8, out_channels=16, emb_channels=32,
                      flavor="enc", attention=True, channels_per_head=8)
    params = block_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 8))
    emb = jax.random.normal(jax.random.PRNGKey(2), (2, 32))
    y = block_apply(params, cfg, x, emb)
    assert y.shape == (2, 8, 8, 16)
    assert bool(jnp.all(jnp.abs(y) <= 256))


def test_block_resample_shapes():
    cfg_d = BlockConfig(8, 8, 32, flavor="enc", resample_mode="down")
    cfg_u = BlockConfig(8, 8, 32, flavor="dec", resample_mode="up")
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 8))
    emb = jax.random.normal(jax.random.PRNGKey(2), (2, 32))
    y = block_apply(block_init(jax.random.PRNGKey(0), cfg_d), cfg_d, x, emb)
    assert y.shape == (2, 4, 4, 8)
    y = block_apply(block_init(jax.random.PRNGKey(0), cfg_u), cfg_u, x, emb)
    assert y.shape == (2, 16, 16, 8)


def test_xattn_block_two_sources():
    cfg = BlockConfig(16, 16, 32, flavor="dec", attention=True, xattn=True,
                      num_cross_sources=2, channels_per_head=8)
    params = block_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 16))
    emb = jax.random.normal(jax.random.PRNGKey(2), (2, 32))
    feats = [jax.random.normal(jax.random.PRNGKey(3 + i), (2, 8, 8, 16))
             for i in range(2)]
    y = block_apply(params, cfg, x, emb, features=feats)
    assert y.shape == (2, 8, 8, 16)
    assert "x_attn_kv" in params


def test_unet_forward_and_magnitude():
    cfg = UNetConfig(img_resolution=16, img_channels=3, label_dim=20,
                     kind="unet", **TINY)
    params = unet_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
    y = unet_apply(params, cfg, x, jnp.zeros(2), jnp.zeros((2, 20)))
    assert y.shape == (2, 16, 16, 3)
    # out_gain is zero-initialized -> output must be exactly zero.
    assert bool(jnp.all(y == 0))


def test_encoder_feature_contract_matches_xattn():
    enc_cfg = UNetConfig(img_resolution=16, img_channels=3, label_dim=20,
                         kind="encoder", **TINY)
    x_cfg = UNetConfig(img_resolution=16, img_channels=3, label_dim=40,
                       kind="xattn", num_cross_sources=2, **TINY)
    spec_enc = attention_feature_spec(enc_cfg)
    spec_x = attention_feature_spec(x_cfg)
    assert len(spec_enc) == len(spec_x)
    for (_, c1, r1), (_, c2, r2) in zip(spec_enc, spec_x):
        assert (c1, r1) == (c2, r2)

    params = unet_init(jax.random.PRNGKey(0), enc_cfg)
    src = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
    feats = unet_apply(params, enc_cfg, src, jnp.zeros(2), jnp.zeros((2, 20)))
    assert len(feats) == len(spec_enc)
    for f, (_, c, r) in zip(feats, spec_enc):
        assert f.shape == (2, r, r, c)


def test_precond_dual_source_forward():
    cfg = PrecondConfig(img_resolution=16, num_sources=2,
                        source_label_dim=20, target_label_dim=40,
                        use_bf16=False, **TINY)
    params = precond_init(jax.random.PRNGKey(0), cfg)
    src = jax.random.normal(jax.random.PRNGKey(1), (2, 2, 16, 16, 3))
    dst = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 16, 3))
    sigma = jnp.exp(jax.random.normal(jax.random.PRNGKey(3), (2,)))
    geo = jax.random.normal(jax.random.PRNGKey(4), (2, 2, 20))
    D, logvar = precond_apply(params, cfg, src, dst, sigma, geo, return_logvar=True)
    assert D.shape == (2, 16, 16, 3)
    assert logvar.shape == (2, 1, 1, 1)
    assert D.dtype == jnp.float32
    # With out_gain == 0, D_x == c_skip * dst exactly.
    sd = cfg.sigma_data
    s = np.asarray(sigma).reshape(-1, 1, 1, 1)
    np.testing.assert_allclose(np.asarray(D), sd**2 / (s**2 + sd**2) * np.asarray(dst),
                               rtol=1e-4, atol=1e-5)


def test_precond_uncond_zero_features():
    cfg = PrecondConfig(img_resolution=16, num_sources=2, uncond=True,
                        use_bf16=False, **TINY)
    params = precond_init(jax.random.PRNGKey(0), cfg)
    assert "encoder" not in params
    dst = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 16, 3))
    sigma = jnp.ones((2,))
    D = precond_apply(params, cfg, None, dst, sigma, None)
    assert D.shape == (2, 16, 16, 3)
    feats = zero_features(cfg, 2, jnp.float32)
    for f in feats:
        assert f.shape[1] == 2 and bool(jnp.all(f == 0))


def test_precond_vanilla_single_source():
    cfg = PrecondConfig(img_resolution=16, num_sources=1,
                        source_label_dim=20, target_label_dim=20,
                        use_bf16=False, **TINY)
    params = precond_init(jax.random.PRNGKey(0), cfg)
    src = jax.random.normal(jax.random.PRNGKey(1), (2, 1, 16, 16, 3))
    dst = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 16, 3))
    D = precond_apply(params, cfg, src, dst, jnp.ones((2,)),
                      jax.random.normal(jax.random.PRNGKey(3), (2, 1, 20)))
    assert D.shape == (2, 16, 16, 3)


def test_precond_super_res():
    cfg = PrecondConfig(img_resolution=16, num_sources=2, super_res=True,
                        noisy_sr=0.25, use_bf16=False, **TINY)
    params = precond_init(jax.random.PRNGKey(0), cfg)
    src = jax.random.normal(jax.random.PRNGKey(1), (2, 2, 16, 16, 3))
    dst = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 16, 3))
    cond = jax.random.normal(jax.random.PRNGKey(3), (2, 16, 16, 3))
    D = precond_apply(params, cfg, src, dst, jnp.ones((2,)),
                      jax.random.normal(jax.random.PRNGKey(4), (2, 2, 20)),
                      conditioning_image=cond, rng=jax.random.PRNGKey(5))
    assert D.shape == (2, 16, 16, 3)


def test_precond_inject_features_matches_encode():
    cfg = PrecondConfig(img_resolution=16, num_sources=2, no_time_enc=True,
                        use_bf16=False, **TINY)
    params = precond_init(jax.random.PRNGKey(0), cfg)
    src = jax.random.normal(jax.random.PRNGKey(1), (2, 2, 16, 16, 3))
    dst = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 16, 3))
    geo = jax.random.normal(jax.random.PRNGKey(3), (2, 2, 20))
    sigma = jnp.ones((2,))
    feats = precond_apply(params, cfg, src, dst, sigma, geo, return_features=True)
    d1 = precond_apply(params, cfg, src, dst, sigma, geo)
    d2 = precond_apply(params, cfg, src, dst, sigma, geo, inject_features=feats)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_scan_blocks_bitwise_equivalence():
    """scan_blocks=True (lax.scan over equal-config block runs — the
    compile-size lever) must reproduce the unrolled forward exactly, for
    both the dual-source net and the uncond zero-sink path."""
    import dataclasses
    cfg = PrecondConfig(img_resolution=32, num_sources=2, model_channels=16,
                        channel_mult=(1, 2), num_blocks=3,
                        attn_resolutions=(16, 8), channels_per_head=8,
                        extra_attn=1, use_bf16=False)
    params = precond_init(jax.random.PRNGKey(0), cfg)
    key = jax.random.PRNGKey(1)
    b = 2
    src = jax.random.normal(key, (b, 2, 32, 32, 3))
    dst = jax.random.normal(jax.random.fold_in(key, 1), (b, 32, 32, 3))
    sigma = jnp.exp(jax.random.normal(jax.random.fold_in(key, 2), (b,)))
    geo = jax.random.normal(jax.random.fold_in(key, 3), (b, 2, 20))
    o1 = precond_apply(params, cfg, src, dst, sigma, geo)
    o2 = precond_apply(params, dataclasses.replace(cfg, scan_blocks=True),
                       src, dst, sigma, geo)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))

    ucfg = dataclasses.replace(cfg, uncond=True)
    uparams = precond_init(jax.random.PRNGKey(2), ucfg)
    u1 = precond_apply(uparams, ucfg, None, dst, sigma, None)
    u2 = precond_apply(uparams, dataclasses.replace(ucfg, scan_blocks=True),
                       None, dst, sigma, None)
    np.testing.assert_array_equal(np.asarray(u1), np.asarray(u2))


def test_scan_blocks_grad_equivalence():
    """Gradients through the scanned runs must match the unrolled graph
    (protects training with scan_blocks=True)."""
    import dataclasses
    cfg = PrecondConfig(img_resolution=16, num_sources=2, model_channels=16,
                        channel_mult=(1, 2), num_blocks=2,
                        attn_resolutions=(8,), channels_per_head=8,
                        use_bf16=False, remat=True)
    params = precond_init(jax.random.PRNGKey(0), cfg)
    key = jax.random.PRNGKey(1)
    b = 2
    src = jax.random.normal(key, (b, 2, 16, 16, 3))
    dst = jax.random.normal(jax.random.fold_in(key, 1), (b, 16, 16, 3))
    sigma = jnp.exp(jax.random.normal(jax.random.fold_in(key, 2), (b,)))
    geo = jax.random.normal(jax.random.fold_in(key, 3), (b, 2, 20))

    def loss(p, c):
        return jnp.sum(precond_apply(p, c, src, dst, sigma, geo) ** 2)

    g1 = jax.grad(loss)(params, cfg)
    g2 = jax.grad(loss)(params, dataclasses.replace(cfg, scan_blocks=True))
    for (p1, l1), (p2, l2) in zip(
            jax.tree_util.tree_flatten_with_path(g1)[0],
            jax.tree_util.tree_flatten_with_path(g2)[0]):
        assert p1 == p2
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                                   rtol=1e-5, atol=1e-6,
                                   err_msg=jax.tree_util.keystr(p1))


def test_param_count_parity_base_channels64():
    """The reference profile (visualize.json) reports NVPrecond at
    model_channels=64, dual-source: 62.67M params total, encoder 29.85M,
    unet 32.82M (trainable, excluding Fourier buffers)."""
    cfg = PrecondConfig(img_resolution=64, num_sources=2, model_channels=64,
                        extra_attn=1, source_label_dim=20, target_label_dim=40)
    params = precond_init(jax.random.PRNGKey(0), cfg)
    enc = n_trainable(params["encoder"])
    unet = n_trainable(params["unet"])
    total = n_trainable(params)
    assert abs(enc / 29.85e6 - 1) < 0.01, f"encoder params {enc}"
    assert abs(unet / 32.82e6 - 1) < 0.01, f"unet params {unet}"
    assert abs(total / 62.67e6 - 1) < 0.01, f"total params {total}"


@pytest.mark.slow
def test_param_count_parity_sr_in0_reading():
    """Reference NVPrecond at the reference's LIVE vivid-sr preset reading
    (dual-source, no extra_attn) counts exactly 38,198,325 trainable params
    (verified against the torch implementation); the shipped model is the
    57.5M log-parity arch tested below."""
    cfg = PrecondConfig(img_resolution=256, num_sources=2, model_channels=64,
                        super_res=True, noisy_sr=0.25)
    params = precond_init(jax.random.PRNGKey(0), cfg)
    assert n_trainable(params) == 38_198_325


@pytest.mark.slow
def test_param_count_parity_sr_preset_log():
    """The vivid-sr training preset must build the SHIPPED SR architecture
    (experiments/log.txt:791: 57,549,187 params — vanilla single-source,
    labels 20/20, extra_attn=1). The logged profile's first conv shows
    cin=4, i.e. the profiled module was built WITHOUT the 3 SR-conditioning
    input channels a functional super-res forward requires (PARITY.md "SR
    architecture archaeology"); a runnable model therefore carries exactly
    3*3*3*64 = 1,728 params more. Goes through the real CLI config assembly
    so preset/NVPrecond wiring drift is caught, not just the raw config."""
    from vivid_tpu.cli.train_nvs import setup_training_config
    c = setup_training_config(preset="vivid-sr", data="/nonexistent")
    assert c.vanilla_mode and c.sr_training
    net = dict(c.network_kwargs)
    net.setdefault("img_resolution", 256)
    cfg = PrecondConfig(**net)
    params = precond_init(jax.random.PRNGKey(0), cfg)
    first_conv_widening = 3 * 3 * 3 * cfg.model_channels
    assert n_trainable(params) == 57_549_187 + first_conv_widening, \
        n_trainable(params)
