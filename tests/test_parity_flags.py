"""Feature-flag parity tests: epipolar bias, depth channels, warped
coordinates, no_time_enc, force_wn, CLI config resolution."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vivid_tpu.nn.precond import PrecondConfig, precond_apply, precond_init

TINY = dict(model_channels=16, channel_mult=(1, 2), num_blocks=1,
            attn_resolutions=(8,), channels_per_head=8, use_bf16=False)


def _batch(key, b=2, srcs=2, res=16, src_ch=3):
    ks = jax.random.split(key, 4)
    return (jax.random.normal(ks[0], (b, srcs, res, res, src_ch)),
            jax.random.normal(ks[1], (b, res, res, 3)),
            jnp.exp(jax.random.normal(ks[2], (b,))),
            jax.random.normal(ks[3], (b, srcs, 20)) * 0.1)


def test_epipolar_attention_bias_flag():
    cfg = PrecondConfig(img_resolution=16, num_sources=2,
                        epipolar_attention_bias=True, **TINY)
    params = precond_init(jax.random.PRNGKey(0), cfg)
    # epipolar_mixing present in every xattn block.
    xattn_blocks = [k for k in params["unet"]
                    if isinstance(params["unet"][k], dict)
                    and "x_attn_kv" in params["unet"][k]]
    assert xattn_blocks
    for k in xattn_blocks:
        assert "epipolar_mixing" in params["unet"][k]
        assert params["unet"][k]["epipolar_mixing"].shape[0] == 4
    src, dst, sigma, geo = _batch(jax.random.PRNGKey(1))
    D = precond_apply(params, cfg, src, dst, sigma, geo)
    assert D.shape == (2, 16, 16, 3)
    assert bool(jnp.all(jnp.isfinite(D)))
    # Zero-init mixing -> bias is exactly zero -> matches the no-flag model
    # with identical weights (same init key, flag off shares param shapes
    # except the extra mixing leaf).
    cfg_off = PrecondConfig(img_resolution=16, num_sources=2, **TINY)
    params_off = jax.tree.map(lambda x: x, params)
    for k in xattn_blocks:
        params_off["unet"][k] = {kk: v for kk, v in params["unet"][k].items()
                                 if kk != "epipolar_mixing"}
    D_off = precond_apply(params_off, cfg_off, src, dst, sigma, geo)
    np.testing.assert_allclose(np.asarray(D), np.asarray(D_off),
                               rtol=1e-4, atol=1e-5)


def test_warp_depth_coor_forward():
    cfg = PrecondConfig(img_resolution=16, num_sources=2,
                        warp_depth_coor=True, **TINY)
    params = precond_init(jax.random.PRNGKey(0), cfg)
    src, dst, sigma, geo = _batch(jax.random.PRNGKey(1), src_ch=4)  # rgb+depth
    src = src.at[..., 3].set(jnp.abs(src[..., 3]) + 1.0)            # positive depth
    D = precond_apply(params, cfg, src, dst, sigma, geo)
    assert D.shape == (2, 16, 16, 3)
    assert bool(jnp.all(jnp.isfinite(D)))
    # Requires the depth channel.
    with pytest.raises(AssertionError):
        bad_src = src[..., :3]
        precond_apply(params, cfg, bad_src, dst, sigma, geo)


def test_depth_input_channel_count():
    cfg = PrecondConfig(img_resolution=16, num_sources=2, depth_input=True, **TINY)
    params = precond_init(jax.random.PRNGKey(0), cfg)
    src, dst, sigma, geo = _batch(jax.random.PRNGKey(1), src_ch=4)
    D = precond_apply(params, cfg, src, dst, sigma, geo)
    assert D.shape == (2, 16, 16, 3)


def test_no_time_enc_encoder_ignores_sigma():
    cfg = PrecondConfig(img_resolution=16, num_sources=2, no_time_enc=True, **TINY)
    params = precond_init(jax.random.PRNGKey(0), cfg)
    src, dst, _, geo = _batch(jax.random.PRNGKey(1))
    f1 = precond_apply(params, cfg, src, dst, jnp.full((2,), 0.5), geo,
                       return_features=True)
    f2 = precond_apply(params, cfg, src, dst, jnp.full((2,), 7.0), geo,
                       return_features=True)
    for a, b in zip(f1, f2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_force_wn_toggle_in_train_step():
    from vivid_tpu.diffusion.loss import NVLoss
    from vivid_tpu.train.step import TrainConfig, init_train_state, make_train_step
    cfg = PrecondConfig(img_resolution=16, num_sources=2, force_wn=True, **TINY)
    params = precond_init(jax.random.PRNGKey(0), cfg)
    tcfg = TrainConfig(batch_size=2, ema_stds=(0.05,), force_wn=True,
                       ref_lr=1e-2, rampup_Mimg=0)
    step = make_train_step(NVLoss(), cfg, tcfg, (3.0,))
    src, dst, sigma, geo = _batch(jax.random.PRNGKey(1))
    state, _ = step(init_train_state(params, tcfg),
                    {"src": src, "tgt": dst, "geometry": geo},
                    jax.random.PRNGKey(2))
    # Every conv weight leaf must be exactly RMS-normalized after the step.
    w = state.params["unet"]["out_conv"]["w"]
    norms = jnp.linalg.norm(np.asarray(w).reshape(-1, w.shape[-1]), axis=0)
    fan_in = w.shape[0] * w.shape[1] * w.shape[2]
    np.testing.assert_allclose(norms, np.full(w.shape[-1], np.sqrt(fan_in)),
                               rtol=1e-3)


def test_cli_config_resolution():
    from vivid_tpu.cli.train_nvs import setup_training_config, parse_nimg
    assert parse_nimg("4Ki") == 4096
    assert parse_nimg("2Mi") == 2 << 20
    c = setup_training_config(preset="vivid-base", data="/x")
    assert c.batch_size == 1024
    assert c.network_kwargs.model_channels == 128
    assert c.network_kwargs.extra_attn == 1
    assert c.loss_kwargs.P_mean == -0.8
    assert c.lr_kwargs.ref_lr == 0.012
    assert c.network_kwargs.num_sources == 2
    c2 = setup_training_config(preset="vivid-uncond", data="/x")
    assert c2.network_kwargs.uncond is True
    c3 = setup_training_config(preset="vivid-sr", data="/x")
    assert c3.network_kwargs.super_res is True
    assert c3.network_kwargs.model_channels == 64
    assert c3.batch_size == 128
    # The preset builds the SHIPPED log-parity SR arch (PARITY.md): vanilla
    # single-source, labels 20/20, extra_attn=1.
    assert c3.vanilla_mode is True
    assert c3.network_kwargs.num_sources == 1
    assert c3.network_kwargs.target_label_dim == 20
    assert c3.network_kwargs.extra_attn == 1
    c4 = setup_training_config(preset="vivid-base", data="/x", vanilla_mode=True)
    assert c4.network_kwargs.num_sources == 1
    assert c4.network_kwargs.target_label_dim == 20


def test_sigterm_requests_suspend():
    import os
    import signal
    from vivid_tpu.core import dist
    dist._should_suspend = False
    dist.init()
    os.kill(os.getpid(), signal.SIGTERM)
    assert dist.should_suspend()
    dist._should_suspend = False
