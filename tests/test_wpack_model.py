"""Model-level parity of the width-packed level-0 execution: a full
NVPrecond forward (SR config included) with UNetConfig.wpack=True must match
wpack=False to float tolerance (the packed conv math itself is exact —
tests/test_wpack.py — so model-level differences could only come from wiring
mistakes: gains, norms, skips, edge convs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vivid_tpu.nn.precond import PrecondConfig, precond_apply, precond_init


def _psnr(a, b):
    mse = float(np.mean((np.asarray(a, np.float64) - np.asarray(b)) ** 2))
    span = float(np.asarray(b, np.float64).max()
                 - np.asarray(b, np.float64).min()) or 1.0
    return 10 * np.log10(span ** 2 / max(mse, 1e-30))


def _fwd(cfg, sr):
    key = jax.random.PRNGKey(0)
    params = precond_init(key, cfg)
    b, res = 2, cfg.img_resolution
    src = jax.random.normal(jax.random.fold_in(key, 1), (b, 2, res, res, 3))
    dst = jax.random.normal(jax.random.fold_in(key, 2), (b, res, res, 3))
    sigma = jnp.asarray([0.5, 2.0])
    geometry = jax.random.normal(jax.random.fold_in(key, 3), (b, 2, 20))
    kw = {}
    if sr:
        kw = dict(conditioning_image=jax.random.normal(
            jax.random.fold_in(key, 4), (b, res, res, 3)),
            rng=jax.random.PRNGKey(7))
    return precond_apply(params, cfg, src, dst, sigma, geometry, **kw)


@pytest.mark.parametrize("sr", [False, True])
def test_wpack_model_parity(sr):
    # Small-but-even resolution; wpack forced on (default is OFF everywhere).
    common = dict(img_resolution=32, num_sources=2, model_channels=16,
                  channel_mult=(1, 2), num_blocks=2, attn_resolutions=(16,),
                  channels_per_head=8, use_bf16=False, remat=False,
                  super_res=sr)
    ref = _fwd(PrecondConfig(wpack=False, **common), sr)
    out = _fwd(PrecondConfig(wpack=True, **common), sr)
    assert _psnr(out, ref) > 60, _psnr(out, ref)


def test_wpack_auto_rule():
    from vivid_tpu.nn.unet import UNetConfig, build_plan
    # Default is OFF everywhere (measured end-to-end loss on the SR forward:
    # the pack/unpack boundary relayouts cost more than the conv win —
    # docs/PERF.md round-3); wpack stays an explicit ablation flag.
    auto = UNetConfig(img_resolution=256, img_channels=3, label_dim=20,
                      kind="sr", model_channels=64)
    assert not auto.wpack_on
    cfg = UNetConfig(img_resolution=256, img_channels=3, label_dim=20,
                     kind="sr", model_channels=64, wpack=True)
    assert cfg.wpack_on
    enc, dec = build_plan(cfg)
    lvl0 = [e for e in enc + dec if e.block is not None
            and e.res == 256 and e.block.resample_mode == "keep"]
    assert lvl0 and all(e.block.wpack for e in lvl0)
    # non-level-0 / up blocks stay plain
    rest = [e for e in enc + dec if e.block is not None
            and (e.res != 256 or e.block.resample_mode != "keep")]
    assert all(not e.block.wpack for e in rest)
    # base 64px model: auto off
    base = UNetConfig(img_resolution=64, img_channels=3, label_dim=20,
                      kind="xattn", model_channels=64)
    assert not base.wpack_on


def test_wpack_gradients_match():
    common = dict(img_resolution=32, num_sources=2, model_channels=16,
                  channel_mult=(1, 2), num_blocks=1, attn_resolutions=(16,),
                  channels_per_head=8, use_bf16=False, remat=False)
    key = jax.random.PRNGKey(0)
    cfg_p = PrecondConfig(wpack=True, **common)
    cfg_r = PrecondConfig(wpack=False, **common)
    params = precond_init(key, cfg_r)
    b, res = 2, 32
    src = jax.random.normal(jax.random.fold_in(key, 1), (b, 2, res, res, 3))
    dst = jax.random.normal(jax.random.fold_in(key, 2), (b, res, res, 3))
    sigma = jnp.asarray([0.5, 2.0])
    geo = jax.random.normal(jax.random.fold_in(key, 3), (b, 2, 20))

    def loss(p, cfg):
        return jnp.sum(precond_apply(p, cfg, src, dst, sigma, geo) ** 2)

    g_r = jax.grad(lambda p: loss(p, cfg_r))(params)
    g_p = jax.grad(lambda p: loss(p, cfg_p))(params)
    flat_r = jnp.concatenate([x.ravel() for x in jax.tree.leaves(g_r)])
    flat_p = jnp.concatenate([x.ravel() for x in jax.tree.leaves(g_p)])
    rel = float(jnp.linalg.norm(flat_p - flat_r)
                / (1e-12 + jnp.linalg.norm(flat_r)))
    assert rel < 1e-5, rel
