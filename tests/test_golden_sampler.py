"""Golden parity for the sampler loop, SR model, and geometry math against
the actual reference implementation (same harness as test_golden_reference)."""

import os
import sys
import types

import numpy as np
import pytest

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "training")),
    reason="reference tree not mounted")


@pytest.fixture(scope="module")
def ref():
    for name in ["kornia", "kornia.geometry", "kornia.geometry.transform",
                 "kornia.geometry.conversions", "litdata",
                 "torchvision", "torchvision.transforms",
                 "torchvision.transforms.functional", "torchvision.utils"]:
        sys.modules.setdefault(name, types.ModuleType(name))
    sys.modules["kornia"].geometry = sys.modules["kornia.geometry"]
    sys.modules["kornia.geometry"].transform = sys.modules["kornia.geometry.transform"]
    sys.modules["kornia.geometry.transform"].resize = lambda *a, **k: None
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    import generate_images as ref_gen
    from training import models as ref_models
    from training import utils as ref_utils
    return types.SimpleNamespace(gen=ref_gen, models=ref_models, utils=ref_utils)


TINY = dict(model_channels=16, channel_mult=[1, 2], num_blocks=1,
            attn_resolutions=[8], channels_per_head=8)


def _psnr(a, b):
    mse = float(np.mean((a - b) ** 2))
    span = float(a.max() - a.min()) or 1.0
    return 10 * np.log10(span ** 2 / max(mse, 1e-20))


def _mapped(ref, seed=0, **extra):
    import torch
    from vivid_tpu.compat.torch_pickle import map_torch_state
    from vivid_tpu.nn.precond import PrecondConfig
    import jax, jax.numpy as jnp
    torch.manual_seed(seed)
    net = ref.models.NVPrecond(img_resolution=16, img_channels=3,
                               source_label_dim=20, target_label_dim=40,
                               use_fp16=False, **TINY, **extra).eval()
    tree = map_torch_state(
        {k: v.detach().numpy() for k, v in net.named_parameters()},
        {k: v.detach().numpy() for k, v in net.named_buffers()})
    params = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), tree)
    cfg = PrecondConfig(img_resolution=16, num_sources=2, use_bf16=False,
                        remat=False, model_channels=16, channel_mult=(1, 2),
                        num_blocks=1, attn_resolutions=(8,),
                        channels_per_head=8, **extra)
    return net, params, cfg


def test_sampler_golden_parity_guided(ref):
    """Full 6-step Heun sampling with autoguidance: reference loop (torch,
    interleaved dual-source) vs this framework's half-step scan."""
    import torch
    from vivid_tpu.diffusion.sampler import edm_sampler as jax_sampler
    from vivid_tpu.diffusion.sampler import make_denoiser

    net, params, cfg = _mapped(ref, seed=0)
    gnet, gparams, gcfg = _mapped(ref, seed=1)  # conditional "weak" net as guide
    rng = np.random.RandomState(0)
    B = 2
    src = rng.randn(B, 2, 3, 16, 16).astype(np.float32)
    geometry = (rng.randn(B, 2, 20) * 0.3).astype(np.float32)
    noise = rng.randn(B, 3, 16, 16).astype(np.float32)

    src_t = torch.tensor(src.reshape(B * 2, 3, 16, 16))
    geo_t = torch.tensor(geometry.reshape(B * 2, 20))
    noise_t = torch.tensor(np.repeat(noise, 2, axis=0))  # pairs share noise

    class GnetShim:
        """The reference sampler calls gnet(src, x, t) with geometry=None,
        which crashes NVPrecond's dual-source path (models.py:631 multiplies
        None) — a latent reference bug. Supply the labels explicitly."""
        def __init__(self, net):
            self.net = net
        def __getattr__(self, k):
            return getattr(self.net, k)
        def __call__(self, s, x, t, *a, **kw):
            return self.net(s, x, t, geo_t)

    with torch.no_grad():
        out_ref = ref.gen.edm_sampler(net, src_t, noise_t, labels=geo_t,
                                      gnet=GnetShim(gnet), guidance=1.5,
                                      num_steps=6)
    out_ref = out_ref.numpy()

    import jax.numpy as jnp
    src_j = jnp.asarray(src.transpose(0, 1, 3, 4, 2))
    geo_j = jnp.asarray(geometry)
    den = make_denoiser(params, cfg, src=src_j, geometry=geo_j)
    gden = make_denoiser(gparams, gcfg, src=src_j, geometry=geo_j)
    out_jax = jax_sampler(den, jnp.asarray(noise.transpose(0, 2, 3, 1)),
                          gnet_denoise=gden, guidance=1.5, num_steps=6)
    out_jax = np.asarray(out_jax).transpose(0, 3, 1, 2)
    psnr = _psnr(out_ref, out_jax)
    assert psnr > 40, f"sampler PSNR {psnr:.1f} dB " \
                      f"(max diff {np.abs(out_ref - out_jax).max():.2e})"


def test_sr_forward_golden_parity(ref):
    """SRXAttnUNet hardcodes channels_per_head=32 (and rejects the kwarg),
    and the encoder keeps the default 64 — so SR parity needs real channel
    widths for heads to exist at all (model_channels=64)."""
    import torch
    from vivid_tpu.compat.torch_pickle import map_torch_state
    from vivid_tpu.nn.precond import PrecondConfig, precond_apply
    import jax, jax.numpy as jnp
    torch.manual_seed(3)
    net = ref.models.NVPrecond(img_resolution=16, img_channels=3,
                               source_label_dim=20, target_label_dim=40,
                               use_fp16=False, super_res=True, noisy_sr=0.0,
                               model_channels=64, channel_mult=[1, 2],
                               num_blocks=1, attn_resolutions=[8]).eval()
    tree = map_torch_state(
        {k: v.detach().numpy() for k, v in net.named_parameters()},
        {k: v.detach().numpy() for k, v in net.named_buffers()})
    params = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), tree)
    cfg = PrecondConfig(img_resolution=16, num_sources=2, use_bf16=False,
                        remat=False, model_channels=64, channel_mult=(1, 2),
                        num_blocks=1, attn_resolutions=(8,),
                        super_res=True, noisy_sr=0.0)
    rng = np.random.RandomState(4)
    B = 2
    src = rng.randn(B, 2, 3, 16, 16).astype(np.float32)
    dst = rng.randn(B, 3, 16, 16).astype(np.float32)
    cond = rng.randn(B, 3, 16, 16).astype(np.float32)
    sigma = np.exp(rng.randn(B).astype(np.float32) * 0.5)
    geometry = (rng.randn(B, 2, 20) * 0.3).astype(np.float32)
    with torch.no_grad():
        d_ref = net(torch.tensor(src.reshape(B * 2, 3, 16, 16)),
                    torch.tensor(np.repeat(dst, 2, 0)),
                    torch.tensor(np.repeat(sigma, 2, 0)),
                    torch.tensor(geometry.reshape(B * 2, 20)),
                    conditioning_image=torch.tensor(cond))
    import jax.numpy as jnp
    d_jax = precond_apply(params, cfg,
                          jnp.asarray(src.transpose(0, 1, 3, 4, 2)),
                          jnp.asarray(dst.transpose(0, 2, 3, 1)),
                          jnp.asarray(sigma), jnp.asarray(geometry),
                          conditioning_image=jnp.asarray(cond.transpose(0, 2, 3, 1)),
                          force_fp32=True)
    psnr = _psnr(d_ref.numpy(), np.asarray(d_jax).transpose(0, 3, 1, 2))
    assert psnr > 40, f"SR forward PSNR {psnr:.1f} dB"


def test_geometry_codec_golden_parity(ref):
    import torch
    from vivid_tpu.geometry.codec import compose_geometry, decompose_geometry
    rng = np.random.RandomState(5)
    pose = (np.eye(3, 4) + rng.randn(3, 4) * 0.05).astype(np.float32)
    src_K = np.array([55.0, 58.0, 32.0, 32.0], np.float32)
    tgt_K = np.array([56.0, 57.0, 32.0, 32.0], np.float32)
    for imsize in (64, 256):
        g_ref = ref.utils.compose_geometry(torch.tensor(pose),
                                           torch.tensor(src_K),
                                           torch.tensor(tgt_K), imsize=imsize)
        g_jax = compose_geometry(pose, src_K, tgt_K, imsize=imsize)
        np.testing.assert_allclose(np.asarray(g_jax), g_ref.numpy(),
                                   rtol=1e-4, atol=1e-5)
        p_ref, sK_ref, tK_ref = ref.utils.decompose_geometry(g_ref, imsize=imsize)
        p_jax, sK_jax, tK_jax = decompose_geometry(np.asarray(g_jax), imsize=imsize)
        np.testing.assert_allclose(np.asarray(p_jax), p_ref.numpy(),
                                   rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(np.asarray(sK_jax), sK_ref.numpy(),
                                   rtol=1e-3, atol=1e-3)


def test_epipolar_dist_golden_parity(ref):
    import torch
    from vivid_tpu.geometry.codec import compose_geometry
    from vivid_tpu.geometry.epipolar import get_epipolar_dist
    rng = np.random.RandomState(6)
    # Non-degenerate pose: all translation components well above the 1e-5
    # threshold so the reference's random fallback never fires.
    pose = np.eye(3, 4, dtype=np.float64)
    pose[:, 3] = [0.4, 0.3, 0.5]
    K = np.array([57.0, 57.0, 32.0, 32.0], np.float32)
    geo = np.asarray(compose_geometry(pose.astype(np.float32), K, K, imsize=64))
    d_ref = ref.utils.get_epipolar_dist(torch.tensor(geo[None]), imsize=64,
                                        patch_size=8, device="cpu")
    d_jax = get_epipolar_dist(np.asarray(geo)[None], imsize=64, patch_size=8)
    np.testing.assert_allclose(np.asarray(d_jax), d_ref.numpy(),
                               rtol=2e-2, atol=2e-2)


def test_plain_unet_golden_parity(ref):
    """The standalone EDM2 UNet class (models.py:320-406) — not used by
    NVPrecond but part of the model API surface."""
    import torch
    from vivid_tpu.compat.torch_pickle import map_torch_state
    from vivid_tpu.nn.unet import UNetConfig, unet_apply
    import jax, jax.numpy as jnp

    torch.manual_seed(7)
    net = ref.models.UNet(img_resolution=16, img_channels=3, label_dim=20,
                          model_channels=16, channel_mult=[1, 2], num_blocks=1,
                          attn_resolutions=[8], channels_per_head=8).eval()
    tree = map_torch_state(
        {k: v.detach().numpy() for k, v in net.named_parameters()},
        {k: v.detach().numpy() for k, v in net.named_buffers()})
    params = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), tree)
    cfg = UNetConfig(img_resolution=16, img_channels=3, label_dim=20,
                     kind="unet", model_channels=16, channel_mult=(1, 2),
                     num_blocks=1, attn_resolutions=(8,), channels_per_head=8,
                     remat=False)
    rng = np.random.RandomState(8)
    x = rng.randn(2, 3, 16, 16).astype(np.float32)
    noise_labels = rng.randn(2).astype(np.float32)
    geometry = (rng.randn(2, 20) * 0.3).astype(np.float32)
    with torch.no_grad():
        y_ref = net(torch.tensor(x), torch.tensor(noise_labels),
                    torch.tensor(geometry)).numpy()
    y_jax = unet_apply(params, cfg, jnp.asarray(x.transpose(0, 2, 3, 1)),
                       jnp.asarray(noise_labels), jnp.asarray(geometry))
    y_jax = np.asarray(y_jax).transpose(0, 3, 1, 2)
    psnr = _psnr(y_ref, y_jax)
    assert psnr > 40, f"plain UNet PSNR {psnr:.1f} dB"


def test_unet_encoder_golden_parity(ref):
    """UNetEncoder feature extractor (models.py:523-570) standalone."""
    import torch
    from vivid_tpu.compat.torch_pickle import map_torch_state
    from vivid_tpu.nn.unet import UNetConfig, unet_apply
    import jax, jax.numpy as jnp

    torch.manual_seed(9)
    net = ref.models.UNetEncoder(img_resolution=16, img_channels=3,
                                 label_dim=20, model_channels=16,
                                 channel_mult=[1, 2], num_blocks=1,
                                 attn_resolutions=[8],
                                 channels_per_head=8).eval()
    named = {k: v.detach().numpy() for k, v in net.named_parameters()}
    buffers = {k: v.detach().numpy() for k, v in net.named_buffers()}
    tree = map_torch_state(named, buffers)
    params = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), tree)
    cfg = UNetConfig(img_resolution=16, img_channels=3, label_dim=20,
                     kind="encoder", model_channels=16, channel_mult=(1, 2),
                     num_blocks=1, attn_resolutions=(8,), channels_per_head=8,
                     remat=False)
    rng = np.random.RandomState(10)
    x = rng.randn(2, 3, 16, 16).astype(np.float32)
    noise_labels = rng.randn(2).astype(np.float32)
    geometry = (rng.randn(2, 20) * 0.3).astype(np.float32)
    with torch.no_grad():
        feats_ref = net(torch.tensor(x), torch.tensor(noise_labels),
                        torch.tensor(geometry))
    feats_jax = unet_apply(params, cfg, jnp.asarray(x.transpose(0, 2, 3, 1)),
                           jnp.asarray(noise_labels), jnp.asarray(geometry))
    assert len(feats_ref) == len(feats_jax)
    for fr, fj in zip(feats_ref, feats_jax):
        psnr = _psnr(fr.numpy(), np.asarray(fj).transpose(0, 3, 1, 2))
        assert psnr > 40, f"encoder feature PSNR {psnr:.1f}"
