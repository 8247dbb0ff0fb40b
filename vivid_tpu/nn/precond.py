"""NVPrecond — EDM preconditioning wrapper + uncertainty head.

Parity surface: training/models.py:589-749. The dual-source even/odd
interleave of the reference is replaced by an explicit source axis:

    src:      [B, n_src, H, W, Cs]   (n_src = 2 dual-source, 1 vanilla)
    dst:      [B, H, W, C]           noisy target (one per pair)
    sigma:    [B]
    geometry: [B, n_src, 20]

The encoder folds the source axis into the batch ([B*n_src, ...]) — the MXU
sees one large batch — and the U-Net consumes per-source feature stacks
[B, n_src, h, w, c]. Preconditioning follows EDM:
c_skip = sd^2/(s^2+sd^2), c_out = s*sd/sqrt(s^2+sd^2), c_in = 1/sqrt(sd^2+s^2),
c_noise = log(s)/4 (models.py:635-638). Compute dtype is bfloat16 on TPU
(the reference's fp16-on-cuda policy, models.py:632), norm math stays fp32.
"""

from dataclasses import dataclass, field
from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from vivid_tpu.geometry.warp import get_warped_features
from vivid_tpu.nn.mp import mp_conv_apply, mp_conv_init, mp_fourier_apply, mp_fourier_init
from vivid_tpu.nn.unet import UNetConfig, attention_feature_spec, unet_apply, unet_init


@dataclass(frozen=True)
class PrecondConfig:
    img_resolution: int
    img_channels: int = 3
    source_label_dim: int = 20
    target_label_dim: int = 40
    use_bf16: bool = True                 # bf16 compute (TPU analogue of use_fp16)
    sigma_data: float = 0.5
    logvar_channels: int = 128
    super_res: bool = False
    no_time_enc: bool = False
    depth_input: bool = False
    warp_depth_coor: bool = False
    uncond: bool = False
    noisy_sr: float = 0.25
    num_sources: int = 2                  # 2 = dual-source, 1 = vanilla
    # U-Net hyperparameters (shared by encoder and denoiser):
    model_channels: int = 192
    channel_mult: Tuple[int, ...] = (1, 2, 3, 4)
    channel_mult_noise: Optional[int] = None
    channel_mult_emb: Optional[int] = None
    num_blocks: int = 3
    attn_resolutions: Tuple[int, ...] = (16, 8)
    extra_attn: Optional[int] = None
    epipolar_attention_bias: bool = False
    channels_per_head: int = 64
    dropout: float = 0.0
    remat: object = True                  # False | True | "save_dots"
    scan_blocks: bool = False             # lax.scan over equal-config block runs
    force_wn: bool = False                # forced weight normalization (Eq. 66)
    wpack: Optional[bool] = None          # width-packed level-0 convs (nn/wpack.py);
                                          # None = OFF (chip-measured net loss
                                          # in-model; explicit True = ablation)

    def _unet_common(self):
        return dict(
            img_resolution=self.img_resolution,
            model_channels=self.model_channels,
            channel_mult=tuple(self.channel_mult),
            channel_mult_noise=self.channel_mult_noise,
            channel_mult_emb=self.channel_mult_emb,
            num_blocks=self.num_blocks,
            attn_resolutions=tuple(self.attn_resolutions),
            extra_attn=self.extra_attn,
            epipolar_attention_bias=self.epipolar_attention_bias,
            num_cross_sources=self.num_sources,
            channels_per_head=self.channels_per_head,
            dropout=self.dropout,
            remat=self.remat,
            scan_blocks=self.scan_blocks,
            wpack=self.wpack,
        )

    @property
    def encoder_cfg(self) -> Optional[UNetConfig]:
        if self.uncond:
            return None
        cin = (self.img_channels + int(self.depth_input)
               + self.logvar_channels * int(self.warp_depth_coor))
        return UNetConfig(kind="encoder", img_channels=cin,
                          label_dim=self.source_label_dim, **self._unet_common())

    @property
    def unet_cfg(self) -> UNetConfig:
        cin = self.img_channels + self.logvar_channels * int(self.warp_depth_coor)
        return UNetConfig(kind="sr" if self.super_res else "xattn",
                          img_channels=cin, label_dim=self.target_label_dim,
                          **self._unet_common())


def precond_init(key, cfg: PrecondConfig) -> dict:
    k_enc, k_unet, k_lf, k_ll = jax.random.split(key, 4)
    params = {
        "unet": unet_init(k_unet, cfg.unet_cfg),
        "logvar_fourier": mp_fourier_init(k_lf, cfg.logvar_channels),
        "logvar_linear": mp_conv_init(k_ll, cfg.logvar_channels, 1, ()),
    }
    if cfg.encoder_cfg is not None:
        params["encoder"] = unet_init(k_enc, cfg.encoder_cfg)
    return params


def zero_features(cfg: PrecondConfig, batch: int, dtype) -> List[jax.Array]:
    """Unconditional models inject zero cross-features matching the xattn
    block shapes (models.py:727-736)."""
    spec = attention_feature_spec(cfg.unet_cfg)
    return [jnp.zeros((batch, cfg.num_sources, res, res, ch), dtype)
            for (_, ch, res) in spec]


def encode_sources(params, cfg: PrecondConfig, src, c_noise, geometry,
                   train=False, rng=None) -> List[jax.Array]:
    """Run the feature encoder on [B, n_src, H, W, Cs]; returns the xattn
    feature list, each [B, n_src, h, w, c]."""
    b, s = src.shape[:2]
    flat_src = src.reshape((b * s,) + src.shape[2:])
    flat_geo = geometry.reshape(b * s, -1)
    enc_noise = jnp.repeat(c_noise, s) * (0.0 if cfg.no_time_enc else 1.0)
    feats = unet_apply(params["encoder"], cfg.encoder_cfg, flat_src, enc_noise,
                       flat_geo, train=train, rng=rng)
    return [f.reshape((b, s) + f.shape[1:]) for f in feats]


def precond_apply(params, cfg: PrecondConfig, src, dst, sigma, geometry=None,
                  conditioning_image=None, force_fp32: bool = False,
                  return_logvar: bool = False, return_features: bool = False,
                  inject_features: Optional[List] = None,
                  train: bool = False, rng=None):
    """EDM-preconditioned denoiser forward. Returns D_x [B, H, W, C] in fp32
    (optionally (D_x, logvar [B,1,1,1]))."""
    b = dst.shape[0]
    x = dst.astype(jnp.float32)
    sigma = sigma.astype(jnp.float32).reshape(b, 1, 1, 1)
    dtype = jnp.bfloat16 if (cfg.use_bf16 and not force_fp32) else jnp.float32

    if geometry is None:
        geometry = jnp.zeros((b, cfg.num_sources, 20), jnp.float32)
    if cfg.uncond:
        geometry = geometry * 0.0

    sd = cfg.sigma_data
    c_skip = sd ** 2 / (sigma ** 2 + sd ** 2)
    c_out = sigma * sd / jnp.sqrt(sigma ** 2 + sd ** 2)
    c_in = 1.0 / jnp.sqrt(sd ** 2 + sigma ** 2)
    c_noise = jnp.log(sigma.reshape(b)) / 4.0
    x_in = (c_in * x).astype(dtype)

    if cfg.warp_depth_coor:
        assert src is not None and src.shape[-1] == 4, \
            "warp_depth_coor requires a depth channel in src"
        embed = partial(mp_fourier_apply, params["logvar_fourier"])
        depth = src[..., 3:]
        bs = b * cfg.num_sources
        grid, warped = get_warped_features(
            depth.reshape((bs,) + depth.shape[2:]),
            geometry.reshape(bs, -1), embed)
        grid = grid.reshape((b, cfg.num_sources) + grid.shape[1:])
        warped = warped.reshape((b, cfg.num_sources) + warped.shape[1:])
        src = jnp.concatenate([src[..., :3], grid.astype(src.dtype)], axis=-1)
        # The denoised view gets the warped grid of the first source
        # (reference x_in[::2] consumes source-0 rows, models.py:652/673).
        x_in = jnp.concatenate([x_in, warped[:, 0].astype(dtype)], axis=-1)

    if cfg.super_res:
        assert conditioning_image is not None, "super_res requires conditioning_image"
        if cfg.noisy_sr > 0:
            assert rng is not None, "noisy_sr conditioning needs an rng key"
            rng, k = jax.random.split(rng)
            conditioning_image = conditioning_image + cfg.noisy_sr * jax.random.normal(
                k, conditioning_image.shape, conditioning_image.dtype)
        x_in = jnp.concatenate([x_in, conditioning_image.astype(dtype)], axis=-1)

    # Cross-attention features. Unconditional models use the closed-form
    # zero-feature sink (blocks.attention_with_zero_sink) — exactly equal to
    # the reference's materialized zero features (models.py:727-736) at a
    # third of the attention cost.
    if inject_features is not None:
        features = inject_features
    elif cfg.uncond:
        features = "zeros"
    else:
        features = encode_sources(params, cfg, src.astype(dtype), c_noise,
                                  geometry, train=train, rng=rng)
    if return_features:
        return features

    geometry_emb = geometry.reshape(b, -1)
    src_geometries = ([geometry[:, i] for i in range(cfg.num_sources)]
                      if cfg.epipolar_attention_bias else None)
    F_x = unet_apply(params["unet"], cfg.unet_cfg, x_in, c_noise, geometry_emb,
                     features=features, src_geometries=src_geometries,
                     train=train, rng=rng)
    D_x = c_skip * x + c_out * F_x.astype(jnp.float32)

    if return_logvar:
        logvar = mp_conv_apply(
            params["logvar_linear"],
            mp_fourier_apply(params["logvar_fourier"], c_noise)).reshape(b, 1, 1, 1)
        return D_x, logvar
    return D_x


class NVPrecond:
    """Thin object wrapper binding (config, params) for registry construction
    and checkpoint snapshots; all compute flows through the pure functions
    above (which is what jit/pjit trace)."""

    def __init__(self, key=None, params=None, **cfg_kwargs):
        self.cfg = PrecondConfig(**cfg_kwargs)
        if params is None:
            assert key is not None, "NVPrecond needs `key` or `params`"
            params = precond_init(key, self.cfg)
        self.params = params

    @property
    def img_resolution(self):
        return self.cfg.img_resolution

    @property
    def img_channels(self):
        return self.cfg.img_channels

    @property
    def no_time_enc(self):
        return self.cfg.no_time_enc

    @property
    def super_res(self):
        return self.cfg.super_res

    @property
    def depth_input(self):
        return self.cfg.depth_input

    def __call__(self, src, dst, sigma, geometry=None, **kw):
        return precond_apply(self.params, self.cfg, src, dst, sigma, geometry, **kw)
