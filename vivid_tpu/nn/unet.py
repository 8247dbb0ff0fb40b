"""EDM2 U-Net family: UNet, XAttnUNet, UNetEncoder, SRXAttnUNet.

Parity surface: training/models.py:320-582. Re-designed as a *static plan*
(an ordered list of named block configs built once from the config) plus pure
init/apply functions over a name-keyed param pytree. Param names mirror the
reference module paths (`enc/64x64_block0/conv_res0`) so torch-pickle weight
import is a pure name/layout mapping.

Variants:
  * kind='unet'    — plain EDM2 U-Net (models.py:320-406).
  * kind='xattn'   — attention blocks are cross-attention blocks consuming a
    list of encoder feature sources (models.py:411-518); output is 3 channels.
  * kind='encoder' — U-Net trimmed to a feature extractor: no out_conv, the
    decoder is cut after its last attention block; forward returns the
    activation at every attention-bearing block (models.py:523-570).
  * kind='sr'      — xattn with channels_per_head=32 and the first conv
    widened for the concatenated low-res conditioning (models.py:575-582).

Dual-source is an explicit pair axis: features are [B, n_src, h, w, c].
"""

import os
from dataclasses import dataclass, replace
from functools import partial
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from vivid_tpu.nn.blocks import BlockConfig, block_apply, block_init
from vivid_tpu.nn.mp import (mp_cat, mp_conv_apply, mp_conv_init,
                             mp_fourier_apply, mp_fourier_init, mp_silu, mp_sum)


@dataclass(frozen=True)
class UNetConfig:
    img_resolution: int
    img_channels: int
    label_dim: int
    kind: str = "unet"                    # 'unet' | 'xattn' | 'encoder' | 'sr'
    model_channels: int = 192
    channel_mult: Tuple[int, ...] = (1, 2, 3, 4)
    channel_mult_noise: Optional[int] = None
    channel_mult_emb: Optional[int] = None
    num_blocks: int = 3
    attn_resolutions: Tuple[int, ...] = (16, 8)
    label_balance: float = 0.5
    concat_balance: float = 0.5
    extra_attn: Optional[int] = None      # force attn on block k per level (not level 0)
    epipolar_attention_bias: bool = False
    num_cross_sources: int = 2            # xattn KV sources (2=dual, 1=vanilla)
    channels_per_head: int = 64
    dropout: float = 0.0
    res_balance: float = 0.3
    attn_balance: float = 0.3
    clip_act: Optional[float] = 256.0
    remat: bool = True                    # jax.checkpoint heavy blocks; the
                                          # string "save_dots" keeps conv +
                                          # attention outputs and recomputes
                                          # only the elementwise chains
    scan_blocks: bool = False             # lax.scan over equal-config block
                                          # runs (smaller HLO, faster compile)
    wpack: Optional[bool] = None          # width-packed level-0 convs
                                          # (nn/wpack.py); None = off. The
                                          # packed conv wins in isolation
                                          # (~1.3x at the SR level-0 shape)
                                          # but the pack/unpack relayouts at
                                          # region boundaries cross HBM and
                                          # cost more than the win: SR fwd
                                          # 54.3 -> 61.9 ms/iter with wpack
                                          # on (docs/PERF.md round-3). Kept
                                          # as an explicit ablation flag.

    @property
    def cblock(self):
        return [self.model_channels * m for m in self.channel_mult]

    @property
    def wpack_on(self) -> bool:
        if self.wpack is not None:
            return self.wpack
        return False

    @property
    def cnoise(self):
        return (self.model_channels * self.channel_mult_noise
                if self.channel_mult_noise is not None else self.cblock[0])

    @property
    def cemb(self):
        return (self.model_channels * self.channel_mult_emb
                if self.channel_mult_emb is not None else max(self.cblock))

    @property
    def out_channels(self):
        return 3 if self.kind in ("xattn", "sr") else self.img_channels


# ---------------------------------------------------------------------------
# Plan building. Entry = (name, kind, cfg_or_channels, res).

@dataclass(frozen=True)
class PlanEntry:
    name: str
    kind: str        # 'conv' | 'block'
    res: int
    in_channels: int
    out_channels: int
    block: Optional[BlockConfig] = None


def _is_attn(cfg: UNetConfig, res: int, idx: int, level: int, dec: bool) -> bool:
    if res in cfg.attn_resolutions:
        return True
    if cfg.extra_attn is None or level == 0:
        return False
    target = (cfg.num_blocks - idx) if dec else idx
    return cfg.extra_attn == target


def _block(cfg: UNetConfig, cin, cout, flavor, res, attention=False,
           resample_mode="keep", xattn=False) -> BlockConfig:
    eff_cph = 32 if cfg.kind == "sr" else cfg.channels_per_head
    return BlockConfig(
        in_channels=cin, out_channels=cout, emb_channels=cfg.cemb, flavor=flavor,
        resample_mode=resample_mode, attention=attention, xattn=xattn,
        num_cross_sources=cfg.num_cross_sources, channels_per_head=eff_cph,
        dropout=cfg.dropout, res_balance=cfg.res_balance,
        attn_balance=cfg.attn_balance, clip_act=cfg.clip_act,
        epipolar_attention_bias=cfg.epipolar_attention_bias,
        imsize=cfg.img_resolution,
        wpack=(cfg.wpack_on and res == cfg.img_resolution and cout < 128
               and resample_mode == "keep" and not attention))


def build_plan(cfg: UNetConfig) -> Tuple[List[PlanEntry], List[PlanEntry]]:
    """Returns (enc_plan, dec_plan) reproducing the reference block layout
    (models.py:352-384 / 443-480) including the extra_attn placement rule and
    the first-conv widening for SR (cin = 2*(cin-1)+1, models.py:579-582)."""
    xattn_kind = cfg.kind in ("xattn", "sr")
    enc: List[PlanEntry] = []
    cout = cfg.img_channels + 1  # constant ones channel appended to the input
    for level, channels in enumerate(cfg.cblock):
        res = cfg.img_resolution >> level
        if level == 0:
            cin, cout = cout, channels
            conv_cin = 2 * (cin - 1) + 1 if cfg.kind == "sr" else cin
            enc.append(PlanEntry(f"enc/{res}x{res}_conv", "conv", res, conv_cin, cout))
        else:
            enc.append(PlanEntry(
                f"enc/{res}x{res}_down", "block", res, cout, cout,
                _block(cfg, cout, cout, "enc", res, resample_mode="down")))
        for idx in range(cfg.num_blocks):
            cin, cout = cout, channels
            attn = _is_attn(cfg, res, idx, level, dec=False)
            enc.append(PlanEntry(
                f"enc/{res}x{res}_block{idx}", "block", res, cin, cout,
                _block(cfg, cin, cout, "enc", res, attention=attn,
                       xattn=xattn_kind and attn)))

    dec: List[PlanEntry] = []
    skips = [e.out_channels for e in enc]
    for level, channels in reversed(list(enumerate(cfg.cblock))):
        res = cfg.img_resolution >> level
        if level == len(cfg.cblock) - 1:
            dec.append(PlanEntry(
                f"dec/{res}x{res}_in0", "block", res, cout, cout,
                _block(cfg, cout, cout, "dec", res, attention=True, xattn=xattn_kind)))
            dec.append(PlanEntry(
                f"dec/{res}x{res}_in1", "block", res, cout, cout,
                _block(cfg, cout, cout, "dec", res)))
        else:
            dec.append(PlanEntry(
                f"dec/{res}x{res}_up", "block", res, cout, cout,
                _block(cfg, cout, cout, "dec", res, resample_mode="up")))
        for idx in range(cfg.num_blocks + 1):
            cin = cout + skips.pop()
            cout = channels
            attn = _is_attn(cfg, res, idx, level, dec=True)
            dec.append(PlanEntry(
                f"dec/{res}x{res}_block{idx}", "block", res, cin, cout,
                _block(cfg, cin, cout, "dec", res, attention=attn,
                       xattn=xattn_kind and attn)))

    if cfg.kind == "encoder":
        # Trim trailing attention-free decoder blocks (models.py:530-534).
        last_attn = max((i for i, e in enumerate(dec)
                         if e.block is not None and e.block.num_heads > 0), default=-1)
        dec = dec[: last_attn + 1]
    return enc, dec


def attention_feature_spec(cfg: UNetConfig) -> List[Tuple[str, int, int]]:
    """(name, out_channels, res) for every attention-bearing block in network
    order — the cross-feature contract between UNetEncoder and XAttnUNet."""
    enc, dec = build_plan(cfg)
    return [(e.name, e.out_channels, e.res) for e in enc + dec
            if e.block is not None and e.block.num_heads > 0]


# ---------------------------------------------------------------------------
# Init / apply.

def unet_init(key, cfg: UNetConfig) -> dict:
    enc, dec = build_plan(cfg)
    n = len(enc) + len(dec) + 4
    keys = iter(jax.random.split(key, n))
    params: Dict[str, dict] = {
        "emb_fourier": mp_fourier_init(next(keys), cfg.cnoise),
        "emb_noise": mp_conv_init(next(keys), cfg.cnoise, cfg.cemb, ()),
    }
    if cfg.label_dim != 0:
        params["emb_label"] = mp_conv_init(next(keys), cfg.label_dim, cfg.cemb, ())
    for e in enc + dec:
        k = next(keys)
        if e.kind == "conv":
            params[e.name] = mp_conv_init(k, e.in_channels, e.out_channels, (3, 3))
        else:
            params[e.name] = block_init(k, e.block)
    if cfg.kind != "encoder":
        params["out_gain"] = jnp.zeros((), jnp.float32)
        params["out_conv"] = mp_conv_init(next(keys), dec[-1].out_channels,
                                          cfg.out_channels, (3, 3))
    return params


def compute_emb(params, cfg: UNetConfig, noise_labels, geometry):
    emb = mp_conv_apply(params["emb_noise"],
                        mp_fourier_apply(params["emb_fourier"], noise_labels))
    if "emb_label" in params and geometry is not None:
        emb = mp_sum(emb, mp_conv_apply(params["emb_label"],
                                        geometry.astype(emb.dtype)),
                     t=cfg.label_balance)
    return mp_silu(emb)


def _remat_wrap(fn, remat):
    """remat: False | True (full recompute) | "save_dots" (keep conv/attn
    outputs — the "mpconv_out"/"attn_out" checkpoint names — and recompute
    only the cheap elementwise chains in the backward). Conv outputs larger
    than REMAT_HIRES_AREA (nn/mp.py) carry the "mpconv_out_hires" name and
    are deliberately NOT in the save list: at SR resolution the 256px
    level-0 activations are what used to OOM save_dots, while the FLOPs to
    recompute them are the cheapest per byte in the model."""
    if not remat:
        return fn
    if remat == "save_dots":
        # VIVID_SAVE_WNORM=1 additionally keeps the per-conv normalized
        # weights (one extra bf16 param copy in residuals). Chip A/B
        # (logs/r4/train_flagship_wnorm.log vs _nownorm.log): a ~1.5% LOSS
        # at flagship b=32 (217.2 vs 214.0 ms) — XLA already hoists the
        # weight re-normalization out of the backward recompute (it has no
        # activation dependence), so saving it only adds residual traffic.
        # Default OFF; kept as an explicit ablation like --wpack.
        names = ["mpconv_out", "attn_out"]
        if os.environ.get("VIVID_SAVE_WNORM"):
            names.append("wnorm")
        policy = jax.checkpoint_policies.save_only_these_names(*names)
        return jax.checkpoint(fn, policy=policy)
    return jax.checkpoint(fn)


def unet_apply(params, cfg: UNetConfig, x, noise_labels, geometry,
               features: Optional[List] = None,
               src_geometries: Optional[List] = None,
               train: bool = False, rng=None):
    """Forward pass.

    x: [B, H, W, C] noisy input (already preconditioned), channel-last.
    noise_labels: [B]; geometry: [B, label_dim] or None.
    features (xattn kinds): list of [B, n_src, h, w, c] arrays, one per
    attention block in network order (the attention_feature_spec contract).
    Returns [B, H, W, out_channels], or the feature list for kind='encoder'.
    """
    enc, dec = build_plan(cfg)
    emb = compute_emb(params, cfg, noise_labels, geometry)

    # Width-packed execution of the level-0 edge convs (first conv and
    # out_conv) whenever the level-0 blocks are packed too — same rationale
    # and exactness argument (nn/wpack.py; the pack/unpack reshapes between
    # adjacent packed ops are free views XLA cancels).
    from vivid_tpu.core.sharding import act_spec_active

    def _level0_conv(p, h, gain=1.0):
        # Same channel-width gate as the block-level wpack flag (_block):
        # with >=128-ch level-0 the lanes are already full and packing is a
        # pure 2x-MAC slowdown — keep edges and blocks consistent so a
        # forced wpack=True on a wide model doesn't pack only the edges.
        if (cfg.wpack_on and cfg.cblock[0] < 128 and h.shape[2] % 2 == 0
                and not act_spec_active()):
            from vivid_tpu.nn.mp import mp_conv_apply_wpacked
            from vivid_tpu.nn.wpack import wpack, wunpack
            return wunpack(mp_conv_apply_wpacked(p, wpack(h), gain=gain))
        return mp_conv_apply(p, h, gain=gain)

    zeros_mode = isinstance(features, str) and features == "zeros"
    feat_iter = (iter(features)
                 if features is not None and not zeros_mode else None)
    collected = []
    dropout_keys = iter(jax.random.split(rng, len(enc) + len(dec))) if rng is not None else None

    def run_block(entry: PlanEntry, h):
        bcfg = entry.block
        feats = None
        # Consume a cross feature only for blocks that actually attend:
        # narrow blocks (out_channels < channels_per_head => num_heads == 0)
        # skip attention entirely, and attention_feature_spec excludes them
        # from the encoder's feature list.
        if bcfg.xattn and bcfg.num_heads > 0:
            if zeros_mode:
                feats = "zeros"
            else:
                f = next(feat_iter)  # [B, n_src, h, w, c]
                feats = [f[:, i] for i in range(cfg.num_cross_sources)]
        dk = next(dropout_keys) if (dropout_keys is not None and train and bcfg.dropout > 0) else None
        fn = partial(block_apply, cfg=bcfg, features=feats,
                     src_geometries=src_geometries, train=train, dropout_key=dk)
        fn2 = lambda p, hh, ee: fn(p, x=hh, emb=ee)
        if cfg.remat and (entry.name.startswith("dec/") or cfg.kind == "encoder"):
            fn2 = _remat_wrap(fn2, cfg.remat)
        return fn2(params[entry.name], h, emb)

    def split_runs(entries, is_dec):
        """Maximal runs (len>=2) of identical-config blocks with a uniform
        skip pattern — one lax.scan instance each instead of n inlined block
        copies (compile-size lever; numerics identical)."""
        runs, i = [], 0
        while i < len(entries):
            e, j = entries[i], i + 1
            if cfg.scan_blocks and e.kind == "block" and (
                    not is_dec or "_block" in e.name):
                while (j < len(entries) and entries[j].kind == "block"
                       and entries[j].block == e.block
                       and entries[j].in_channels == e.in_channels
                       and (not is_dec or "_block" in entries[j].name)):
                    j += 1
            runs.append(entries[i:j])
            i = j
        return runs

    def scan_run(run, h, is_dec, skips):
        bcfg = run[0].block
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs),
                               *[params[e.name] for e in run])
        feats = (jnp.stack([next(feat_iter) for _ in run])
                 if bcfg.xattn and bcfg.num_heads > 0 and not zeros_mode
                 else None)
        use_dk = dropout_keys is not None and train and bcfg.dropout > 0
        dks = jnp.stack([next(dropout_keys) for _ in run]) if use_dk else None
        skips_in = (jnp.stack([skips.pop() for _ in run])
                    if is_dec else None)

        def body(hh, xs):
            p, ft, dk, sk = xs
            if sk is not None:
                hh = mp_cat(hh, sk, axis=-1, t=cfg.concat_balance)
            if bcfg.xattn and zeros_mode:
                fl = "zeros"
            elif ft is not None:
                fl = [ft[:, i] for i in range(cfg.num_cross_sources)]
            else:
                fl = None
            out = block_apply(p, bcfg, hh, emb, features=fl,
                              src_geometries=src_geometries, train=train,
                              dropout_key=dk)
            return out, out

        if cfg.remat and (is_dec or cfg.kind == "encoder"):
            body = _remat_wrap(body, cfg.remat)
        return jax.lax.scan(body, h, (stacked, feats, dks, skips_in))

    # Encoder.
    h = jnp.concatenate([x, jnp.ones_like(x[..., :1])], axis=-1)
    skips = []
    for run in split_runs(enc, is_dec=False):
        if len(run) == 1:
            e = run[0]
            if e.kind == "conv":
                h = _level0_conv(params[e.name], h)
            else:
                h = run_block(e, h)
            if (cfg.kind == "encoder" and e.block is not None
                    and e.block.num_heads > 0):
                collected.append(h)
            skips.append(h)
        else:
            h, ys = scan_run(run, h, is_dec=False, skips=skips)
            for i, e in enumerate(run):
                if cfg.kind == "encoder" and e.block.num_heads > 0:
                    collected.append(ys[i])
                skips.append(ys[i])

    # Decoder.
    for run in split_runs(dec, is_dec=True):
        if len(run) == 1:
            e = run[0]
            if "_block" in e.name:
                h = mp_cat(h, skips.pop(), axis=-1, t=cfg.concat_balance)
            h = run_block(e, h)
            if cfg.kind == "encoder" and e.block.num_heads > 0:
                collected.append(h)
        else:
            h, ys = scan_run(run, h, is_dec=True, skips=skips)
            if cfg.kind == "encoder" and run[0].block.num_heads > 0:
                collected.extend(ys[i] for i in range(len(run)))

    if cfg.kind == "encoder":
        return collected
    return _level0_conv(params["out_conv"], h, gain=params["out_gain"])
