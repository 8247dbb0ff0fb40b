"""EDM2 U-Net blocks (Figure 21) with optional self- and cross-attention.

Parity surface: training/models.py Block (:131-206) and XAttnBlock (:211-315).
Re-designed channel-last; attention is a single fused softmax-attention over
[self-KV ‖ cross-KV...] with pixel-normalized q/k/v (normalize over the head
dim, fp32 accumulation) and SDPA scaling 1/sqrt(D).

The qkv/kv channel packing follows the reference weight layout contract:
attn_qkv output channels decompose as (head, d, {q,k,v}) innermost-last, and
x_attn_kv as (head, d, {k,v}) — torch's `.view(B, H, D, 3, S)` semantics —
so imported weights drop in unchanged.

Epipolar attention bias: the live reference carries the `epipolar_mixing`
parameter but never applies it (models.py:305); the upstream snapshot applies
it as an additive logit bias on the cross-KV segment
(experiments/code/training/models.py:274-282). We implement the upstream
mechanism behind the `epipolar_attention_bias` flag, generalized to one bias
per cross source in dual-source mode.
"""

from dataclasses import dataclass, field
from functools import lru_cache
from typing import List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from vivid_tpu.core.sharding import constrain
from vivid_tpu.geometry.epipolar import get_epipolar_dist, get_epipolar_attn
from vivid_tpu.nn.mp import (mp_conv_apply, mp_conv_init, mp_silu, mp_sum,
                             normalize, resample)


@dataclass(frozen=True)
class BlockConfig:
    in_channels: int
    out_channels: int
    emb_channels: int
    flavor: str = "enc"              # 'enc' | 'dec'
    resample_mode: str = "keep"      # 'keep' | 'up' | 'down'
    attention: bool = False
    xattn: bool = False              # cross-attention variant (XAttnBlock)
    num_cross_sources: int = 2       # KV sources for xattn (2 = dual-source)
    channels_per_head: int = 64
    dropout: float = 0.0
    res_balance: float = 0.3
    attn_balance: float = 0.3
    clip_act: Optional[float] = 256.0
    epipolar_attention_bias: bool = False
    imsize: Optional[int] = None     # full image resolution (epipolar bias)
    wpack: bool = False              # width-packed conv execution (nn/wpack.py)

    @property
    def num_heads(self) -> int:
        return self.out_channels // self.channels_per_head if self.attention else 0


def block_init(key, cfg: BlockConfig) -> dict:
    keys = iter(jax.random.split(key, 8))
    params = {
        "emb_gain": jnp.zeros((), jnp.float32),
        "conv_res0": mp_conv_init(
            next(keys),
            cfg.out_channels if cfg.flavor == "enc" else cfg.in_channels,
            cfg.out_channels, (3, 3)),
        "emb_linear": mp_conv_init(next(keys), cfg.emb_channels, cfg.out_channels, ()),
        "conv_res1": mp_conv_init(next(keys), cfg.out_channels, cfg.out_channels, (3, 3)),
    }
    if cfg.in_channels != cfg.out_channels:
        params["conv_skip"] = mp_conv_init(next(keys), cfg.in_channels, cfg.out_channels, (1, 1))
    if cfg.num_heads != 0:
        params["attn_qkv"] = mp_conv_init(next(keys), cfg.out_channels, cfg.out_channels * 3, (1, 1))
        params["attn_proj"] = mp_conv_init(next(keys), cfg.out_channels, cfg.out_channels, (1, 1))
        if cfg.xattn:
            params["x_attn_kv"] = mp_conv_init(next(keys), cfg.out_channels, cfg.out_channels * 2, (1, 1))
            if cfg.epipolar_attention_bias:
                params["epipolar_mixing"] = jnp.zeros((4, cfg.num_heads), jnp.float32)
    return params


@lru_cache(maxsize=None)
def _qkv_perm(num_heads: int, d: int, parts: int) -> np.ndarray:
    """Output-channel permutation from the reference qkv packing
    c_ref = head*(D*parts) + d*parts + part  (torch view(B,H,D,parts,S))
    to the layout-friendly internal packing
    c_int = part*(heads*D) + head*D + d.
    Stored/imported weights keep the reference order (the weight-import
    contract); the permutation is applied to the normalized weight at apply
    time — a pure relabeling of conv output channels, numerics identical.
    Without it, the stride-`parts` channel slices forced XLA to materialize
    whole-tensor layout copies around every attention block (35% of the
    profiled forward was `copy`)."""
    idx = np.arange(num_heads * d * parts).reshape(num_heads, d, parts)
    return idx.transpose(2, 0, 1).reshape(-1)


def _attn_dot() -> bool:
    """When set (the DEFAULT), the 1x1 attention convs (qkv / x_attn_kv /
    attn_proj) on the packed path run as dots over the flattened [B, S, C]
    token axis instead of 1x1 convs on [B, H, W, C]. Rationale: XLA assigns
    conv outputs batch-in-sublanes layouts ({3,0,2,1}) while the packed
    Pallas custom calls require row-major {2,1,0} — with convs on both sides
    of the kernel, every attention block pays whole-tensor relayout copies
    in BOTH passes (transpose_jvp + copy ≈ 11% of the flagship train-step
    trace). Dots produce (and accept cotangents in) {2,1,0} natively.
    Numerics are the same weight-normalized matmul either way (a 1x1
    filter's norm and fan_in equal its linear twin's; pinned by
    tests/test_attn_dot.py both ways). Chip A/B 2026-08-19 (logs/r4): fwd
    80.4 -> 81.3 TF/s, guided 15.94 -> 16.15 img/s, ch64 train 91.5 -> 89.6
    ms, flagship train ~213 -> 210.5 ms — a consistent ~1-2% win on every
    surface. VIVID_ATTN_DOT=0 restores the conv formulation."""
    import os
    return os.environ.get("VIVID_ATTN_DOT", "1") == "1"


def _as_linear(params_conv):
    """The linear twin of a 1x1 conv parameter: [1,1,I,O] -> [I,O].
    mp_conv_apply's weight normalization is identical on both views (the
    per-output-channel filter norm sums over the same I elements)."""
    w = params_conv["w"]
    assert w.ndim == 4 and w.shape[0] == 1 and w.shape[1] == 1, w.shape
    return {"w": w[0, 0]}


def _packed_qkv_conv(params_conv, x, num_heads, parts):
    """Apply the qkv/kv conv with output channels permuted to the internal
    (part, head, d) packing. x may be [B, H, W, C] (1x1 conv) or the
    flattened [B, S, C] (linear twin — see _attn_dot)."""
    d = params_conv["w"].shape[-1] // (num_heads * parts)
    w = params_conv["w"][..., _qkv_perm(num_heads, d, parts)]
    if x.ndim == 3:
        w = w[0, 0]
    return mp_conv_apply({"w": w}, x)


def _split_qkv(qkv, num_heads, parts, normalize_parts: bool = True):
    """Internal-packed [B, H, W, parts*C] -> tuple of `parts` tensors
    [B, heads, S, D], per-(token, head, part) normalized over D unless
    `normalize_parts=False` (the fused flash kernel normalizes in-kernel —
    kernels/flash.py — so its callers pass raw vectors through).
    One transpose to the attention layout FIRST, then normalize — XLA fuses
    the fp32 RMS-normalize into the transpose pass, and the part slices come
    out as contiguous [B, H, S, D] blocks in the kernels' native layout
    (slicing/normalizing in conv layout forced whole-tensor layout copies
    around every attention block; a hand-written Pallas prep kernel measured
    no better than this fused XLA form)."""
    b, h, w, _ = qkv.shape
    d = qkv.shape[-1] // (num_heads * parts)
    y = qkv.reshape(b, h * w, parts * num_heads, d)
    y = jnp.swapaxes(y, 1, 2)                    # [B, P*H, S, D]
    if normalize_parts:
        y = normalize(y, axis=-1)
    y = y.reshape(b, parts, num_heads, h * w, d)
    return tuple(y[:, i] for i in range(parts))


def attention(q, k, v, bias=None):
    """q: [B, H, Sq, D], k/v: [B, H, Sk, D] -> [B, H, Sq, D]. fp32 softmax;
    dispatches to the Pallas flash kernel on TPU (kernels/attention.py).
    The "attn_out" checkpoint name lets the selective remat policy keep
    attention outputs instead of recomputing the whole softmax backward."""
    from jax.ad_checkpoint import checkpoint_name
    from vivid_tpu.kernels.attention import fused_attention
    return checkpoint_name(fused_attention(q, k, v, bias), "attn_out")


def attention_with_zero_sink(q, k, v, num_zero_cols: int):
    """Attention over [k ‖ zeros(num_zero_cols)] / [v ‖ zeros] in closed form:
    every zero column contributes logit 0 (zero keys) and value 0, i.e. a
    constant probability sink of mass num_zero_cols * exp(-m). Exactly equals
    materializing the zero KV columns (the unconditional model's cross
    features, models.py:727-736) at a third of the attention FLOPs.
    Layout: [B, H, S, D] like `attention`."""
    d = q.shape[-1]
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) / jnp.sqrt(
                            jnp.asarray(d, jnp.float32))
    m = jnp.maximum(jnp.max(logits, axis=-1, keepdims=True), 0.0)
    e = jnp.exp(logits - m)
    z = jnp.sum(e, axis=-1, keepdims=True) + num_zero_cols * jnp.exp(-m)
    probs = e / z
    return jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v)


def _block_apply_wpacked(params: dict, cfg: BlockConfig, x, emb):
    """The attention-free residual branch of block_apply on the width-packed
    layout (see the dispatch comment in block_apply). Mirrors the plain path
    statement-for-statement; per-pixel channel ops run on the [..., 2, C]
    view of the packed minor dim (free reshapes)."""
    from vivid_tpu.nn.mp import mp_conv_apply_wpacked
    from vivid_tpu.nn.wpack import packed_channel_op, tile_gain, wpack, wunpack

    xp = wpack(x)
    if cfg.flavor == "enc":
        if "conv_skip" in params:
            xp = mp_conv_apply_wpacked(params["conv_skip"], xp)
        xp = packed_channel_op(xp, lambda v: normalize(v, axis=-1))

    y = mp_conv_apply_wpacked(params["conv_res0"], mp_silu(xp))
    c = mp_conv_apply(params["emb_linear"], emb, gain=params["emb_gain"]) + 1.0
    y = mp_silu(y * tile_gain(c)[:, None, None, :].astype(y.dtype))
    y = mp_conv_apply_wpacked(params["conv_res1"], y)

    if cfg.flavor == "dec" and "conv_skip" in params:
        xp = mp_conv_apply_wpacked(params["conv_skip"], xp)
    xp = mp_sum(xp, y, t=cfg.res_balance)
    if cfg.clip_act is not None:
        xp = jnp.clip(xp, -cfg.clip_act, cfg.clip_act)
    return wunpack(xp)


def block_apply(params: dict, cfg: BlockConfig, x, emb,
                features: Optional[List[jax.Array]] = None,
                src_geometries: Optional[List[jax.Array]] = None,
                train: bool = False, dropout_key=None):
    """x: [B, H, W, Cin]; emb: [B, cemb]; features: list of [B, h, w, Cout]
    cross-attention sources (xattn only).

    Under an active core.sharding.act_sharding context the block pins its
    activations to the mesh (tensor parallel: conv channels + attention
    heads; sequence parallel: image rows) — no-ops otherwise."""
    from vivid_tpu.core.sharding import act_spec_active

    # Width-packed execution (nn/wpack.py): attention-free narrow-channel
    # blocks at large spatial resolution (the SR 256px level 0) run their
    # whole residual branch on a [B, H, W/2, 2C] layout — fills the TPU's
    # 128 lanes/MXU that C=64 half-fills. Exact numerics (embedded kernels;
    # tests/test_wpack.py, test_wpack_model.py). Dropout's mask layout
    # differs on the packed shape, so training with dropout>0 falls back.
    if (cfg.wpack and cfg.num_heads == 0 and cfg.resample_mode == "keep"
            and x.shape[2] % 2 == 0 and not (train and cfg.dropout > 0)
            and not act_spec_active()):
        return _block_apply_wpacked(params, cfg, x, emb)

    x = resample(x, cfg.resample_mode)
    x = constrain(x, "conv")
    if cfg.flavor == "enc":
        if "conv_skip" in params:
            x = mp_conv_apply(params["conv_skip"], x)
        x = normalize(x, axis=-1)  # pixel norm over channels

    # Residual branch.
    y = mp_conv_apply(params["conv_res0"], mp_silu(x))
    c = mp_conv_apply(params["emb_linear"], emb, gain=params["emb_gain"]) + 1.0
    y = mp_silu(y * c[:, None, None, :].astype(y.dtype))
    if train and cfg.dropout > 0:
        assert dropout_key is not None, "dropout requires a key in training mode"
        keep = jax.random.bernoulli(dropout_key, 1.0 - cfg.dropout, y.shape)
        y = jnp.where(keep, y / (1.0 - cfg.dropout), 0.0).astype(y.dtype)
    y = mp_conv_apply(params["conv_res1"], y)

    if cfg.flavor == "dec" and "conv_skip" in params:
        x = mp_conv_apply(params["conv_skip"], x)
    x = mp_sum(x, y, t=cfg.res_balance)

    # Attention. q/k/v stay RAW (un-normalized) through the split/concat and
    # the packed kernels pixel-normalize per D-vector in-kernel (one HBM
    # pass; same math — rowwise normalization is concat-order invariant).
    # The packed path now covers TRAINING too: the custom VJP dispatches to
    # from-scratch packed Pallas backward kernels (kernels/flash.py
    # flash_fused_packed_bwd / _xattn_bwd) that recompute the softmax state
    # per row and write dqkv/dfeats straight back in the packed layout — no
    # swapaxes copies in either pass.
    if cfg.num_heads != 0:
        from vivid_tpu.core.sharding import act_spec_active
        from vivid_tpu.kernels.attention import (attention_from_raw,
                                                 self_attention_from_packed)
        b, h, w, ch = x.shape

        # Packed fast paths: the packed kernels read q/k/v straight from
        # the conv outputs and write (head, d)-packed — the reshapes below
        # are free views, no swapaxes passes. Epipolar biases ride into the
        # packed kernel's cross segments. Under act_sharding keep the
        # constrained path (GSPMD can't partition the packed custom calls).
        use_packed = not act_spec_active()
        if use_packed:
            from jax.ad_checkpoint import checkpoint_name
            from vivid_tpu.kernels.attention import xattn_from_packed
            as_dot = _attn_dot()
            if as_dot:
                flat_qkv = _packed_qkv_conv(params["attn_qkv"],
                                            x.reshape(b, h * w, ch),
                                            cfg.num_heads, 3)
            else:
                qkv = _packed_qkv_conv(params["attn_qkv"], x,
                                       cfg.num_heads, 3)
                flat_qkv = qkv.reshape(b, h * w, qkv.shape[-1])
            if not cfg.xattn or features == "zeros":
                sink = cfg.num_cross_sources * h * w if cfg.xattn else 0
                y = self_attention_from_packed(flat_qkv, cfg.num_heads,
                                               zero_sink=sink)
            else:
                assert features is not None and \
                    len(features) == cfg.num_cross_sources
                if as_dot:
                    kvs = tuple(
                        _packed_qkv_conv(
                            params["x_attn_kv"],
                            feat.astype(x.dtype).reshape(
                                b, feat.shape[1] * feat.shape[2], -1),
                            cfg.num_heads, 2)
                        for feat in features)
                else:
                    kvs = tuple(
                        _packed_qkv_conv(params["x_attn_kv"],
                                         feat.astype(x.dtype), cfg.num_heads,
                                         2)
                        .reshape(b, feat.shape[1] * feat.shape[2], -1)
                        for feat in features)
                ep_biases = ()
                if "epipolar_mixing" in params and src_geometries is not None:
                    patch = cfg.imsize // h
                    ep_biases = tuple(
                        get_epipolar_attn(
                            get_epipolar_dist(geo, cfg.imsize, patch),
                            params["epipolar_mixing"], patch_size=patch)
                        for geo in src_geometries)
                y = xattn_from_packed(flat_qkv, kvs, cfg.num_heads,
                                      biases=ep_biases)
            y = checkpoint_name(y, "attn_out")
            if as_dot:
                y = mp_conv_apply(_as_linear(params["attn_proj"]), y)
                y = y.reshape(b, h, w, ch)
            else:
                y = mp_conv_apply(params["attn_proj"], y.reshape(b, h, w, ch))
            x = mp_sum(x, y, t=cfg.attn_balance)
            if cfg.clip_act is not None:
                x = jnp.clip(x, -cfg.clip_act, cfg.clip_act)
            return x

        qkv = _packed_qkv_conv(params["attn_qkv"], x, cfg.num_heads, 3)
        q, k, v = (constrain(t, "heads")
                   for t in _split_qkv(qkv, cfg.num_heads, 3,
                                       normalize_parts=train))

        bias = None
        zero_sink = 0
        if cfg.xattn and features == "zeros":
            # Unconditional model: cross features are exact zeros — a
            # closed-form probability sink instead of 2S zero KV columns.
            zero_sink = cfg.num_cross_sources * h * w
        elif cfg.xattn:
            assert features is not None and len(features) == cfg.num_cross_sources
            ks, vs = [k], [v]
            for feat in features:
                kv = _packed_qkv_conv(params["x_attn_kv"], feat.astype(x.dtype),
                                      cfg.num_heads, 2)
                kc, vc = _split_qkv(kv, cfg.num_heads, 2, normalize_parts=train)
                ks.append(constrain(kc, "heads"))
                vs.append(constrain(vc, "heads"))
            s_self = k.shape[2]
            k = jnp.concatenate(ks, axis=2)
            v = jnp.concatenate(vs, axis=2)
            if "epipolar_mixing" in params and src_geometries is not None:
                patch = cfg.imsize // h
                biases = [jnp.zeros((b, cfg.num_heads, h * w, s_self), jnp.float32)]
                for geo, feat in zip(src_geometries, features):
                    dist = get_epipolar_dist(geo, cfg.imsize, patch)
                    ep = get_epipolar_attn(dist, params["epipolar_mixing"], patch_size=patch)
                    biases.append(ep)  # upstream adds [B, H, Sq, Sk_cross] as-is
                bias = jnp.concatenate(biases, axis=-1)

        if train:
            y = (attention_with_zero_sink(q, k, v, zero_sink) if zero_sink
                 else attention(q, k, v, bias=bias))
        else:
            from jax.ad_checkpoint import checkpoint_name
            y = checkpoint_name(
                attention_from_raw(q, k, v, bias=bias, zero_sink=zero_sink),
                "attn_out")
        # [B,H,S,D] -> [B,S,H*D]: (head, d) channel packing == torch order.
        y = jnp.swapaxes(y, 1, 2).reshape(b, h, w, ch)
        y = mp_conv_apply(params["attn_proj"], y)
        x = mp_sum(x, y, t=cfg.attn_balance)

    if cfg.clip_act is not None:
        x = jnp.clip(x, -cfg.clip_act, cfg.clip_act)
    return x
