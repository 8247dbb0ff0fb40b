"""Fused flash attention for the VIVID blocks (forward kernel).

Written from scratch for this model's attention shape (reference
models.py:187-198: pixel-normalized q/k/v, D=64, S in {256, 1024}, cross-KV
up to 3S, optional epipolar logit bias, and the unconditional model's
zero-feature sink). Differences from the stock
jax.experimental.pallas.ops.tpu.flash_attention this replaces on the hot
path:

  * **In-kernel RMS-normalize** of raw q/k/v tiles (the reference's pixel
    norm, models.py:37-42 semantics: x / (eps + ||x||/sqrt(D)), fp32). The
    separate XLA normalize passes over the packed qkv were ~1.4 ms of the
    ch=64 forward; inside the kernel the normalize is free (VPU work under a
    bandwidth-bound loop). A standalone Pallas normalize measured as a net
    LOSS (docs/PERF.md) — owning the consumer is what makes fusion pay.
  * **Zero-sink term**: `zero_sink_cols` emulates that many all-zero KV
    columns in closed form (each contributes logit 0 and value 0 — a
    constant exp(-m)·cols mass in the softmax denominator). This puts the
    unconditional gnet — half of every guided sampler step — on the flash
    path; it previously fell back to a full einsum materializing [B,H,S,Sk]
    logits (blocks.py attention_with_zero_sink).
  * Bias is the UNSCALED additive logit bias (kernel computes
    q·k * sm_scale + bias), so callers don't pre-divide by sm_scale.

Backward: `flash_fused` is wrapped in jax.custom_vjp; the backward re-runs
the unfused composite (XLA normalize -> stock flash kernel, which has its
own Pallas backward) under jax.vjp — exactly what remat would recompute
anyway. Numerics match the unfused path to bf16 tolerance (fp32 softmax in
both; parity-tested in tests/test_flash_fused.py).

Layouts: q [B, H, Sq, D]; k/v [B, H, Sk, D]; bias [B, H, Sq, Sk] or None;
out [B, H, Sq, D] in v.dtype.
"""

import functools
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _out_struct(shape, dtype, like):
    """Output aval for pallas_call, inheriting the input's varying-manual-axes
    set so the kernels compose with jax.shard_map (the DP serving and TP
    per-head-shard paths run these kernels per-shard on pods; without the vma
    the shard_map check_vma pass rejects the custom call)."""
    vma = getattr(jax.typeof(like), "vma", None)
    if vma:
        return jax.ShapeDtypeStruct(shape, dtype, vma=vma)
    return jax.ShapeDtypeStruct(shape, dtype)


def _rms_norm(x, norm_eps: Optional[float], out_scale: Optional[float] = None):
    """Reference pixel norm (mp.normalize semantics) on a 2-D tile, fp32
    math, result back in the input dtype: the QK^T and PV dots must run at
    the MXU's bf16 rate (fp32 operands quarter it). `out_scale` folds a
    constant (the softmax scale) into this tiny tile instead of a
    [cq, Sk] multiply on the logits."""
    if norm_eps is None:
        if out_scale is None:
            return x
        return (x.astype(jnp.float32) * out_scale).astype(x.dtype)
    x32 = x.astype(jnp.float32)
    ss = jnp.sum(x32 * x32, axis=-1, keepdims=True)
    inv_sqrt_d = 1.0 / (x.shape[-1] ** 0.5)
    den = norm_eps + inv_sqrt_d * jnp.sqrt(ss)
    if out_scale is None:
        return (x32 / den).astype(x.dtype)
    return (x32 * (out_scale / den)).astype(x.dtype)


def _kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, acc_ref, m_ref, l_ref, *,
            sm_scale: float, norm_eps: Optional[float], zero_sink: int,
            n_k: int):
    """Grid (B, H, n_q, n_k); k-loop is the innermost (minor) grid axis, so
    the online-softmax state lives in VMEM scratch across k steps."""
    ik = pl.program_id(3)

    @pl.when(ik == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    q = _rms_norm(q_ref[0, 0], norm_eps)                        # [bq, D]
    k = _rms_norm(k_ref[0, 0], norm_eps)                        # [bk, D]
    v = _rms_norm(v_ref[0, 0], norm_eps)                        # [bk, D]

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * sm_scale
    if bias_ref is not None:
        s = s + bias_ref[0, 0].astype(jnp.float32)

    m_prev = m_ref[...]                                         # [bq, 128]
    l_prev = l_ref[...]
    m_cur = jnp.max(s, axis=-1, keepdims=True)                  # [bq, 1]
    m_next = jnp.maximum(m_prev, jnp.broadcast_to(m_cur, m_prev.shape))
    alpha = jnp.exp(m_prev - m_next)                            # [bq, 128]
    p = jnp.exp(s - m_next[:, :1])                              # [bq, bk]
    l_ref[...] = alpha * l_prev + jnp.broadcast_to(
        jnp.sum(p, axis=-1, keepdims=True), l_prev.shape)
    m_ref[...] = m_next
    acc_ref[...] = acc_ref[...] * alpha[:, :1] + jax.lax.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32)

    @pl.when(ik == n_k - 1)
    def _finalize():
        m_fin = m_ref[:, :1]
        l_fin = l_ref[:, :1]
        if zero_sink:
            # `zero_sink` all-zero KV columns: logit 0, value 0 -> they only
            # add exp(0 - m) * cols mass to the denominator (after raising
            # the running max to at least 0, matching max(m, 0) exactly).
            m0 = jnp.maximum(m_fin, 0.0)
            l_fin = l_fin * jnp.exp(m_fin - m0) + zero_sink * jnp.exp(-m0)
            acc = acc_ref[...] * jnp.exp(m_fin - m0)
        else:
            acc = acc_ref[...]
        o_ref[0, 0] = (acc / l_fin).astype(o_ref.dtype)


def pick_q_chunk(s: int, sk_total: int, num_heads: int, tiles: int = 2,
                 budget_bytes: int = 56 * 2 ** 20) -> int:
    """Query-chunk length for the packed whole-row kernels. Mosaic's stack
    allocator does NOT reuse buffers across the statically-unrolled head
    loop (measured: the SR 32x32 xattn shape at H=8 requested 96.74 MB and
    failed to compile), so the fp32 logit working set scales as
    num_heads * tiles * cq * sk (`tiles` = live fp32 [cq, Sk] buffers per
    head: 2 for the forward, ~5 for the backward's logits/p/p~/dP~/dS).
    Pick the largest 64-multiple divisor of `s` that keeps that product
    under `budget_bytes`; the kernels loop over query chunks with
    jax.lax.fori_loop (buffers ARE reused across dynamic loop iterations).

    The result always divides `s` exactly — for tiny or oddly-sized S
    (direct/test callers; the model gate requires s % 64 == 0) the largest
    divisor <= 64 is used so the chunk loop covers every row."""
    for cq in (2048, 1024, 512, 256, 128, 64):
        if cq <= s and s % cq == 0 and \
                num_heads * tiles * cq * sk_total * 4 <= budget_bytes:
            return cq
    for cq in range(min(s, 64), 0, -1):
        if s % cq == 0:
            return cq
    return s


def _bwd_interleave() -> int:
    """VIVID_BWD_ILV=n (n > 1) splits a whole-row-ELIGIBLE backward into n
    query chunks with STATICALLY UNROLLED bodies (separate buffers, unlike
    the serial fori_loop chunking) — the round-5 schedule experiment: if
    Mosaic's stack-buffer reuse is what serializes the whole-row backward's
    dataflow-independent segment chains (docs/PERF.md "remaining
    backward-kernel lead"), n independent half-size chains it cannot merge
    should overlap MXU dots with VPU exp/tmp passes. Exact: same math, same
    accumulation order as the fori_loop form. Trace-time flag (read when
    the train step is traced, like VIVID_NOMAX_PACKED); default 1 (off)
    until a chip A/B proves it. Total live-tile estimate is unchanged (n x 5 x (S/n) x
    Sk), but if the allocator refuses cross-body reuse AND keeps per-head
    buffers live too, the compile can exceed VMEM — that failure mode is
    the experiment's point and is safe to probe (flag-gated)."""
    import os
    try:
        return max(1, int(os.environ.get("VIVID_BWD_ILV", "1")))
    except ValueError:
        return 1


def pick_q_chunk_bwd(s: int, sk_total: int, num_heads: int):
    """(cq, live-tile byte estimate, static_chunks) for the packed BACKWARD
    kernels. `static_chunks` tells the kernel to unroll the S//cq chunk
    bodies statically instead of fori_loop-ing (only ever set inside the
    whole-row-eligible envelope, via VIVID_BWD_ILV — see _bwd_interleave).

    Whole-row backward is chip-PROVEN across the H<=6 production envelope:
    ch=64 H=2 and flagship H=4 train steps at Sk=3S (5 x [1024, 3072] fp32
    tiles = 63 MB) and the H=4/H=6 grad-parity tests all compiled and ran
    under the 96 MB limit — in the backward's straight-line per-head code
    Mosaic DOES reuse the sequential [S, Sk] tiles (unlike the forward,
    where 8 unrolled heads kept ~1 tile each live and OOM'd). Chunking a
    proven whole-row shape costs ~4% (measured 89.7 -> 93.0 ms ch=64), so
    keep whole rows inside the proven envelope and chunk only beyond it
    (e.g. SR H=8, estimated per-head: the conservative model that matches
    the forward's measured behavior)."""
    if num_heads <= 6 and 5 * s * sk_total * 4 <= 64 * 2 ** 20:
        ilv = _bwd_interleave()
        if ilv > 1 and s % (64 * ilv) == 0:
            return s // ilv, 5 * s * sk_total * 4, True
        return s, 5 * s * sk_total * 4, False
    cq = pick_q_chunk(s, sk_total, num_heads, tiles=5)
    return cq, num_heads * 5 * cq * sk_total * 4, False


def _kernel_packed(x_ref, o_ref, *, H: int, d: int, cq: int, sm_scale: float,
                   norm_eps: Optional[float], zero_sink: int,
                   no_max: bool = False):
    """Whole-sequence self-attention on one batch row of the packed conv
    output. x_ref [1, S, 3*H*D] part-major; heads run as a static loop with
    lane slices (the whole per-batch slice is <1 MB — q, k and v are the
    SAME rows, so there is nothing to tile). Per head, queries run in
    chunks of `cq` rows under fori_loop so the fp32 logit buffers stay
    small and are reused across iterations (see pick_q_chunk)."""
    x = x_ref[0]                                            # [S, 3HD]
    S = x.shape[0]

    for h in range(H):
        k = _rms_norm(x[:, (H + h) * d:(H + h + 1) * d], norm_eps)
        v = _rms_norm(x[:, (2 * H + h) * d:(2 * H + h + 1) * d], norm_eps)

        def q_chunk(i, _, h=h, k=k, v=v):
            q0 = i * cq
            # Chunk loads come from the REF with pl.ds — lax.dynamic_slice
            # on a materialized value has no Mosaic TPU lowering.
            if no_max:
                # Shiftless softmax (see flash_nomax): the in-kernel RMS
                # norm bounds every row by sqrt(d), so scaled logits are
                # bounded by sqrt(d) and exp(s) <= e^sqrt(d) (~3e3 at d=64)
                # cannot overflow; softmax is shift-invariant, so the
                # rowmax pass, the [cq, S] scale multiply (folded into q
                # here) AND the shift subtract are all unnecessary. Exact.
                q = _rms_norm(x_ref[0, pl.ds(q0, cq), h * d:(h + 1) * d],
                              norm_eps, out_scale=sm_scale)
                s = jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                p = jnp.exp(s)
                l = jnp.sum(p, axis=-1, keepdims=True)
                if zero_sink:
                    # zero-sink columns carry logit 0: mass exactly zs.
                    l = l + float(zero_sink)
            else:
                q = _rms_norm(x_ref[0, pl.ds(q0, cq), h * d:(h + 1) * d],
                              norm_eps)
                s = jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) * sm_scale
                m = jnp.max(s, axis=-1, keepdims=True)
                if zero_sink:
                    m = jnp.maximum(m, 0.0)
                p = jnp.exp(s - m)
                l = jnp.sum(p, axis=-1, keepdims=True)
                if zero_sink:
                    l = l + zero_sink * jnp.exp(-m)
            out = jax.lax.dot(p.astype(v.dtype), v,
                              preferred_element_type=jnp.float32) / l
            o_ref[0, pl.ds(q0, cq), h * d:(h + 1) * d] = out.astype(
                o_ref.dtype)
            return ()

        if S // cq == 1:
            q_chunk(0, ())  # static single chunk — no loop machinery
        else:
            jax.lax.fori_loop(0, S // cq, q_chunk, (), unroll=False)


def flash_fused_packed(qkv, num_heads: int, *, sm_scale: Optional[float] = None,
                       norm_eps: Optional[float] = 1e-4, zero_sink: int = 0,
                       interpret: bool = False):
    """Self-attention straight off the packed qkv conv output.

    qkv: [B, S, 3*H*D] with channels permuted part-major (part, head, d) —
    exactly what the blocks' `_packed_qkv_conv` emits; output [B, S, H*D]
    in the attn_proj conv's expected (head, d) channel order. Zero layout
    copies on either side — this kills the [B,S,PH,D]<->[B,H,S,D] swapaxes
    passes (~2.5 ms of the traced ch=64 forward). One grid step per batch
    row: the whole packed slice is S x 3HD (0.75 MB at the hot shape), and
    the fp32 logit tile [S, S] is 4 MB at S=1024 — direct softmax, no
    online-softmax machinery."""
    b, s, c3 = qkv.shape
    d = c3 // (3 * num_heads)
    assert c3 == 3 * num_heads * d
    if sm_scale is None:
        sm_scale = 1.0 / (d ** 0.5)
    H = num_heads

    cq = pick_q_chunk(s, s, H)
    assert s % cq == 0, (s, cq)
    # no_max: with in-kernel RMS norm (or the callers' pre-normalized
    # contract when norm_eps is None) logits are bounded by sqrt(d), so
    # constant-shift softmax is exact — see _kernel_packed.
    kern = functools.partial(_kernel_packed, H=H, d=d, cq=cq,
                             sm_scale=float(sm_scale), norm_eps=norm_eps,
                             zero_sink=int(zero_sink), no_max=True)
    cost = pl.CostEstimate(
        flops=4 * b * H * s * s * d + (9 * b * s * c3
                                       if norm_eps is not None else 0),
        transcendentals=b * H * s * s,
        bytes_accessed=(qkv.size + b * s * H * d) * qkv.dtype.itemsize,
    )
    return pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, s, c3), lambda ib: (ib, 0, 0))],
        out_specs=pl.BlockSpec((1, s, H * d), lambda ib: (ib, 0, 0)),
        out_shape=_out_struct((b, s, H * d), qkv.dtype, qkv),
        cost_estimate=cost,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 2 ** 20),
        interpret=interpret,
    )(qkv)


def _kernel_packed_xattn(x_ref, *rest, H: int, d: int, cq: int, n_src: int,
                         n_bias: int, sm_scale: float,
                         norm_eps: Optional[float], no_max: bool = False):
    """Cross-attention on packed rows: x_ref [1, S, 3HD] (q + self-kv),
    then n_src feat refs [1, Sf, 2HD] ((k, v) part-major), then n_bias
    (0 or n_src) per-source logit-bias refs [1, H, S, Sf] (the epipolar
    path; the SELF segment carries no bias — blocks.py concatenates a zero
    block there). Joint softmax over the self segment and every cross
    segment — numerically identical to attention over the concatenated KV.
    Per head, queries run in chunks of `cq` rows under fori_loop so the
    fp32 logit buffers stay small and are reused (see pick_q_chunk; the
    unchunked form OOM'd Mosaic's stack at the SR 32x32 b>=16 shape)."""
    f_refs = rest[:n_src]
    b_refs = rest[n_src:n_src + n_bias]
    o_ref = rest[n_src + n_bias]
    x = x_ref[0]
    S = x.shape[0]

    for h in range(H):
        ks = [_rms_norm(x[:, (H + h) * d:(H + h + 1) * d], norm_eps)]
        vs = [_rms_norm(x[:, (2 * H + h) * d:(2 * H + h + 1) * d], norm_eps)]
        for fr in f_refs:
            f = fr[0]
            ks.append(_rms_norm(f[:, h * d:(h + 1) * d], norm_eps))
            vs.append(_rms_norm(f[:, (H + h) * d:(H + h + 1) * d], norm_eps))

        def q_chunk(i, _, h=h, ks=ks, vs=vs):
            q0 = i * cq
            # Ref load with pl.ds (lax.dynamic_slice on a value does not
            # lower in Mosaic TPU).
            if no_max:
                # Constant-shift softmax over the joint segments (see
                # _kernel_packed / flash_nomax) — only taken when no bias
                # segment exists (learned epipolar offsets would break the
                # sqrt(d) logit bound the in-kernel RMS norm guarantees).
                q = _rms_norm(x_ref[0, pl.ds(q0, cq), h * d:(h + 1) * d],
                              norm_eps, out_scale=sm_scale)
                logits = [jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) for k in ks]
                ps = [jnp.exp(s_) for s_ in logits]  # shiftless, see above
                l = sum(p.sum(axis=-1, keepdims=True) for p in ps)
                out = sum(jax.lax.dot(p.astype(v.dtype), v,
                                      preferred_element_type=jnp.float32)
                          for p, v in zip(ps, vs)) / l
                o_ref[0, pl.ds(q0, cq), h * d:(h + 1) * d] = out.astype(
                    o_ref.dtype)
                return ()
            q = _rms_norm(x_ref[0, pl.ds(q0, cq), h * d:(h + 1) * d],
                          norm_eps)
            logits = [jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                          preferred_element_type=jnp.float32)
                      * sm_scale for k in ks]
            for j, br in enumerate(b_refs):
                logits[1 + j] = logits[1 + j] + br[
                    0, h, pl.ds(q0, cq)].astype(jnp.float32)
            m = logits[0].max(axis=-1, keepdims=True)
            for s_ in logits[1:]:
                m = jnp.maximum(m, s_.max(axis=-1, keepdims=True))
            ps = [jnp.exp(s_ - m) for s_ in logits]
            l = sum(p.sum(axis=-1, keepdims=True) for p in ps)
            out = sum(jax.lax.dot(p.astype(v.dtype), v,
                                  preferred_element_type=jnp.float32)
                      for p, v in zip(ps, vs)) / l
            o_ref[0, pl.ds(q0, cq), h * d:(h + 1) * d] = out.astype(
                o_ref.dtype)
            return ()

        if S // cq == 1:
            q_chunk(0, ())  # static single chunk — no loop machinery
        else:
            jax.lax.fori_loop(0, S // cq, q_chunk, (), unroll=False)


def flash_fused_packed_xattn(qkv, feats, num_heads: int, *, biases=None,
                             sm_scale: Optional[float] = None,
                             norm_eps: Optional[float] = 1e-4,
                             interpret: bool = False):
    """Cross-attention straight off packed conv outputs: qkv [B, S, 3*H*D]
    (part-major q/k/v), feats: sequence of [B, Sf, 2*H*D] (part-major k/v
    from each cross source), biases: optional per-source UNSCALED logit
    biases [B, H, S, Sf] (epipolar path; self segment is bias-free).
    Output [B, S, H*D] (head, d)-packed."""
    b, s, c3 = qkv.shape
    d = c3 // (3 * num_heads)
    H = num_heads
    assert c3 == 3 * H * d
    for f in feats:
        assert f.shape[0] == b and f.shape[2] == 2 * H * d, f.shape
    biases = tuple(biases) if biases else ()
    assert not biases or len(biases) == len(feats)
    for bi, f in zip(biases, feats):
        assert bi.shape == (b, H, s, f.shape[1]), (bi.shape, f.shape)
    if sm_scale is None:
        sm_scale = 1.0 / (d ** 0.5)
    sk_total = s + sum(f.shape[1] for f in feats)

    cq = pick_q_chunk(s, sk_total, H)
    assert s % cq == 0, (s, cq)
    # Constant-shift softmax only without bias segments (learned epipolar
    # offsets break the sqrt(d) logit bound) — see _kernel_packed_xattn.
    kern = functools.partial(_kernel_packed_xattn, H=H, d=d, cq=cq,
                             n_src=len(feats), n_bias=len(biases),
                             sm_scale=float(sm_scale), norm_eps=norm_eps,
                             no_max=not biases)
    cost = pl.CostEstimate(
        flops=4 * b * H * s * sk_total * d + (3 * b * s * c3
                                              if norm_eps is not None else 0),
        transcendentals=b * H * s * sk_total,
        bytes_accessed=(qkv.size + sum(f.size for f in feats)
                        + b * s * H * d) * qkv.dtype.itemsize
        + sum(bi.size * bi.dtype.itemsize for bi in biases),
    )
    in_specs = [pl.BlockSpec((1, s, c3), lambda ib: (ib, 0, 0))]
    for f in feats:
        in_specs.append(pl.BlockSpec((1, f.shape[1], f.shape[2]),
                                     lambda ib: (ib, 0, 0)))
    for bi in biases:
        in_specs.append(pl.BlockSpec((1, H, s, bi.shape[3]),
                                     lambda ib: (ib, 0, 0, 0)))
    return pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, s, H * d), lambda ib: (ib, 0, 0)),
        out_shape=_out_struct((b, s, H * d), qkv.dtype, qkv),
        cost_estimate=cost,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 2 ** 20),
        interpret=interpret,
    )(qkv, *feats, *biases)


# ---------------------------------------------------------------------------
# Packed-layout BACKWARD kernels. Training previously kept the stock flash
# kernel (native Pallas backward, but [B,H,S,D] layout => swapaxes copies
# around every attention block); these put the packed zero-copy layout on the
# train path too. Whole-row recompute design: per batch row, re-derive the
# softmax state (deterministic, same math as the forward kernel), then the
# standard attention VJP
#     dv' = P~^T dO,  dP~ = dO v'^T,  dS = P~ o (dP~ - rowsum(P~ o dP~)),
#     dq' = dS k' * c,  dk' = dS^T q' * c
# (P~ = probabilities incl. the zero-sink mass; sink columns carry v=0 so
# their dP~ vanishes and the formulas are unchanged), followed by the
# RMS-norm VJP
#     dx = dy/(eps+r) - x * <x, dy> / (D r (eps+r)^2),   r = ||x||/sqrt(D)
# fused in-kernel, gradients written straight back in the packed layout.


def _norm_bwd(x_raw, dy, norm_eps: Optional[float]):
    """VJP of _rms_norm on a 2-D tile: x_raw raw input, dy fp32 cotangent."""
    if norm_eps is None:
        return dy
    x32 = x_raw.astype(jnp.float32)
    D = x_raw.shape[-1]
    r = jnp.sqrt(jnp.sum(x32 * x32, axis=-1, keepdims=True) / D)
    denom = norm_eps + r
    xdy = jnp.sum(x32 * dy, axis=-1, keepdims=True)
    # r == 0 => x == 0 => the second term's numerator is 0; guard the division.
    correction = x32 * (xdy / (D * denom * denom * jnp.maximum(r, 1e-30)))
    return dy / denom - correction


def _kernel_packed_bwd_common(x_ref, f_refs, b_refs, g_ref, dx_ref, df_refs,
                              db_refs, *, H: int, d: int, cq: int,
                              sm_scale: float, norm_eps: Optional[float],
                              zero_sink: int, no_max: bool = False,
                              static_chunks: bool = False):
    """Query-chunked backward shared by self- and cross-attention.

    Per head: normalize the k/v segments once (whole rows — [Sk_i, D] tiles
    are small), then loop over `cq`-row query chunks under fori_loop,
    recomputing that chunk's softmax state (deterministic, same math as the
    forward kernel) and applying the standard attention VJP
        dv' = P~^T dO,  dP~ = dO v'^T,  dS = P~ o (dP~ - rowsum(P~ o dP~)),
        dq' = dS k' * c,  dk' = dS^T q' * c
    (P~ includes the zero-sink mass; sink columns carry v=0 so their dP~
    vanishes and the formulas are unchanged). dq and dbias chunks are
    written directly; dk/dv accumulate across chunks in fp32 fori_loop
    carries ([Sk_i, D] — a few hundred KB), with the RMS-norm VJP
        dx = dy/(eps+r) - x * <x, dy> / (D r (eps+r)^2),   r = ||x||/sqrt(D)
    applied once per tensor at the end, everything written straight back in
    the packed layout. Chunking keeps the fp32 [cq, Sk] working set (5 live
    tiles per head) inside Mosaic's stack budget at every production shape —
    the whole-row form OOM'd at the SR 32x32 H=8 training shape."""
    S = x_ref.shape[1]

    for h in range(H):
        k_raws = [x_ref[0, :, (H + h) * d:(H + h + 1) * d]]
        v_raws = [x_ref[0, :, (2 * H + h) * d:(2 * H + h + 1) * d]]
        for fr in f_refs:
            k_raws.append(fr[0, :, h * d:(h + 1) * d])
            v_raws.append(fr[0, :, (H + h) * d:(H + h + 1) * d])
        khs = [_rms_norm(kr, norm_eps) for kr in k_raws]
        vhs = [_rms_norm(vr, norm_eps) for vr in v_raws]
        dt = khs[0].dtype

        def q_chunk(i, carry, h=h, khs=khs, vhs=vhs):
            dk_hats, dv_hats = carry
            q0 = i * cq
            # Chunk loads come from the REF with pl.ds — lax.dynamic_slice
            # on a materialized value has no Mosaic TPU lowering.
            q_raw = x_ref[0, pl.ds(q0, cq), h * d:(h + 1) * d]
            # Scale folded into the q tile (like the forward kernels): the
            # per-segment [cq, Sk] logit multiply disappears. dk inherits
            # the scale through qh; dq keeps one explicit [cq, d] multiply.
            qh = _rms_norm(q_raw, norm_eps, out_scale=sm_scale)
            dO = g_ref[0, pl.ds(q0, cq), h * d:(h + 1) * d].astype(
                jnp.float32)
            logits = []
            for j, kh in enumerate(khs):
                s_ = jax.lax.dot_general(
                    qh, kh, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                if 1 <= j <= len(b_refs):  # cross segment j-1 carries a bias
                    s_ = s_ + b_refs[j - 1][0, h, pl.ds(q0, cq)].astype(
                        jnp.float32)
                logits.append(s_)
            if no_max:
                # Shiftless softmax recompute: the in-kernel RMS norm bounds
                # every scaled logit by sqrt(d), so exp(s) <= e^sqrt(d)
                # (~3e3 at d=64) cannot overflow, and softmax is
                # shift-invariant — both the rowmax reduces AND the
                # [cq, Sk] shift subtract vanish. Zero-sink columns carry
                # logit 0 -> mass exactly zero_sink. Only taken when no
                # bias segment exists (a learned bias breaks the bound).
                ps = [jnp.exp(s_) for s_ in logits]
                l = sum(p.sum(axis=-1, keepdims=True) for p in ps)
                if zero_sink:
                    l = l + float(zero_sink)
            else:
                m = logits[0].max(axis=-1, keepdims=True)
                for s_ in logits[1:]:
                    m = jnp.maximum(m, s_.max(axis=-1, keepdims=True))
                if zero_sink:
                    m = jnp.maximum(m, 0.0)
                ps = [jnp.exp(s_ - m) for s_ in logits]
                l = sum(p.sum(axis=-1, keepdims=True) for p in ps)
                if zero_sink:
                    l = l + zero_sink * jnp.exp(-m)
            # The [cq, Sk] probability divisions are eliminated by keeping
            # everything in UNNORMALIZED p and folding 1/l into the small
            # [cq, d] operands of the output dots. With pt := p/l and
            # tmp := l*dS (per q row):
            #   dpt = dO v'^T                      (INDEPENDENT of s/p/l —
            #                                       overlaps the s dot+exp)
            #   rho_raw = rowsum(p.dpt) = l*rho
            #   tmp = p (dpt - rho_raw/l) = l * pt (dpt - rho)
            #   dq  = (tmp k') * scale/l           (row scale after the dot)
            #   dk  = tmp^T (q'/l)                 (fold into the q tile)
            #   dv  = p^T (dO/l)                   (fold into dO)
            #   dbias = tmp/l                      (biased path only)
            # Only [cq, 1]/[cq, d] scalings touch 1/l; no [cq, Sk] divide.
            dO16 = dO.astype(dt)
            dpts = [jax.lax.dot_general(dO16, vh, (((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.float32)
                    for vh in vhs]
            rinv = 1.0 / l                                   # [cq, 1]
            rho_l = sum(jnp.sum(p * dpt, axis=-1, keepdims=True)
                        for p, dpt in zip(ps, dpts)) * rinv   # = rho_raw/l
            tmps = [p * (dpt - rho_l) for p, dpt in zip(ps, dpts)]
            dq_hat = sum(
                jax.lax.dot(tmp.astype(dt), kh,
                            preferred_element_type=jnp.float32)
                for tmp, kh in zip(tmps, khs)) * (sm_scale * rinv)
            dq = _norm_bwd(q_raw, dq_hat, norm_eps)
            dx_ref[0, pl.ds(q0, cq), h * d:(h + 1) * d] = dq.astype(
                dx_ref.dtype)
            for jb, dbr in enumerate(db_refs):
                dbr[0, h, pl.ds(q0, cq)] = (tmps[1 + jb] * rinv).astype(
                    dbr.dtype)
            qh_l = (qh * rinv).astype(dt)
            gl16 = (dO * rinv).astype(dt)
            dk_hats = tuple(
                dkh + jax.lax.dot_general(tmp.astype(dt), qh_l,
                                          (((0,), (0,)), ((), ())),
                                          preferred_element_type=jnp.float32)
                for dkh, tmp in zip(dk_hats, tmps))
            dv_hats = tuple(
                dvh + jax.lax.dot_general(p.astype(dt), gl16,
                                          (((0,), (0,)), ((), ())),
                                          preferred_element_type=jnp.float32)
                for dvh, p in zip(dv_hats, ps))
            return dk_hats, dv_hats

        init = (tuple(jnp.zeros((kr.shape[0], d), jnp.float32)
                      for kr in k_raws),
                tuple(jnp.zeros((vr.shape[0], d), jnp.float32)
                      for vr in v_raws))
        if S // cq == 1:
            dk_hats, dv_hats = q_chunk(0, init)  # static single chunk
        elif static_chunks:
            # Statically-unrolled chunk bodies (VIVID_BWD_ILV): separate
            # buffers per body so their dot/exp chains stay independent for
            # Mosaic's scheduler. Same accumulation order as the fori_loop.
            carry = init
            for i in range(S // cq):
                carry = q_chunk(i, carry)
            dk_hats, dv_hats = carry
        else:
            dk_hats, dv_hats = jax.lax.fori_loop(0, S // cq, q_chunk, init,
                                                 unroll=False)

        dks = [_norm_bwd(kr, dkh, norm_eps)
               for kr, dkh in zip(k_raws, dk_hats)]
        dvs = [_norm_bwd(vr, dvh, norm_eps)
               for vr, dvh in zip(v_raws, dv_hats)]
        dx_ref[0, :, (H + h) * d:(H + h + 1) * d] = dks[0].astype(
            dx_ref.dtype)
        dx_ref[0, :, (2 * H + h) * d:(2 * H + h + 1) * d] = dvs[0].astype(
            dx_ref.dtype)
        for i, dfr in enumerate(df_refs):
            dfr[0, :, h * d:(h + 1) * d] = dks[1 + i].astype(dfr.dtype)
            dfr[0, :, (H + h) * d:(H + h + 1) * d] = \
                dvs[1 + i].astype(dfr.dtype)


def _kernel_packed_bwd(x_ref, g_ref, dx_ref, *, H: int, d: int, cq: int,
                       sm_scale: float, norm_eps: Optional[float],
                       zero_sink: int, static_chunks: bool = False):
    _kernel_packed_bwd_common(x_ref, (), (), g_ref, dx_ref, (), (),
                              H=H, d=d, cq=cq, sm_scale=sm_scale,
                              norm_eps=norm_eps, zero_sink=zero_sink,
                              no_max=True, static_chunks=static_chunks)


def flash_fused_packed_bwd(qkv, g, num_heads: int, *,
                           sm_scale: Optional[float] = None,
                           norm_eps: Optional[float] = 1e-4,
                           zero_sink: int = 0, interpret: bool = False):
    """Backward of flash_fused_packed: qkv [B, S, 3*H*D] (raw packed conv
    output), g [B, S, H*D] cotangent -> dqkv [B, S, 3*H*D]."""
    b, s, c3 = qkv.shape
    d = c3 // (3 * num_heads)
    if sm_scale is None:
        sm_scale = 1.0 / (d ** 0.5)
    H = num_heads
    cq, _, static_chunks = pick_q_chunk_bwd(s, s, H)
    assert s % cq == 0, (s, cq)
    kern = functools.partial(_kernel_packed_bwd, H=H, d=d, cq=cq,
                             sm_scale=float(sm_scale), norm_eps=norm_eps,
                             zero_sink=int(zero_sink),
                             static_chunks=static_chunks)
    cost = pl.CostEstimate(
        flops=10 * b * H * s * s * d,
        transcendentals=b * H * s * s,
        bytes_accessed=2 * qkv.size * qkv.dtype.itemsize
        + g.size * g.dtype.itemsize,
    )
    return pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, s, c3), lambda ib: (ib, 0, 0)),
                  pl.BlockSpec((1, s, H * d), lambda ib: (ib, 0, 0))],
        out_specs=pl.BlockSpec((1, s, c3), lambda ib: (ib, 0, 0)),
        out_shape=_out_struct((b, s, c3), qkv.dtype, qkv),
        cost_estimate=cost,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 2 ** 20),
        interpret=interpret,
    )(qkv, g)


def _kernel_packed_xattn_bwd(x_ref, *rest, H: int, d: int, cq: int,
                             n_src: int, n_bias: int, sm_scale: float,
                             norm_eps: Optional[float],
                             static_chunks: bool = False):
    f_refs = rest[:n_src]
    b_refs = rest[n_src:n_src + n_bias]
    g_ref = rest[n_src + n_bias]
    dx_ref = rest[n_src + n_bias + 1]
    df_refs = rest[n_src + n_bias + 2:n_src + n_bias + 2 + n_src]
    db_refs = rest[n_src + n_bias + 2 + n_src:]
    # n_bias is 0 or n_src: every biased segment precedes the unbiased ones
    # in the packed layout, matching _kernel_packed_bwd_common's j<=n_bias
    # bias application rule.
    _kernel_packed_bwd_common(x_ref, f_refs, b_refs, g_ref, dx_ref, df_refs,
                              db_refs, H=H, d=d, cq=cq, sm_scale=sm_scale,
                              norm_eps=norm_eps, zero_sink=0,
                              no_max=n_bias == 0,
                              static_chunks=static_chunks)


def flash_fused_packed_xattn_bwd(qkv, feats, g, num_heads: int, *,
                                 biases=None,
                                 sm_scale: Optional[float] = None,
                                 norm_eps: Optional[float] = 1e-4,
                                 interpret: bool = False):
    """Backward of flash_fused_packed_xattn. Returns
    (dqkv, tuple(dfeats), tuple(dbiases))."""
    b, s, c3 = qkv.shape
    d = c3 // (3 * num_heads)
    H = num_heads
    if sm_scale is None:
        sm_scale = 1.0 / (d ** 0.5)
    biases = tuple(biases) if biases else ()
    sk_total = s + sum(f.shape[1] for f in feats)
    cq, _, static_chunks = pick_q_chunk_bwd(s, sk_total, H)
    assert s % cq == 0, (s, cq)
    kern = functools.partial(_kernel_packed_xattn_bwd, H=H, d=d, cq=cq,
                             n_src=len(feats), n_bias=len(biases),
                             sm_scale=float(sm_scale), norm_eps=norm_eps,
                             static_chunks=static_chunks)
    cost = pl.CostEstimate(
        flops=10 * b * H * s * sk_total * d,
        transcendentals=b * H * s * sk_total,
        bytes_accessed=2 * (qkv.size + sum(f.size for f in feats))
        * qkv.dtype.itemsize + g.size * g.dtype.itemsize
        + 2 * sum(bi.size * bi.dtype.itemsize for bi in biases),
    )
    in_specs = [pl.BlockSpec((1, s, c3), lambda ib: (ib, 0, 0))]
    for f in feats:
        in_specs.append(pl.BlockSpec((1, f.shape[1], f.shape[2]),
                                     lambda ib: (ib, 0, 0)))
    for bi in biases:
        in_specs.append(pl.BlockSpec((1, H, s, bi.shape[3]),
                                     lambda ib: (ib, 0, 0, 0)))
    in_specs.append(pl.BlockSpec((1, s, H * d), lambda ib: (ib, 0, 0)))
    out_specs = [pl.BlockSpec((1, s, c3), lambda ib: (ib, 0, 0))]
    out_shapes = [_out_struct((b, s, c3), qkv.dtype, qkv)]
    for f in feats:
        out_specs.append(pl.BlockSpec((1, f.shape[1], f.shape[2]),
                                      lambda ib: (ib, 0, 0)))
        out_shapes.append(_out_struct(f.shape, f.dtype, qkv))
    for bi in biases:
        out_specs.append(pl.BlockSpec((1, H, s, bi.shape[3]),
                                      lambda ib: (ib, 0, 0, 0)))
        out_shapes.append(_out_struct(bi.shape, bi.dtype, qkv))
    res = pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        cost_estimate=cost,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 2 ** 20),
        interpret=interpret,
    )(qkv, *feats, *biases, g)
    n = len(feats)
    return res[0], tuple(res[1:1 + n]), tuple(res[1 + n:])


def flash_fused(q, k, v, bias=None, *, sm_scale: Optional[float] = None,
                norm_eps: Optional[float] = None, zero_sink: int = 0,
                block_q: int = 512, block_k: int = 1024,
                interpret: bool = False):
    """Forward-only fused attention (see module docstring). Raw (pre-norm)
    q/k/v when norm_eps is set; already-normalized inputs with
    norm_eps=None."""
    b, h, sq, d = q.shape
    sk = k.shape[2]
    block_q = min(block_q, sq)
    block_k = min(block_k, sk)
    assert sq % block_q == 0 and sk % block_k == 0, (sq, sk, block_q, block_k)
    if sm_scale is None:
        sm_scale = 1.0 / (d ** 0.5)
    n_q, n_k = sq // block_q, sk // block_k

    kern = functools.partial(_kernel, sm_scale=float(sm_scale),
                             norm_eps=norm_eps, zero_sink=int(zero_sink),
                             n_k=n_k)
    in_specs = [
        pl.BlockSpec((1, 1, block_q, d), lambda ib, ih, iq, ik: (ib, ih, iq, 0)),
        pl.BlockSpec((1, 1, block_k, d), lambda ib, ih, iq, ik: (ib, ih, ik, 0)),
        pl.BlockSpec((1, 1, block_k, d), lambda ib, ih, iq, ik: (ib, ih, ik, 0)),
    ]
    args = [q, k, v]
    if bias is not None:
        in_specs.append(pl.BlockSpec(
            (1, 1, block_q, block_k), lambda ib, ih, iq, ik: (ib, ih, iq, ik)))
        args.append(bias)
        body = kern
    else:
        body = lambda qr, kr, vr, *rest: kern(qr, kr, vr, None, *rest)

    # Analytic cost so XLA cost analysis (bench.py's FLOP numerator, the
    # scheduler) sees through the custom call like it does the stock kernel.
    cost = pl.CostEstimate(
        flops=4 * b * h * sq * sk * d + (6 * b * h * (sq + 2 * sk) * d
                                         if norm_eps is not None else 0),
        transcendentals=b * h * sq * sk,
        bytes_accessed=(q.size + k.size + v.size + b * h * sq * d)
        * q.dtype.itemsize + (bias.size * bias.dtype.itemsize
                              if bias is not None else 0),
    )

    return pl.pallas_call(
        body,
        grid=(b, h, n_q, n_k),
        cost_estimate=cost,
        # Whole-sequence blocks put the fp32 logit tile (up to 12 MB at
        # bq=1024 x bk=3072) in VMEM; the compiler's default scoped-VMEM
        # limit is a conservative 16 MB while v5e has 128 MiB physical.
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2 ** 20),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, block_q, d),
                               lambda ib, ih, iq, ik: (ib, ih, iq, 0)),
        out_shape=_out_struct((b, h, sq, d), v.dtype, q),
        scratch_shapes=[
            pltpu.VMEM((block_q, d), jnp.float32),     # acc
            pltpu.VMEM((block_q, 128), jnp.float32),   # running max
            pltpu.VMEM((block_q, 128), jnp.float32),   # running denom
        ],
        interpret=interpret,
    )(*args)


# ---------------------------------------------------------------------------
# No-max streaming attention for the big-S low-d shapes (the log-parity SR
# model attends at S=16384/4096 with head_dim=32 — reference models.py
# SRXAttnUNet cph=32; experiments/log.txt:720-792 param table).
#
# Why it exists: at d=32 the MXU pads both the 32-deep QK^T contraction and
# the 32-wide PV output to its 128 quantum, costing ~2.6 ps/logit — and the
# online-softmax VPU chain (rowmax, exp, rescale, rowsum) costs about the
# same, so a serial per-tile schedule lands at ~33 TF/s (stock flash,
# measured flat across all block sizes) while the padded-MXU structural cap
# is ~49 TF/s. This kernel deletes the VPU work that cannot overlap:
#
#   * **No online max.** The model pixel-normalizes q and k before
#     attention (mp.normalize: x / (eps + ||x||/sqrt(D)), so every row norm
#     is < sqrt(D) and every scaled logit is bounded by |q.k|/sqrt(D) <
#     sqrt(D). softmax(s) = exp(s - C)/sum(exp(s - C)) for ANY constant C —
#     with C = sqrt(D), exp(s - C) <= ~1 can never overflow, so the
#     running max, the alpha-rescale of the accumulator, and their VPU
#     chains are unnecessary. EXACT, not approximate; callers must pass
#     normalized q/k (all fused_attention call sites do — nn/blocks.py
#     split_qkv normalizes before the kernel).
#   * **Independent k-sub-chains** per grid step (chains=2): the two
#     dot->exp->dot chains have no data dependence, letting Mosaic overlap
#     one chain's exp (VPU) with the other's dots (MXU).
#   * sm_scale folded into the [bq, D] q tile instead of the [bq, bk]
#     logits.
#
# Measured (tools/nomax_attn_lab.py, v5e): [8,4,16384,32768,32] stock flash
# 33.4 TF/s -> 44.7; [8,6,4096,8192,32] 32.4 -> 43.2. Forward-only: the
# dispatch wrapper in kernels/attention.py keeps the stock flash backward.

def _kernel_nomax(q_ref, k_ref, v_ref, o_ref, acc_ref, l_ref, *,
                  sm_scale: float, shift: float, n_k: int, chains: int):
    """Grid (B, H, n_q, n_k), k innermost; acc/l scratch live across the
    k steps. p = exp(s - shift) with shift >= any possible scaled logit."""
    ik = pl.program_id(3)

    @pl.when(ik == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        l_ref[...] = jnp.zeros_like(l_ref)

    q = (q_ref[0, 0].astype(jnp.float32) * sm_scale).astype(q_ref.dtype)
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    bk = k.shape[0] // chains
    for c in range(chains):
        kc = k[c * bk:(c + 1) * bk]
        vc = v[c * bk:(c + 1) * bk]
        s = jax.lax.dot_general(q, kc, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        # shift=0 (the production unbiased path): exp(s) <= e^sqrt(D) under
        # the callers' normalized-q/k contract — the subtract disappears.
        p = jnp.exp(s - shift) if shift else jnp.exp(s)
        l_ref[...] = l_ref[...] + jnp.broadcast_to(
            jnp.sum(p, axis=-1, keepdims=True), l_ref.shape)
        acc_ref[...] = acc_ref[...] + jax.lax.dot(
            p.astype(vc.dtype), vc, preferred_element_type=jnp.float32)

    @pl.when(ik == n_k - 1)
    def _finalize():
        o_ref[0, 0] = (acc_ref[...] / l_ref[:, :1]).astype(o_ref.dtype)


def _kernel_nomax_biased(shift_ref, q_ref, k_ref, v_ref, bias_ref, o_ref,
                         acc_ref, l_ref, *, sm_scale: float, n_k: int,
                         chains: int):
    """Biased no-max variant: p = exp(q.k * scale + bias - shift) with a
    DYNAMIC shift scalar (SMEM) computed outside the kernel as
    sqrt(D) + max(bias) — the epipolar bias carries learned per-head offsets
    (geometry/epipolar.py get_epipolar_attn), so the static sqrt(D) bound of
    the unbiased kernel does not cover it. Still exact: softmax is invariant
    to any constant shift, and shift >= every possible logit means exp can
    never overflow. Same two-sub-chain schedule as _kernel_nomax."""
    ik = pl.program_id(3)

    @pl.when(ik == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        l_ref[...] = jnp.zeros_like(l_ref)

    shift = shift_ref[0]
    q = (q_ref[0, 0].astype(jnp.float32) * sm_scale).astype(q_ref.dtype)
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    bias = bias_ref[0, 0]
    bk = k.shape[0] // chains
    for c in range(chains):
        kc = k[c * bk:(c + 1) * bk]
        vc = v[c * bk:(c + 1) * bk]
        s = jax.lax.dot_general(q, kc, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = s + bias[:, c * bk:(c + 1) * bk].astype(jnp.float32)
        p = jnp.exp(s - shift)
        l_ref[...] = l_ref[...] + jnp.broadcast_to(
            jnp.sum(p, axis=-1, keepdims=True), l_ref.shape)
        acc_ref[...] = acc_ref[...] + jax.lax.dot(
            p.astype(vc.dtype), vc, preferred_element_type=jnp.float32)

    @pl.when(ik == n_k - 1)
    def _finalize():
        o_ref[0, 0] = (acc_ref[...] / l_ref[:, :1]).astype(o_ref.dtype)


def flash_nomax(q, k, v, bias=None, *, sm_scale: Optional[float] = None,
                block_q: int = 1024, block_k: int = 2048, chains: int = 2,
                interpret: bool = False):
    """Forward-only no-max attention (see block comment above). q/k MUST be
    pixel-normalized [B, H, S, D] (row norms < sqrt(D)). Unbiased: the
    constant softmax shift sqrt(D) is exact under that bound, baked into the
    kernel as a compile-time constant. Biased (the epipolar path): the shift
    becomes sqrt(D) + max(bias), one global jnp.max outside the kernel,
    passed in through SMEM — see _kernel_nomax_biased. No zero-sink (the
    production big-S SR shapes carry none)."""
    b, h, sq, d = q.shape
    sk = k.shape[2]
    block_q = min(block_q, sq)
    block_k = min(block_k, sk)
    assert sq % block_q == 0 and sk % block_k == 0, (sq, sk, block_q, block_k)
    if sm_scale is None:
        sm_scale = 1.0 / (d ** 0.5)
    if block_k % (128 * chains):
        chains = 1
    n_q, n_k = sq // block_q, sk // block_k
    cost = pl.CostEstimate(
        flops=4 * b * h * sq * sk * d,
        transcendentals=b * h * sq * sk,
        bytes_accessed=(q.size + k.size + v.size + b * h * sq * d)
        * q.dtype.itemsize + (bias.size * bias.dtype.itemsize
                              if bias is not None else 0),
    )
    in_specs = [
        pl.BlockSpec((1, 1, block_q, d),
                     lambda ib, ih, iq, ik: (ib, ih, iq, 0)),
        pl.BlockSpec((1, 1, block_k, d),
                     lambda ib, ih, iq, ik: (ib, ih, ik, 0)),
        pl.BlockSpec((1, 1, block_k, d),
                     lambda ib, ih, iq, ik: (ib, ih, ik, 0)),
    ]
    common = dict(
        grid=(b, h, n_q, n_k),
        cost_estimate=cost,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 2 ** 20),
        out_specs=pl.BlockSpec((1, 1, block_q, d),
                               lambda ib, ih, iq, ik: (ib, ih, iq, 0)),
        out_shape=_out_struct((b, h, sq, d), v.dtype, q),
        scratch_shapes=[
            pltpu.VMEM((block_q, d), jnp.float32),     # acc
            pltpu.VMEM((block_q, 128), jnp.float32),   # denom
        ],
        interpret=interpret,
    )
    if bias is None:
        # Shiftless: softmax is shift-invariant and exp(s) <= e^sqrt(D)
        # under the normalized-q/k contract, so no shift is needed at all.
        kern = functools.partial(_kernel_nomax, sm_scale=float(sm_scale),
                                 shift=0.0, n_k=n_k, chains=chains)
        return pl.pallas_call(kern, in_specs=in_specs, **common)(q, k, v)
    assert bias.shape == (b, h, sq, sk), (bias.shape, q.shape, k.shape)
    kern = functools.partial(_kernel_nomax_biased, sm_scale=float(sm_scale),
                             n_k=n_k, chains=chains)
    # Exact bound on every scaled logit: |q.k|*scale < sqrt(D) under the
    # callers' pixel-normalized contract, plus the bias max — one global
    # reduce over a tensor the kernel reads anyway.
    shift = (d * sm_scale
             + jnp.max(bias.astype(jnp.float32)).reshape(1))
    in_specs = ([pl.BlockSpec(memory_space=pltpu.SMEM)] + in_specs
                + [pl.BlockSpec((1, 1, block_q, block_k),
                                lambda ib, ih, iq, ik: (ib, ih, iq, ik))])
    return pl.pallas_call(kern, in_specs=in_specs, **common)(
        shift, q, k, v, bias)


# ---------------------------------------------------------------------------
# Grid-scheduled PACKED attention: the flash_nomax schedule reading q/k/v
# tiles STRAIGHT from the packed conv outputs. The whole-row packed kernels
# above (grid=(b,), heads statically unrolled, q chunks under fori_loop)
# measure ~50-56 TF/s at the flagship S=1024 shapes while the SAME math in
# flash_nomax's pipelined (B, H, nq, nk) grid runs 93.6 TF/s at d=64 — the
# whole-row form's single giant grid step leaves Mosaic nothing to pipeline.
# This kernel keeps the packed kernels' zero-copy property (part-major
# packing makes each head's part a contiguous d-wide channel block of
# [B, S, 3HD]) and the nomax grid: the n_k axis spans the self segment plus
# every cross segment via clipped index_maps (each segment's refs fetch a
# valid block on every step; pl.when picks the live one — the redundant DMA
# is ~100 KB/step against ~270 MFLOP/step of compute). Mosaic requires the
# last block dim be a multiple of 128 (or the full array dim), so blocks
# along the channel axis are W = max(d, 128) wide: one grid step fetches a
# HEAD GROUP of g = W/d adjacent heads (alignment gate: H % g == 0 and
# (H*d) % W == 0 so every part starts on a block boundary) and lane-slices
# the per-head d-columns from the loaded tile — the same value-slicing
# idiom the chip-proven whole-row kernels use. Joint softmax is exact
# without any max/shift bookkeeping: in-kernel RMS norm bounds scaled
# logits by sqrt(d), so shiftless exp accumulation over segments in fp32
# scratch IS the joint softmax (zero-sink columns carry exp(0)=1, added to
# the denominator at finalize; the l scratch holds each head's denominator
# broadcast over that head's d output columns so the finalize divide is one
# elementwise op). Unbiased only (learned epipolar offsets break the logit
# bound); biased shapes keep the whole-row kernels.

def _kernel_nomax_packed(*refs, g: int, d: int, n_segs: int, seg_offs,
                         sm_scale: float, norm_eps: Optional[float],
                         zero_sink: int, n_k: int, chains: int):
    """refs: q_ref, then (k_ref, v_ref) per segment (all [1, rows, g*d]
    head-group blocks), then o_ref, acc_ref, l_ref. Grid (B, H//g, n_q,
    n_k) with n_k spanning the concatenated KV segments; seg_offs[j] is
    segment j's first n_k step."""
    q_ref = refs[0]
    kv_refs = refs[1:1 + 2 * n_segs]
    o_ref, acc_ref, l_ref = refs[1 + 2 * n_segs:]
    ik = pl.program_id(3)

    @pl.when(ik == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        l_ref[...] = jnp.zeros_like(l_ref)

    qg = q_ref[0]
    qs = [_rms_norm(qg[:, i * d:(i + 1) * d], norm_eps, out_scale=sm_scale)
          for i in range(g)]
    for j in range(n_segs):
        lo, hi = seg_offs[j], seg_offs[j + 1]

        @pl.when((ik >= lo) & (ik < hi))
        def _seg(j=j):
            kg = kv_refs[2 * j][0]
            vg = kv_refs[2 * j + 1][0]
            outs, dens = [], []
            for i in range(g):
                k = _rms_norm(kg[:, i * d:(i + 1) * d], norm_eps)
                v = _rms_norm(vg[:, i * d:(i + 1) * d], norm_eps)
                bk = k.shape[0] // chains
                acc_i = l_i = None
                for c in range(chains):
                    kc = k[c * bk:(c + 1) * bk]
                    vc = v[c * bk:(c + 1) * bk]
                    s = jax.lax.dot_general(
                        qs[i], kc, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    # shiftless: |s| <= sqrt(d) by the norm bound
                    p = jnp.exp(s)
                    li = jnp.sum(p, axis=-1, keepdims=True)
                    oi = jax.lax.dot(p.astype(vc.dtype), vc,
                                     preferred_element_type=jnp.float32)
                    l_i = li if l_i is None else l_i + li
                    acc_i = oi if acc_i is None else acc_i + oi
                outs.append(acc_i)
                dens.append(jnp.broadcast_to(l_i, (l_i.shape[0], d)))
            acc_ref[...] = acc_ref[...] + jnp.concatenate(outs, axis=-1)
            l_ref[...] = l_ref[...] + jnp.concatenate(dens, axis=-1)

    @pl.when(ik == n_k - 1)
    def _finalize():
        l = l_ref[...]
        if zero_sink:
            l = l + float(zero_sink)
        o_ref[0] = (acc_ref[...] / l).astype(o_ref.dtype)


def flash_nomax_packed(qkv, feats=(), num_heads: int = 1, *,
                       sm_scale: Optional[float] = None,
                       norm_eps: Optional[float] = 1e-4, zero_sink: int = 0,
                       block_q: int = 1024, block_k: int = 1024,
                       chains: int = 2, interpret: bool = False):
    """Self- or joint cross-attention straight off the packed conv outputs
    with the grid-pipelined nomax schedule (see block comment above).

    qkv [B, S, 3*H*D] part-major; feats: sequence of [B, Sf, 2*H*D]
    part-major cross KV sources; output [B, S, H*D] (head, d)-packed —
    the same contract as flash_fused_packed / _xattn (kernels/flash.py).
    Requires S % block and Sf % block alignment plus head-group channel
    alignment — blocks along the packed channel axis are W = max(d, 128)
    wide (Mosaic's lane-dim block rule), each covering g = W/d heads, so
    H % g == 0 and (H*d) % W == 0 (the production shapes: d=64 H even,
    d=32 H % 4 == 0; the dispatch gate checks). Unbiased only."""
    b, s, c3 = qkv.shape
    d = c3 // (3 * num_heads)
    assert c3 == 3 * num_heads * d
    H = num_heads
    feats = tuple(feats)
    for f in feats:
        assert f.shape[0] == b and f.shape[2] == 2 * H * d, f.shape
    if sm_scale is None:
        sm_scale = 1.0 / (d ** 0.5)

    W = d if d % 128 == 0 else 128
    assert W % d == 0 and H % (W // d) == 0 and (H * d) % W == 0, (H, d)
    g = W // d
    pb = (H * d) // W  # channel blocks per part (q/k/v all H*d wide)

    bq = min(block_q, s)
    seg_lens = (s,) + tuple(f.shape[1] for f in feats)
    bk = min(block_k, min(seg_lens))
    assert s % bq == 0 and all(sl % bk == 0 for sl in seg_lens), \
        (s, seg_lens, bq, bk)
    if bk % (128 * chains):
        chains = 1
    n_q = s // bq
    seg_steps = [sl // bk for sl in seg_lens]
    seg_offs = tuple(int(x) for x in np.cumsum([0] + seg_steps))
    n_k = seg_offs[-1]
    n_segs = 1 + len(feats)

    def q_index(ib, ihg, iq, ik):
        return (ib, iq, ihg)

    def seg_index(off, steps, part_blocks):
        # Clipped: outside the segment's n_k range the ref re-fetches a
        # valid block (usually the one just used — no extra DMA churn).
        def index(ib, ihg, iq, ik, off=off, steps=steps, pb=part_blocks):
            jk = jnp.clip(ik - off, 0, steps - 1)
            return (ib, jk, pb + ihg)
        return index

    in_specs = [pl.BlockSpec((1, bq, W), q_index)]
    operands = [qkv]
    # Self segment: k/v live in qkv one/two part-widths (pb blocks) in.
    in_specs += [
        pl.BlockSpec((1, bk, W), seg_index(0, seg_steps[0], pb)),
        pl.BlockSpec((1, bk, W), seg_index(0, seg_steps[0], 2 * pb)),
    ]
    operands += [qkv, qkv]
    for j, f in enumerate(feats):
        in_specs += [
            pl.BlockSpec((1, bk, W), seg_index(seg_offs[1 + j],
                                               seg_steps[1 + j], 0)),
            pl.BlockSpec((1, bk, W), seg_index(seg_offs[1 + j],
                                               seg_steps[1 + j], pb)),
        ]
        operands += [f, f]

    sk_total = sum(seg_lens)
    cost = pl.CostEstimate(
        flops=4 * b * H * s * sk_total * d + (9 * b * s * c3
                                              if norm_eps is not None else 0),
        transcendentals=b * H * s * sk_total,
        bytes_accessed=(qkv.size + sum(f.size for f in feats)
                        + b * s * H * d) * qkv.dtype.itemsize,
    )
    kern = functools.partial(_kernel_nomax_packed, g=g, d=d, n_segs=n_segs,
                             seg_offs=seg_offs, sm_scale=float(sm_scale),
                             norm_eps=norm_eps, zero_sink=int(zero_sink),
                             n_k=n_k, chains=chains)
    return pl.pallas_call(
        kern,
        grid=(b, H // g, n_q, n_k),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, bq, W), q_index),
        out_shape=_out_struct((b, s, H * d), qkv.dtype, qkv),
        scratch_shapes=[
            pltpu.VMEM((bq, W), jnp.float32),   # acc (g heads side by side)
            pltpu.VMEM((bq, W), jnp.float32),   # per-head denom, broadcast d
        ],
        cost_estimate=cost,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 2 ** 20),
        interpret=interpret,
    )(*operands)
