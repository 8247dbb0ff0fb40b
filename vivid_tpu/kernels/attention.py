"""TPU attention kernels.

The model's attention (reference models.py:187-198 / 279-305) runs on
pixel-normalized q/k/v with SDPA scaling at S in {64, 256, 1024} and
cross-KV length up to 3S — low arithmetic intensity (D=64 contraction), so
the win is avoiding the [B,H,S,Sk] fp32 logit round-trip through HBM.

`fused_attention` dispatches:
  * TPU + large-enough S -> Pallas flash attention (blockwise online softmax,
    fp32 accumulation), with optional additive logit bias (epipolar path).
  * otherwise -> einsum + softmax (XLA fuses fine at tiny sizes; also the
    CPU/test path).
  * under tensor parallelism (act_sharding tp=...) the whole dispatch runs
    per-head-shard inside shard_map, so the Pallas kernel survives TP.

Layouts: q [B, H, Sq, D]; k/v [B, H, Sk, D]; bias [B, H, Sq, Sk] or None —
the flash kernel's native layout, produced directly by the blocks' packed
qkv split (no transposes on the hot path). Returns [B, H, Sq, D] in v.dtype.
Numerics match the einsum path to bf16 tolerance (fp32 softmax in both).
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp


def reference_attention(q, k, v, bias=None):
    d = q.shape[-1]
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) / jnp.sqrt(
                            jnp.asarray(d, jnp.float32))
    if bias is not None:
        logits = logits + bias.astype(logits.dtype)
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v)


@functools.lru_cache(maxsize=1)
def _flash():
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, flash_attention)
    return flash_attention, BlockSizes


def _largest_block(size: int, cap: int) -> int:
    """Largest divisor of `size` that is <= cap and a multiple of 128
    (the kernel's lane-width requirement); 0 if none exists."""
    best = 0
    for b in range(128, min(cap, size) + 1, 128):
        if size % b == 0:
            best = b
    return best


def _interpret() -> bool:
    """VIVID_PALLAS_INTERPRET=1 forces the Pallas kernel paths ON off-TPU,
    running the kernels in Pallas interpret mode. This exists so the
    multi-shard stories (DP serving shard_map, TP per-head-shard dispatch)
    can execute the REAL kernel dispatch with >1 shards on the CPU mesh —
    the real chip here is a 1-device mesh, so without this hook every
    multi-shard test would silently exercise only the XLA fallback."""
    import os
    return bool(os.environ.get("VIVID_PALLAS_INTERPRET"))


def _run_flash_interpret(q, k, v, bias):
    from vivid_tpu.kernels.flash import flash_fused
    return flash_fused(q, k, v, bias, norm_eps=None,
                       block_q=_largest_block(q.shape[2], 512),
                       block_k=_largest_block(k.shape[2], 1024),
                       interpret=True)


@jax.custom_vjp
def _flash_interpret(q, k, v):
    return _run_flash_interpret(q, k, v, None)


def _flash_interpret_fwd(q, k, v):
    return _flash_interpret(q, k, v), (q, k, v)


def _flash_interpret_bwd(res, g):
    q, k, v = res
    return jax.vjp(lambda q_, k_, v_: reference_attention(q_, k_, v_),
                   q, k, v)[1](g)


_flash_interpret.defvjp(_flash_interpret_fwd, _flash_interpret_bwd)


@jax.custom_vjp
def _flash_interpret_biased(q, k, v, bias):
    return _run_flash_interpret(q, k, v, bias)


def _flash_interpret_biased_fwd(q, k, v, bias):
    return _flash_interpret_biased(q, k, v, bias), (q, k, v, bias)


def _flash_interpret_biased_bwd(res, g):
    q, k, v, bias = res
    return jax.vjp(reference_attention, q, k, v, bias)[1](g)


_flash_interpret_biased.defvjp(_flash_interpret_biased_fwd,
                               _flash_interpret_biased_bwd)


def _use_pallas(q, k) -> bool:
    import os
    if os.environ.get("VIVID_DISABLE_PALLAS"):
        return False
    if jax.devices()[0].platform != "tpu" and not _interpret():
        return False
    sq, sk = q.shape[2], k.shape[2]
    # Pallas pays off once the logit matrix stops being tiny; block machinery
    # needs 128-multiple divisors of both sequence lengths.
    return (sq >= 256 and sk >= 256
            and _largest_block(sq, 512) > 0 and _largest_block(sk, 1024) > 0)


def fused_attention(q, k, v, bias: Optional[jax.Array] = None):
    """Public entry. Under an active tensor-parallel act_sharding context
    (heads sharded over the mesh's model axis) the kernel dispatch runs
    per-shard inside shard_map — attention is independent per (batch, head),
    so each device runs the Pallas kernel on its local head slice with zero
    collectives. GSPMD alone can't partition the Pallas custom call, and the
    fallback einsum path halved TP serving throughput."""
    from vivid_tpu.core.sharding import tp_heads_axes
    tp = tp_heads_axes(q)
    if tp is None:
        return _attention_local(q, k, v, bias)
    mesh, data_ax, tp_ax = tp
    from jax.sharding import PartitionSpec as P
    spec = P(data_ax, tp_ax, None, None)
    args, in_specs = (q, k, v), (spec, spec, spec)
    if bias is not None:
        args, in_specs = args + (bias,), in_specs + (spec,)
    # check_vma=False: the Pallas custom call inside doesn't carry varying-
    # manual-axes metadata through every internal primitive (JAX's own
    # suggested workaround); the in/out specs fully pin the data movement.
    fn = jax.shard_map(lambda *a: _attention_local(*a),
                       mesh=mesh, in_specs=in_specs, out_specs=spec,
                       check_vma=False)
    return fn(*args)


# ---------------------------------------------------------------------------
# Raw-input entry: q/k/v BEFORE pixel normalization. On TPU this dispatches
# to the from-scratch fused kernel (kernels/flash.py) that normalizes
# in-kernel and supports the zero-sink closed form — one HBM pass instead of
# XLA's separate normalize passes. Everywhere else (CPU, tiny S, active
# act_sharding) it falls back to the exact unfused composite.

def _xla_attention_from_raw(q, k, v, bias=None, zero_sink: int = 0,
                            eps: float = 1e-4):
    from vivid_tpu.nn.mp import normalize
    q, k, v = (normalize(t, axis=-1, eps=eps) for t in (q, k, v))
    if zero_sink:
        from vivid_tpu.nn.blocks import attention_with_zero_sink
        assert bias is None, "zero-sink path carries no bias"
        return attention_with_zero_sink(q, k, v, zero_sink)
    return fused_attention(q, k, v, bias)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _pallas_attention_from_raw(q, k, v, bias, zero_sink: int, eps: float):
    from vivid_tpu.kernels.flash import flash_fused
    sq, sk = q.shape[2], k.shape[2]
    # Whole-sequence blocks: q and k/v each stream through VMEM exactly once
    # (measured best at the S=1024/3S hot shape — 59.1 TF/s model-level vs
    # 56.7 at 512/1024). With a bias the [bq, bk] fp32 bias tile joins the
    # logits in VMEM, so halve the blocks to stay under the ~16 MB budget.
    bq_cap, bk_cap = (1024, 3072) if bias is None else (512, 1536)
    return flash_fused(q, k, v, bias, norm_eps=eps, zero_sink=zero_sink,
                       block_q=_largest_block(sq, bq_cap),
                       block_k=_largest_block(sk, bk_cap),
                       interpret=_interpret())


def _pallas_raw_fwd(q, k, v, bias, zero_sink, eps):
    return _pallas_attention_from_raw(q, k, v, bias, zero_sink, eps), \
        (q, k, v, bias)


def _pallas_raw_bwd(zero_sink, eps, res, g):
    # Backward = vjp of the exact unfused composite (XLA normalize -> stock
    # flash / einsum, both differentiable) — the same recompute remat does.
    q, k, v, bias = res
    if bias is None:
        _, vjp = jax.vjp(
            lambda q_, k_, v_: _xla_attention_from_raw(
                q_, k_, v_, None, zero_sink, eps), q, k, v)
        return vjp(g) + (None,)
    _, vjp = jax.vjp(
        lambda q_, k_, v_, b_: _xla_attention_from_raw(
            q_, k_, v_, b_, zero_sink, eps), q, k, v, bias)
    return vjp(g)


_pallas_attention_from_raw.defvjp(_pallas_raw_fwd, _pallas_raw_bwd)


def attention_from_raw(q, k, v, bias: Optional[jax.Array] = None,
                       zero_sink: int = 0, eps: float = 1e-4):
    """Attention over UN-normalized q/k/v [B, H, S, D] (the blocks' packed
    qkv split straight from the conv): pixel-normalize each D-vector, then
    softmax attention, with optional unscaled logit bias or `zero_sink`
    all-zero KV columns (models.py:727-736 uncond cross features) — mutually
    exclusive (the XLA composite and backward have no biased-sink form)."""
    from vivid_tpu.core.sharding import act_spec_active
    assert bias is None or not zero_sink, \
        "bias and zero_sink are mutually exclusive"
    if act_spec_active():
        # GSPMD partitions the XLA composite (any sharded program, not just
        # tp: a Pallas custom call in an sp-sharded graph forces gathers);
        # fused_attention inside it still does per-shard Pallas via
        # shard_map when tp shards the heads.
        return _xla_attention_from_raw(q, k, v, bias, zero_sink, eps)
    if not _use_pallas(q, k):
        return _xla_attention_from_raw(q, k, v, bias, zero_sink, eps)
    return _pallas_attention_from_raw(q, k, v, bias, zero_sink, eps)


# ---------------------------------------------------------------------------
# Packed-layout self-attention: q/k/v read straight from the [B, S, 3HD]
# qkv conv output (part-major channel permutation), output written back
# (head, d)-packed — no swapaxes passes at all. Self-attention and the
# unconditional zero-sink blocks only; cross-attention keeps the [B,H,S,D]
# entry (its KV concat spans multiple source arrays).

def _xla_self_attention_from_packed(qkv, num_heads: int, zero_sink: int,
                                    eps: float):
    """Exact unfused equivalent (also the backward for the packed kernel):
    slice the packed channels, run the raw-attention composite, re-pack."""
    b, s, c3 = qkv.shape
    d = c3 // (3 * num_heads)
    y = jnp.swapaxes(qkv.reshape(b, s, 3 * num_heads, d), 1, 2)
    q, k, v = (y[:, i * num_heads:(i + 1) * num_heads] for i in range(3))
    out = _xla_attention_from_raw(q, k, v, None, zero_sink, eps)
    return jnp.swapaxes(out, 1, 2).reshape(b, s, num_heads * d)


def _nomax_packed_on() -> bool:
    """VIVID_NOMAX_PACKED=1 swaps the packed kernels' FORWARD schedule for
    flash_nomax_packed (pipelined (B, H, n_q, n_k) grid, shiftless softmax —
    see kernels/flash.py). Trace-time flag for chip A/B; the backward stays
    on the whole-row packed kernels either way."""
    import os
    return os.environ.get("VIVID_NOMAX_PACKED", "0") == "1"


def _nomax_packed_ok(s: int, seg_lens=(), num_heads: int = 1,
                     head_dim: int = 64) -> bool:
    """flash_nomax_packed's alignment gate: every segment must tile by the
    common block (min(1024, shortest segment)), and the packed channel axis
    must tile by W = max(d, 128)-wide head-group blocks (Mosaic's lane-dim
    block rule): 128 % d == 0 (or d % 128 == 0) with H % (W/d) == 0."""
    bq = min(1024, s)
    bk = min(1024, min((s,) + tuple(seg_lens)))
    if s % bq or any(sl % bk for sl in seg_lens):
        return False
    d = head_dim
    w = d if d % 128 == 0 else 128
    return w % d == 0 and num_heads % (w // d) == 0 \
        and (num_heads * d) % w == 0


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _pallas_self_attention_packed(qkv, num_heads: int, zero_sink: int,
                                  eps: float):
    if _nomax_packed_on() and _nomax_packed_ok(
            qkv.shape[1], num_heads=num_heads,
            head_dim=qkv.shape[2] // (3 * num_heads)):
        from vivid_tpu.kernels.flash import flash_nomax_packed
        return flash_nomax_packed(qkv, (), num_heads, norm_eps=eps,
                                  zero_sink=zero_sink,
                                  interpret=_interpret())
    from vivid_tpu.kernels.flash import flash_fused_packed
    return flash_fused_packed(qkv, num_heads, norm_eps=eps,
                              zero_sink=zero_sink, interpret=_interpret())


def _packed_fwd(qkv, num_heads, zero_sink, eps):
    return _pallas_self_attention_packed(qkv, num_heads, zero_sink, eps), qkv


def _packed_bwd_fits(s: int, extra_lens, num_heads: int, head_dim: int,
                     itemsize: int, n_bias: int) -> bool:
    """Working-set estimate for the packed BACKWARD kernels: doubled IO
    (grads mirror every input and bias), the live [*, Sk] fp32 tile bytes
    from flash.pick_q_chunk_bwd (whole-row inside the chip-proven envelope,
    per-head chunked beyond it), the per-head normalized k/v segment tiles,
    and the fp32 dk/dv accumulators. Shapes still out of envelope (very
    long cross sources, big fp32 bias slabs) take the composite VJP instead
    of failing at Mosaic compile time."""
    from vivid_tpu.kernels.flash import pick_q_chunk_bwd
    sk = s + sum(extra_lens)
    hd = num_heads * head_dim
    io = 2 * (s * 3 * hd + sum(2 * sf * hd for sf in extra_lens)
              + s * hd) * itemsize
    bias = 2 * num_heads * s * sum(extra_lens[:n_bias] if n_bias else []) * 4
    _, tiles, _ = pick_q_chunk_bwd(s, sk, num_heads)
    kv = num_heads * 2 * sk * head_dim * itemsize
    acc = num_heads * 2 * sk * head_dim * 4
    return io + bias + tiles + kv + acc <= _PACKED_VMEM_BUDGET


def _packed_bwd(num_heads, zero_sink, eps, qkv, g):
    d = qkv.shape[2] // (3 * num_heads)
    if _packed_eligible(qkv.shape[1], num_heads=num_heads, head_dim=d,
                        itemsize=qkv.dtype.itemsize) and \
            _packed_bwd_fits(qkv.shape[1], (), num_heads, d,
                             qkv.dtype.itemsize, 0):
        from vivid_tpu.kernels.flash import flash_fused_packed_bwd
        return (flash_fused_packed_bwd(qkv, g, num_heads, norm_eps=eps,
                                       zero_sink=zero_sink,
                                       interpret=_interpret()),)
    _, vjp = jax.vjp(
        lambda x: _xla_self_attention_from_packed(x, num_heads, zero_sink,
                                                  eps), qkv)
    return vjp(g)


_pallas_self_attention_packed.defvjp(_packed_fwd, _packed_bwd)


def _xla_xattn_from_packed(qkv, feats, biases, num_heads: int, eps: float):
    """Exact unfused equivalent of the packed cross-attention kernel (also
    its backward): slice channels, concat KV (+ zero-padded self bias), run
    the raw composite."""
    b, s, c3 = qkv.shape
    d = c3 // (3 * num_heads)
    y = jnp.swapaxes(qkv.reshape(b, s, 3 * num_heads, d), 1, 2)
    q, k, v = (y[:, i * num_heads:(i + 1) * num_heads] for i in range(3))
    ks, vs = [k], [v]
    for f in feats:
        sf = f.shape[1]
        z = jnp.swapaxes(f.reshape(b, sf, 2 * num_heads, d), 1, 2)
        ks.append(z[:, :num_heads])
        vs.append(z[:, num_heads:])
    bias = None
    if biases:
        bias = jnp.concatenate(
            [jnp.zeros((b, num_heads, s, s), jnp.float32)]
            + [bi.astype(jnp.float32) for bi in biases], axis=-1)
    out = _xla_attention_from_raw(q, jnp.concatenate(ks, axis=2),
                                  jnp.concatenate(vs, axis=2), bias, 0, eps)
    return jnp.swapaxes(out, 1, 2).reshape(b, s, num_heads * d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _pallas_xattn_packed(qkv, feats, biases, num_heads: int, eps: float):
    if (not biases and _nomax_packed_on()
            and _nomax_packed_ok(qkv.shape[1],
                                 [f.shape[1] for f in feats],
                                 num_heads=num_heads,
                                 head_dim=qkv.shape[2] // (3 * num_heads))):
        # Unbiased only: learned epipolar offsets break the sqrt(D) logit
        # bound the shiftless exp relies on; biased shapes keep whole-row.
        from vivid_tpu.kernels.flash import flash_nomax_packed
        return flash_nomax_packed(qkv, feats, num_heads, norm_eps=eps,
                                  interpret=_interpret())
    from vivid_tpu.kernels.flash import flash_fused_packed_xattn
    return flash_fused_packed_xattn(qkv, feats, num_heads, biases=biases,
                                    norm_eps=eps, interpret=_interpret())


def _xattn_packed_fwd(qkv, feats, biases, num_heads, eps):
    return _pallas_xattn_packed(qkv, feats, biases, num_heads, eps), \
        (qkv, feats, biases)


def _xattn_packed_bwd(num_heads, eps, res, g):
    qkv, feats, biases = res
    d = qkv.shape[2] // (3 * num_heads)
    extra = [f.shape[1] for f in feats]
    if _packed_eligible(qkv.shape[1], extra, num_heads=num_heads, head_dim=d,
                        itemsize=qkv.dtype.itemsize, n_bias=len(biases)) and \
            _packed_bwd_fits(qkv.shape[1], extra, num_heads, d,
                             qkv.dtype.itemsize, len(biases)):
        from vivid_tpu.kernels.flash import flash_fused_packed_xattn_bwd
        dqkv, dfeats, dbiases = flash_fused_packed_xattn_bwd(
            qkv, feats, g, num_heads, biases=biases, norm_eps=eps,
            interpret=_interpret())
        return dqkv, dfeats, dbiases
    _, vjp = jax.vjp(
        lambda x, fs, bs: _xla_xattn_from_packed(x, fs, bs, num_heads, eps),
        qkv, feats, biases)
    return vjp(g)


_pallas_xattn_packed.defvjp(_xattn_packed_fwd, _xattn_packed_bwd)


_PACKED_VMEM_BUDGET = 88 * 2 ** 20  # kernels request 96 MB; leave headroom


def _packed_vmem_bytes(s: int, extra_lens, num_heads: int, head_dim: int,
                       itemsize: int, n_bias: int) -> int:
    """Working-set estimate for the whole-row packed FORWARD kernels:
    inputs/output rows + per-source fp32 bias slabs (fetched whole per grid
    step) + the per-head working set. Mosaic's stack allocator does NOT
    reuse buffers across the statically-unrolled head loop (an unchunked
    SR-shape kernel measured 96.74 MB requested vs its own 3-tile estimate
    of 38 MB), so per-head terms are multiplied by num_heads: the
    normalized k/v tiles live across the chunk loop, and ~2 fp32
    [cq, Sk] logit tiles live per head with cq from
    flash.pick_q_chunk (the kernels' fori_loop chunking DOES get reuse
    across chunk iterations)."""
    from vivid_tpu.kernels.flash import pick_q_chunk
    sk = s + sum(extra_lens)
    hd = num_heads * head_dim
    io = s * 3 * hd * itemsize + sum(sf * 2 * hd * itemsize
                                     for sf in extra_lens) + s * hd * itemsize
    bias = num_heads * s * sum(extra_lens[:n_bias] if n_bias else []) * 4
    cq = pick_q_chunk(s, sk, num_heads)
    logits = num_heads * 2 * cq * sk * 4
    kv = num_heads * 2 * sk * head_dim * itemsize
    return io + bias + logits + kv


def _packed_eligible(s: int, extra_lens=(), num_heads: int = 1,
                     head_dim: int = 64, itemsize: int = 2,
                     n_bias: int = 0) -> bool:
    """Shared gate for the packed whole-row kernels: TPU (or forced interpret
    mode), no act_sharding (the packed custom calls aren't partitionable over
    channels), lane-aligned sequence lengths, and a working set that fits the
    kernels' VMEM budget — out-of-envelope shapes (many/long cross sources,
    big fp32 bias slabs) take the XLA fallback instead of failing at Mosaic
    compile time."""
    import os
    from vivid_tpu.core.sharding import act_spec_active
    if os.environ.get("VIVID_DISABLE_PALLAS") or act_spec_active():
        return False
    if jax.devices()[0].platform != "tpu" and not _interpret():
        return False
    if not (64 <= s <= 2048 and s % 64 == 0
            and all(sf % 64 == 0 for sf in extra_lens)):
        return False
    return _packed_vmem_bytes(s, extra_lens, num_heads, head_dim, itemsize,
                              n_bias) <= _PACKED_VMEM_BUDGET


def xattn_from_packed(qkv, feats, num_heads: int, biases=(),
                      eps: float = 1e-4):
    """Cross-attention over packed conv outputs (see
    flash_fused_packed_xattn). feats: tuple of [B, Sf, 2*H*D]; biases: ()
    or one UNSCALED [B, H, S, Sf] logit bias per source (epipolar)."""
    d = qkv.shape[2] // (3 * num_heads)
    if not _packed_eligible(qkv.shape[1], [f.shape[1] for f in feats],
                            num_heads=num_heads, head_dim=d,
                            itemsize=qkv.dtype.itemsize,
                            n_bias=len(tuple(biases))):
        return _xla_xattn_from_packed(qkv, feats, tuple(biases), num_heads,
                                      eps)
    return _pallas_xattn_packed(qkv, tuple(feats), tuple(biases), num_heads,
                                eps)


def self_attention_from_packed(qkv, num_heads: int, zero_sink: int = 0,
                               eps: float = 1e-4):
    """qkv [B, S, 3*H*D] part-major-packed -> [B, S, H*D] attention output.
    Pallas packed kernel on TPU (zero layout copies); exact XLA composite
    elsewhere and under act_sharding (the packed call isn't partitionable
    over channels)."""
    b, s, c3 = qkv.shape
    assert c3 % (3 * num_heads) == 0
    if not _packed_eligible(s, num_heads=num_heads,
                            head_dim=c3 // (3 * num_heads),
                            itemsize=qkv.dtype.itemsize):
        return _xla_self_attention_from_packed(qkv, num_heads, zero_sink, eps)
    return _pallas_self_attention_packed(qkv, num_heads, zero_sink, eps)


_NOMAX_MIN_SQ = 4096  # big-S shapes only; smaller ones ride chip-proven paths


@jax.custom_vjp
def _flash_nomax_call(q, k, v):
    """No-max kernel forward (exact under the normalized-q/k logit bound —
    see kernels/flash.py flash_nomax) with the stock flash backward: the
    nomax trick only pays on the forward's serial MXU/VPU chain; the stock
    kernel's Pallas backward already owns the gradient path."""
    from vivid_tpu.kernels.flash import flash_nomax
    # bq=bk=2048 measured best at every big-S shape (nomax_attn_lab v7:
    # 46.1/42.5 TF/s at d=32, 93.6 at d=64, vs stock flash's 33/32/71).
    return flash_nomax(q, k, v,
                       block_q=_largest_block(q.shape[2], 2048),
                       block_k=_largest_block(k.shape[2], 2048),
                       interpret=_interpret())


def _flash_nomax_fwd(q, k, v):
    return _flash_nomax_call(q, k, v), (q, k, v)


def _flash_nomax_bwd(res, g):
    q, k, v = res
    if jax.devices()[0].platform == "tpu":
        fn = lambda q_, k_, v_: _stock_flash(q_, k_, v_, None)
    else:  # interpret-mode tests off-TPU: stock flash can't run there
        fn = lambda q_, k_, v_: reference_attention(q_, k_, v_)
    return jax.vjp(fn, q, k, v)[1](g)


_flash_nomax_call.defvjp(_flash_nomax_fwd, _flash_nomax_bwd)


@jax.custom_vjp
def _flash_nomax_biased_call(q, k, v, bias):
    """Biased no-max forward (epipolar big-S shapes): exact under the
    dynamic shift = sqrt(D) + max(bias) computed in flash_nomax; backward
    stays on the stock flash kernel (its Pallas backward returns the ab
    cotangent — see _flash_attention_bwd's ds)."""
    from vivid_tpu.kernels.flash import flash_nomax
    return flash_nomax(q, k, v, bias,
                       block_q=_largest_block(q.shape[2], 2048),
                       block_k=_largest_block(k.shape[2], 2048),
                       interpret=_interpret())


def _flash_nomax_biased_fwd(q, k, v, bias):
    return _flash_nomax_biased_call(q, k, v, bias), (q, k, v, bias)


def _flash_nomax_biased_bwd(res, g):
    q, k, v, bias = res
    if jax.devices()[0].platform == "tpu":
        fn = _stock_flash
    else:  # interpret-mode tests off-TPU: stock flash can't run there
        fn = reference_attention
    return jax.vjp(fn, q, k, v, bias)[1](g)


_flash_nomax_biased_call.defvjp(_flash_nomax_biased_fwd,
                                _flash_nomax_biased_bwd)


def _attention_local(q, k, v, bias: Optional[jax.Array] = None):
    if not _use_pallas(q, k):
        return reference_attention(q, k, v, bias)
    if _interpret() and jax.devices()[0].platform != "tpu":
        # The stock flash kernel has no interpret mode; run the from-scratch
        # kernel (norm_eps=None: inputs here are already normalized) so the
        # multi-shard tests execute a real Pallas call on this path too.
        # Wrapped in a custom_vjp (backward = einsum composite) to mirror the
        # stock kernel's differentiability — interpret-mode gradient tests
        # reach this via the packed kernels' composite-VJP fallbacks.
        if bias is None:
            return _flash_interpret(q, k, v)
        return _flash_interpret_biased(q, k, v, bias)
    # Big-S shapes (the log-parity SR's S=16384/4096 attentions): the no-max
    # kernel beats stock flash 33 -> 45 TF/s at d=32 (docs/PERF.md
    # "Log-parity SR architecture"). Its exactness needs the normalized-q/k
    # logit bound, which every fused_attention caller provides
    # (blocks.split_qkv normalizes); biased shapes use the dynamic
    # shift = sqrt(D) + max(bias) variant (epipolar offsets are learned, so
    # the static bound alone doesn't cover them).
    if q.shape[2] >= _NOMAX_MIN_SQ:
        if bias is None:
            return _flash_nomax_call(q, k, v)
        return _flash_nomax_biased_call(q, k, v, bias)
    return _stock_flash(q, k, v, bias)


def _stock_flash(q, k, v, bias: Optional[jax.Array] = None):
    flash_attention, BlockSizes = _flash()
    b, h, sq, d = q.shape
    sk = k.shape[2]
    scale = 1.0 / (d ** 0.5)
    block_q = _largest_block(sq, 512)
    block_k = _largest_block(sk, 1024)
    sizes = BlockSizes(
        block_q=block_q, block_k_major=block_k, block_k=block_k,
        block_b=1,
        block_q_major_dkv=block_q, block_k_major_dkv=block_k,
        block_q_dkv=block_q, block_k_dkv=block_k,
        block_q_dq=block_q, block_k_dq=block_k,
        block_k_major_dq=block_k,
    )
    # The flash kernel computes (q k^T + ab) * sm_scale; our contract is
    # q k^T * scale + bias, so pre-divide the bias by the scale.
    ab = (bias.astype(jnp.float32) / scale) if bias is not None else None
    out = flash_attention(q, k, v, ab=ab, sm_scale=scale, block_sizes=sizes)
    return out.astype(v.dtype)
