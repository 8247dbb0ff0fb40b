#!/usr/bin/env python
"""No-max flash attention lab for the SR big-S d=32 shapes.

The block sweep (bigs_attn_lab --sweep) showed every block choice plateaus
at ~33-35 TF/s on [8,4,16384,32768,32] — the signature of a fully SERIAL
per-tile schedule: at d=32 the MXU pads its 32-deep QK^T contraction and
32-wide PV output to 128, costing ~2.6 ps/logit, and the softmax VPU chain
(rowmax, exp, rowsum, rescale) costs about the same, so serial = ~24-35
TF/s while perfect MXU/VPU overlap = the ~49 TF/s structural cap.

This lab attacks the VPU side with an exactness argument specific to this
model family: the reference pixel-normalizes q and k before attention
(models.py:187-198), so ||q_row||, ||k_row|| <= sqrt(D) and every logit is
bounded by |q.k|/sqrt(D) <= sqrt(D). softmax(s) = exp(s-C)/sum(exp(s-C))
for ANY constant C, so with C = sqrt(D) the ONLINE MAX IS UNNECESSARY —
exp(s-C) <= 1 can never overflow. Variants measured:

  v0  flash_fused baseline (online max, VPU rowsum)       [35.4 TF/s]
  v1  no-max: constant shift C=sqrt(D), VPU f32 rowsum for l
  v2  no-max + l folded into the PV matmul: V gets a ones-column (free on
      the MXU: D=32 output lanes are padded to 128 anyway), so the VPU per
      logit is exp + bf16 convert, nothing else
  v3  v2 + two k-sub-block chains per grid step (independent dependency
      chains let Mosaic overlap chain A's exp with chain B's dots)

Parity: each variant vs reference_attention at a small chip shape.
Usage: python tools/nomax_attn_lab.py [--batch 8] [--cases sr128,sr64]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vivid_tpu.core.util import enable_persistent_compilation_cache

enable_persistent_compilation_cache()


def _kernel_nomax(q_ref, k_ref, v_ref, o_ref, acc_ref, l_ref, *,
                  sm_scale: float, shift: float, n_k: int, fold_l: bool,
                  chains: int, prescale: bool = False):
    """Grid (B, H, n_q, n_k), k innermost. No online max: p = exp(s*scale -
    shift) with shift >= max possible logit. fold_l: V carries a trailing
    ones-column, so l rides the PV matmul instead of a VPU rowsum.
    chains>1 splits the k tile into independent sub-chains."""
    ik = pl.program_id(3)

    @pl.when(ik == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        if l_ref is not None:
            l_ref[...] = jnp.zeros_like(l_ref)

    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    if prescale:
        # Fold the softmax scale into the tiny [bq, D] q tile instead of a
        # [bq, bk] multiply on the logits.
        q = (q.astype(jnp.float32) * sm_scale).astype(q.dtype)
    bk = k.shape[0] // chains
    for c in range(chains):
        kc = k[c * bk:(c + 1) * bk]
        vc = v[c * bk:(c + 1) * bk]
        s = jax.lax.dot_general(q, kc, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        p = jnp.exp(s - shift) if prescale else jnp.exp(s * sm_scale - shift)
        pb = p.astype(vc.dtype)
        if not fold_l:
            l_ref[...] = l_ref[...] + jnp.broadcast_to(
                jnp.sum(p, axis=-1, keepdims=True), l_ref.shape)
        acc_ref[...] = acc_ref[...] + jax.lax.dot(
            pb, vc, preferred_element_type=jnp.float32)

    @pl.when(ik == n_k - 1)
    def _finalize():
        acc = acc_ref[...]
        if fold_l:
            d = o_ref.shape[-1]
            o_ref[0, 0] = (acc[:, :d] / acc[:, d:d + 1]).astype(o_ref.dtype)
        else:
            o_ref[0, 0] = (acc / l_ref[:, :1]).astype(o_ref.dtype)


def nomax_attention(q, k, v, *, block_q=1024, block_k=1024, fold_l=False,
                    chains=1, prescale=False, interpret=False):
    """q [B,H,S,D] NORMALIZED (rows bounded by sqrt(D)); k/v [B,H,Sk,D]."""
    b, h, sq, d = q.shape
    sk = k.shape[2]
    block_q = min(block_q, sq)
    block_k = min(block_k, sk)
    assert sq % block_q == 0 and sk % block_k == 0
    sm_scale = 1.0 / (d ** 0.5)
    shift = float(d ** 0.5)  # max |logit| after scaling, see module doc
    n_q, n_k = sq // block_q, sk // block_k
    dv = d + 1 if fold_l else d
    if fold_l:
        ones = jnp.ones((b, h, sk, 1), v.dtype)
        v = jnp.concatenate([v, ones], axis=-1)
    grid = (b, h, n_q, n_k)
    kern = functools.partial(_kernel_nomax, sm_scale=sm_scale, shift=shift,
                             n_k=n_k, fold_l=fold_l, chains=chains,
                             prescale=prescale)
    scratch = [pltpu.VMEM((block_q, dv), jnp.float32)]
    if not fold_l:
        scratch.append(pltpu.VMEM((block_q, 128), jnp.float32))
    else:
        scratch.append(None)
    kern2 = kern
    if fold_l:
        def kern2(q_ref, k_ref, v_ref, o_ref, acc_ref):  # no l scratch
            return kern(q_ref, k_ref, v_ref, o_ref, acc_ref, None)
    out = pl.pallas_call(
        kern2,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda b_, h_, iq, ik: (b_, h_, iq, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda b_, h_, iq, ik: (b_, h_, ik, 0)),
            pl.BlockSpec((1, 1, block_k, dv), lambda b_, h_, iq, ik: (b_, h_, ik, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, d),
                               lambda b_, h_, iq, ik: (b_, h_, iq, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, sq, d), v.dtype),
        scratch_shapes=[s for s in scratch if s is not None],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
            vmem_limit_bytes=96 * 2 ** 20),
        interpret=interpret,
    )(q, k, v)
    return out


def timed(fn, args, n1=3, n2=9):
    fn = jax.jit(fn)

    def chain(iters):
        t0 = time.perf_counter()
        o = args[0]
        for _ in range(iters):
            o = fn(o, *args[1:])
        np.asarray(o[0, 0, 0, 0])
        return time.perf_counter() - t0

    chain(2)
    t1 = min(chain(n1) for _ in range(3))
    t2 = min(chain(n2) for _ in range(3))
    return max((t2 - t1) / (n2 - n1), 1e-9)


def normalize_rows(x, eps=1e-4):
    x32 = x.astype(jnp.float32)
    ss = jnp.sqrt(jnp.sum(x32 * x32, axis=-1, keepdims=True))
    return (x32 / (eps + ss / (x.shape[-1] ** 0.5))).astype(x.dtype)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--cases", default="sr128,sr64")
    ap.add_argument("--parity-only", action="store_true")
    args = ap.parse_args()
    print("device:", jax.devices()[0].platform, flush=True)

    from vivid_tpu.kernels.attention import reference_attention
    from vivid_tpu.kernels.flash import flash_fused

    # Parity at a small shape (normalized inputs, as the production sites
    # guarantee).
    key = jax.random.PRNGKey(0)
    b, h, s, sk, d = 2, 2, 1024, 2048, 32
    q = normalize_rows(jax.random.normal(key, (b, h, s, d), jnp.bfloat16))
    k = normalize_rows(jax.random.normal(jax.random.fold_in(key, 1),
                                         (b, h, sk, d), jnp.bfloat16))
    v = jax.random.normal(jax.random.fold_in(key, 2), (b, h, sk, d),
                          jnp.bfloat16)
    ref = reference_attention(q, k, v)
    for name, fn in (
        ("v1 nomax", lambda: nomax_attention(q, k, v, block_q=512,
                                             block_k=1024)),
        ("v2 fold_l", lambda: nomax_attention(q, k, v, block_q=512,
                                              block_k=1024, fold_l=True)),
        ("v3 chains2", lambda: nomax_attention(q, k, v, block_q=512,
                                               block_k=2048, fold_l=True,
                                               chains=2)),
    ):
        out = fn()
        err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                    - ref.astype(jnp.float32))))
        rel = err / float(jnp.max(jnp.abs(ref.astype(jnp.float32))))
        print(f"parity {name}: max abs {err:.3e} rel {rel:.3e}", flush=True)

    if args.parity_only:
        return

    shapes = {
        "sr128": ("SR 128x128 xattn", 16384, 32768, 4, 32),
        "sr64": ("SR 64x64 xattn", 4096, 8192, 6, 32),
        "sr128d64": ("SR 128x128 d64 xattn", 16384, 32768, 2, 64),
    }
    bsz = args.batch
    for case in args.cases.split(","):
        name, S, Sk, H, D = shapes[case]
        q = normalize_rows(jax.random.normal(key, (bsz, H, S, D),
                                             jnp.bfloat16))
        k = normalize_rows(jax.random.normal(jax.random.fold_in(key, 1),
                                             (bsz, H, Sk, D), jnp.bfloat16))
        v = jax.random.normal(jax.random.fold_in(key, 2), (bsz, H, Sk, D),
                              jnp.bfloat16)
        flops = 4 * bsz * H * S * Sk * D
        variants = [
            ("v0 flash_fused", lambda q_, k_, v_: flash_fused(
                q_, k_, v_, None, norm_eps=None, block_q=1024,
                block_k=1024)),
            ("v1 nomax", lambda q_, k_, v_: nomax_attention(
                q_, k_, v_, block_q=1024, block_k=1024)),
            ("v2 fold_l", lambda q_, k_, v_: nomax_attention(
                q_, k_, v_, block_q=1024, block_k=1024, fold_l=True)),
            ("v3 chains2 bk2048", lambda q_, k_, v_: nomax_attention(
                q_, k_, v_, block_q=1024, block_k=2048, fold_l=True,
                chains=2)),
            ("v3b chains2 bk1024", lambda q_, k_, v_: nomax_attention(
                q_, k_, v_, block_q=1024, block_k=1024, fold_l=True,
                chains=2)),
            ("v4 chains4 bk4096", lambda q_, k_, v_: nomax_attention(
                q_, k_, v_, block_q=512, block_k=4096, fold_l=True,
                chains=4)),
            ("v5 chains2 bk2048 nofold", lambda q_, k_, v_: nomax_attention(
                q_, k_, v_, block_q=1024, block_k=2048, chains=2)),
            ("v6 v5+prescale", lambda q_, k_, v_: nomax_attention(
                q_, k_, v_, block_q=1024, block_k=2048, chains=2,
                prescale=True)),
            ("v7 bq2048 chains2 bk2048", lambda q_, k_, v_: nomax_attention(
                q_, k_, v_, block_q=2048, block_k=2048, chains=2,
                prescale=True)),
        ]
        for label, fn in variants:
            try:
                dt = timed(fn, (q, k, v))
                print(f"{name} [{bsz},{H},{S},{Sk},{D}] {label}: "
                      f"{dt*1e3:8.2f} ms  {flops/dt/1e12:6.1f} TF/s",
                      flush=True)
            except Exception as e:
                print(f"{name} {label}: FAILED {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
