#!/usr/bin/env python
"""Big-S low-d attention lab: the log-parity SR model attends at
S=16384 (H=4) and S=4096 (H=6) with head_dim=32 — outside the packed
kernels' envelope, riding the stock flash path. head_dim=32 fills only a
quarter of the MXU's 128-deep contraction for QK^T and a quarter of the
output lanes for PV, so the achievable rate is the open question this lab
answers on-chip: stock flash vs einsum at the exact SR shapes, plus the
corresponding in0-arch shape for scale.

Usage: python tools/bigs_attn_lab.py [--batch 8]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vivid_tpu.core.util import enable_persistent_compilation_cache

enable_persistent_compilation_cache()


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


def sweep(shapes, b, key):
    """Block-size sweep at the SR d=32 shapes: the stock flash kernel's
    default blocks (512/1024) deliver 33 TF/s vs the ~49 TF/s d=32
    structural cap (QK^T contraction and PV output both pad 32 -> 128 on
    the MXU), so the open question is how much of the remaining 1.5x is
    block scheduling. Also times our from-scratch flash_fused at the same
    blocks (norm_eps=None isolates attention; norm_eps=1e-4 is the
    production form replacing XLA normalize + stock flash)."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, flash_attention)
    from vivid_tpu.kernels.flash import flash_fused

    blocks = [(256, 1024), (512, 512), (512, 1024), (512, 2048),
              (1024, 1024), (1024, 2048), (256, 2048), (2048, 1024)]
    for case in ("sr128", "sr64"):
        name, S, Sk, H, D = shapes[case]
        q = jax.random.normal(key, (b, H, S, D), jnp.bfloat16)
        k = jax.random.normal(jax.random.fold_in(key, 1), (b, H, Sk, D),
                              jnp.bfloat16)
        v = jax.random.normal(jax.random.fold_in(key, 2), (b, H, Sk, D),
                              jnp.bfloat16)
        flops = 4 * b * H * S * Sk * D
        for bq, bk in blocks:
            if S % bq or Sk % bk:
                continue
            sizes = BlockSizes(
                block_q=bq, block_k_major=bk, block_k=bk, block_b=1,
                block_q_major_dkv=bq, block_k_major_dkv=bk,
                block_q_dkv=bq, block_k_dkv=bk,
                block_q_dq=bq, block_k_dq=bk, block_k_major_dq=bk)
            scale = 1.0 / (D ** 0.5)
            fn = lambda q_, k_, v_: flash_attention(
                q_, k_, v_, sm_scale=scale, block_sizes=sizes)
            try:
                dt = timed(fn, (q, k, v))
                print(f"{name} stock bq={bq} bk={bk}: {dt*1e3:8.2f} ms  "
                      f"{flops/dt/1e12:6.1f} TF/s", flush=True)
            except Exception as e:
                print(f"{name} stock bq={bq} bk={bk}: FAILED "
                      f"{type(e).__name__}: {str(e)[:160]}", flush=True)
        for bq, bk in blocks:
            if S % bq or Sk % bk:
                continue
            for eps in (None, 1e-4):
                fn = lambda q_, k_, v_: flash_fused(
                    q_, k_, v_, None, norm_eps=eps, block_q=bq, block_k=bk)
                tag = "raw" if eps is None else "norm"
                try:
                    dt = timed(fn, (q, k, v))
                    print(f"{name} fused({tag}) bq={bq} bk={bk}: "
                          f"{dt*1e3:8.2f} ms  {flops/dt/1e12:6.1f} TF/s",
                          flush=True)
                except Exception as e:
                    print(f"{name} fused({tag}) bq={bq} bk={bk}: FAILED "
                          f"{type(e).__name__}: {str(e)[:160]}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--cases", default="sr128,sr64,base32")
    ap.add_argument("--sweep", action="store_true",
                    help="block-size sweep: stock flash vs flash_fused at "
                         "the SR d=32 shapes")
    args = ap.parse_args()
    print("device:", jax.devices()[0].platform, flush=True)
    b = args.batch

    # (name, S, Sk, H, D): vanilla SR xattn KV = self + 1 source = 2S.
    shapes = {
        "sr128": ("SR 128x128 xattn", 16384, 32768, 4, 32),
        "sr64": ("SR 64x64 xattn", 4096, 8192, 6, 32),
        "sr32": ("SR 32x32 xattn", 1024, 2048, 8, 32),
        "base32": ("base 32x32 xattn (d=64, for scale)", 1024, 3072, 2, 64),
    }

    from vivid_tpu.kernels.attention import (_attention_local,
                                             reference_attention)

    key = jax.random.PRNGKey(0)

    if args.sweep:
        sweep(shapes, b, key)
        return
    for case in args.cases.split(","):
        name, S, Sk, H, D = shapes[case]
        q = jax.random.normal(key, (b, H, S, D), jnp.bfloat16)
        k = jax.random.normal(jax.random.fold_in(key, 1), (b, H, Sk, D),
                              jnp.bfloat16)
        v = jax.random.normal(jax.random.fold_in(key, 2), (b, H, Sk, D),
                              jnp.bfloat16)
        flops = 4 * b * H * S * Sk * D
        for label, fn in (("stock-flash", lambda q_, k_, v_:
                           _attention_local(q_, k_, v_, None)),
                          ("einsum", reference_attention)):
            if label == "einsum" and S * Sk > 4096 * 8192:
                print(f"{name} {label}: skipped (logit tensor "
                      f"{b*H*S*Sk*4/2**30:.0f} GiB)", flush=True)
                continue
            try:
                dt = timed(fn, (q, k, v))
                print(f"{name} [{b},{H},{S},{Sk},{D}] {label}: "
                      f"{dt*1e3:8.2f} ms  {flops/dt/1e12:6.1f} TF/s",
                      flush=True)
            except Exception as e:  # OOM etc. — record and continue
                print(f"{name} {label}: FAILED {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
