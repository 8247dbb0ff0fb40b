#!/usr/bin/env python
"""Pallas formulation lab for the level-0 conv stack (C=64 at large spatial).

Context (docs/PERF.md "SR stage attack"): XLA runs the [B,256,256,64] 3x3
conv at ~68 TF/s isolated and ~24-50 TF/s chained in the real block; the
width-packed XLA reformulation (nn/wpack.py) hits ~90 TF/s useful on the MXU
but loses in-model because its pack/unpack reshapes touch the tiled (W, C)
dims and relayout through HBM.

This lab packs two vertically-adjacent rows instead (HEIGHT packing):
[B, H, W, C] -> [B, H/2, 2, W, C] splits a LEADING dim, which is a free
bitcast in XLA (the tiled minor dims are untouched), and inside the kernel
the two parities are static indices. The pack to [H/2, W, 2C] (two image
rows sharing one 128-lane channel row) happens in VMEM via two static
lane-half stores into a scratch buffer; the 3x3 conv is re-expressed
EXACTLY with an embedded [3, 3, 2C, 2C] kernel (same algebra as
nn/wpack.pack_conv_weight but over ky: 2x MACs, half structural zeros,
full-width MXU tiles).

Mosaic lowering constraints this design obeys (probed on the v5e chip:
value reshapes and strided loads/stores crash the compiler; scratch +
pl.ds, jnp.pad, static lane slices, and 3-D dot_general all lower):

  xla        lax.conv_general_dilated baseline (unpacked)
  xla-silu   silu -> conv as XLA fuses it in the block (epilogue cost probe)
  hp9        Pallas: in-VMEM height pack, embedded [3,3,2C,2C] kernel as 9
             accumulated [chunk*W, 2C]@[2C, 2C] dots (full 128-lane MXU),
             silu fused, static lane-half unpack
  hp9-nosilu hp9 without the fused silu (pure conv, for apples-to-XLA)

All variants compute silu(x) -> conv3x3(w) exactly (parity-checked against
the XLA composite before timing). FLOPs are counted UNPACKED (useful work),
so TF/s columns are directly comparable.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/fused_conv_lab.py
       [--batch 16 --res 256 --ch 64] [--interpret]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vivid_tpu.core.util import enable_persistent_compilation_cache

enable_persistent_compilation_cache()


def _silu(x):
    return (jax.nn.silu(x.astype(jnp.float32)) / 0.596).astype(x.dtype)


def pack_conv_weight_h(w):
    """[3, 3, C, C2] -> [3, 3, 2C, 2C2] embedded kernel packing the ky axis
    (height analog of nn/wpack.pack_conv_weight): with input row parity p
    and output row parity q at packed-row offset ky'-1,
    dy = 2*(ky'-1) + p - q must land in {-1, 0, 1}."""
    kh, kw, cin, cout = w.shape
    assert (kh, kw) == (3, 3), (kh, kw)
    wp = jnp.zeros((3, 3, 2 * cin, 2 * cout), w.dtype)
    for kyp in range(3):
        for p in range(2):
            for q in range(2):
                dy = 2 * (kyp - 1) + p - q
                if -1 <= dy <= 1:
                    wp = wp.at[kyp, :, p * cin:(p + 1) * cin,
                               q * cout:(q + 1) * cout].set(w[dy + 1])
    return wp


def _conv_kernel_h(x_ref, wp_ref, o_ref, xp_ref, *, chunk: int,
                   fuse_silu: bool):
    """One batch image per grid step. x_ref [1, H2, 2, W, C] (the free
    leading-dim-split view of [H, W, C]); wp_ref [3, 3, 2C, 2C] height-packed
    kernel; o_ref [1, H2, 2, W, C]; xp_ref VMEM scratch [H2+2, W+2, 2C].

    Pack: the two row parities land in the two lane halves of the scratch
    (static stores — no strided or reshaped values, which Mosaic rejects);
    the halo ring stays zero (SAME padding: the packed zero row/col is exact,
    out-of-range image rows carry structurally-zero weights). Conv: 9
    accumulated full-width dots over row chunks via fori_loop + pl.ds
    (buffers are reused across dynamic loop iterations, unlike static
    unrolls — see kernels/flash.pick_q_chunk)."""
    H2 = x_ref.shape[1]
    W = x_ref.shape[3]
    C = x_ref.shape[4]

    xp_ref[...] = jnp.zeros_like(xp_ref)
    xe = x_ref[0, :, 0]                                # [H2, W, C]
    xo = x_ref[0, :, 1]
    if fuse_silu:
        xe = _silu(xe)
        xo = _silu(xo)
    xp_ref[1:H2 + 1, 1:W + 1, 0:C] = xe
    xp_ref[1:H2 + 1, 1:W + 1, C:2 * C] = xo

    wp = wp_ref[...]                                   # [3, 3, 2C, 2C]

    def row_chunk(i, _):
        r0 = i * chunk
        acc = jnp.zeros((chunk, W, 2 * C), jnp.float32)
        for ky in range(3):
            for kx in range(3):
                tile = xp_ref[pl.ds(r0 + ky, chunk), pl.ds(kx, W), :]
                acc = acc + jax.lax.dot_general(
                    tile, wp[ky, kx],
                    (((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
        y = acc.astype(o_ref.dtype)                    # [chunk, W, 2C]
        o_ref[0, pl.ds(r0, chunk), 0] = y[..., :C]
        o_ref[0, pl.ds(r0, chunk), 1] = y[..., C:]
        return ()

    jax.lax.fori_loop(0, H2 // chunk, row_chunk, (), unroll=False)


def make_pallas_conv_h(H, W, C, dtype, chunk=16, fuse_silu=True,
                       interpret=False):
    H2 = H // 2
    kern = functools.partial(_conv_kernel_h, chunk=chunk, fuse_silu=fuse_silu)

    def run(x, wp):
        b = x.shape[0]
        xs = x.reshape(b, H2, 2, W, C)        # free leading-dim split
        out = pl.pallas_call(
            kern,
            grid=(b,),
            in_specs=[
                pl.BlockSpec((1, H2, 2, W, C), lambda i: (i, 0, 0, 0, 0)),
                pl.BlockSpec((3, 3, 2 * C, 2 * C), lambda i: (0, 0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, H2, 2, W, C), lambda i: (i, 0, 0, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((b, H2, 2, W, C), dtype),
            scratch_shapes=[pltpu.VMEM((H2 + 2, W + 2, 2 * C), dtype)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=96 * 2 ** 20),
            interpret=interpret,
        )(xs, wp)
        return out.reshape(b, H, W, C)        # free leading-dim merge

    return run


def timed(fn, x, w, n1=4, n2=16):
    # Weights ride as a jit ARGUMENT (never closed over: closed-over weights
    # become HLO literal constants shipped through the remote-compile tunnel).
    fn = jax.jit(fn)

    def chain(iters):
        t0 = time.perf_counter()
        o = x
        for _ in range(iters):
            o = fn(o, w)
        _ = np.asarray(o[0, 0, 0, 0])
        return time.perf_counter() - t0

    chain(2)
    t1 = min(chain(n1) for _ in range(3))
    t2 = min(chain(n2) for _ in range(3))
    return max((t2 - t1) / (n2 - n1), 1e-9)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--ch", type=int, default=64)
    ap.add_argument("--chunk", type=int, default=16)
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args()
    if args.interpret:
        jax.config.update("jax_platforms", "cpu")
    print("device:", jax.devices()[0].platform, flush=True)

    b, res, c = args.batch, args.res, args.ch
    dtype = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (b, res, res, c), dtype)
    w = jax.random.normal(jax.random.fold_in(key, 1), (3, 3, c, c),
                          jnp.float32) / np.sqrt(9 * c)
    wb = w.astype(dtype)
    wp = pack_conv_weight_h(wb)

    def xla_conv(h, w_arg=None, fuse=False):
        if fuse:
            h = _silu(h)
        return jax.lax.conv_general_dilated(
            h, wb if w_arg is None else w_arg, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    pconv = make_pallas_conv_h(res, res, c, dtype, chunk=args.chunk,
                               fuse_silu=True, interpret=args.interpret)
    pconv_ns = make_pallas_conv_h(res, res, c, dtype, chunk=args.chunk,
                                  fuse_silu=False, interpret=args.interpret)

    # parity first
    ref = xla_conv(x, fuse=True)
    got = pconv(x, wp)
    err = float(jnp.linalg.norm((got - ref).astype(jnp.float32)) /
                (1e-30 + jnp.linalg.norm(ref.astype(jnp.float32))))
    print(f"parity silu+conv rel L2: {err:.2e}", flush=True)
    assert err < 3e-2, err
    ref2 = xla_conv(x)
    got2 = pconv_ns(x, wp)
    err2 = float(jnp.linalg.norm((got2 - ref2).astype(jnp.float32)) /
                 (1e-30 + jnp.linalg.norm(ref2.astype(jnp.float32))))
    print(f"parity conv-only rel L2: {err2:.2e}", flush=True)
    assert err2 < 3e-2, err2
    if args.interpret:
        print("interpret-mode parity OK")
        return

    flops = 2 * b * res * res * 9 * c * c  # useful (unpacked) FLOPs

    for name, fn, warg in (
        ("xla", lambda h, w_: xla_conv(h, w_), wb),
        ("xla-silu", lambda h, w_: xla_conv(h, w_, fuse=True), wb),
        ("hp9", pconv, wp),
        ("hp9-nosilu", pconv_ns, wp),
    ):
        dt = timed(fn, x, warg)
        print(f"{name:11s}: {dt*1e3:7.3f} ms  {flops/dt/1e12:6.1f} TF/s",
              flush=True)


if __name__ == "__main__":
    main()
