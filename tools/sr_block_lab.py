#!/usr/bin/env python
"""Find where the SR level-0 *block* loses its conv throughput.

tools/sr_conv_lab.py showed the raw 3x3 conv at the SR level-0 shape
[16,256,256,64] runs 68 TF/s isolated and 39.5 TF/s with the elementwise
epilogue, yet the in-model trace (tools/trace_fwd.py --what sr) attributes
~3.2 ms (~24 TF/s) per conv fusion. This lab times the REAL block_apply
(vivid_tpu.nn.blocks) chained back-to-back at the SR level-0 shape, then
formulation variants that keep the fp32 norm MATH but change how XLA may
stream it, to locate the residual gap:

  exact        the production enc block (2x conv3x3 + fp32 pixel norm +
               silu/gain/mp_sum/clip), chained
  pre-wn       weights pre-normalized outside jit (is the per-call fp32
               weight normalization breaking conv fusion?)
  no-clip      clip_act=None
  norm-f32div  pixel norm dividing in f32 then downcasting (one f32 stream
               instead of mixed bf16/f32 consumers)
  norm-bf16    pixel norm fully in bf16 (NOT parity-safe; bound only)
  conv-only    2x conv3x3 alone (floor)

Chained timing (axon executes lazily): fetch a scalar, difference two chain
lengths. Reports ms per BLOCK (2 convs) and achieved conv TF/s.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from vivid_tpu.core.util import enable_persistent_compilation_cache

enable_persistent_compilation_cache()

import vivid_tpu.nn.mp as mp
from vivid_tpu.nn.blocks import BlockConfig, block_apply, block_init


def timed(fn, args, n_layers):
    fn = jax.jit(fn)

    def chain(iters):
        t0 = time.perf_counter()
        o = args[0]
        for _ in range(iters):
            o = fn(o, *args[1:])
        _ = np.asarray(o[0, 0, 0, 0])
        return time.perf_counter() - t0

    chain(2)
    t1 = min(chain(2) for _ in range(3))
    t2 = min(chain(10) for _ in range(3))
    return max((t2 - t1) / 8, 1e-9) / n_layers


def report(name, shape, dt_block, convs_per_block=2):
    b, h, w, c = shape
    flops = convs_per_block * 2 * b * h * w * 9 * c * c
    print(f"{name:14s} {str(shape):>20s}: {dt_block*1e3:7.3f} ms/block  "
          f"{flops/dt_block/1e12:6.1f} TF/s(conv)", flush=True)


def norm_f32div(x, axis=None, eps=1e-4):
    import math
    if axis is None:
        axis = tuple(range(1, x.ndim))
    elif isinstance(axis, int):
        axis = (axis,)
    x32 = x.astype(jnp.float32)
    norm = jnp.sqrt(jnp.sum(jnp.square(x32), axis=axis, keepdims=True))
    r = math.sqrt(float(norm.size) / float(x.size))
    return (x32 / (eps + r * norm)).astype(x.dtype)


def norm_bf16(x, axis=None, eps=1e-4):
    import math
    if axis is None:
        axis = tuple(range(1, x.ndim))
    elif isinstance(axis, int):
        axis = (axis,)
    norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=axis, keepdims=True))
    r = math.sqrt(float(norm.size) / float(x.size))
    return x / (eps + r * norm)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--ch", type=int, default=64)
    args = ap.parse_args()
    print(f"device: {jax.devices()[0].platform}", flush=True)

    b, res, c = args.batch, args.res, args.ch
    cfg = BlockConfig(in_channels=c, out_channels=c, emb_channels=4 * c,
                      flavor="enc")
    key = jax.random.PRNGKey(0)
    params = block_init(key, cfg)
    x = jax.random.normal(jax.random.fold_in(key, 1), (b, res, res, c),
                          jnp.bfloat16)
    emb = jax.random.normal(jax.random.fold_in(key, 2), (b, 4 * c),
                            jnp.bfloat16)
    shape = (b, res, res, c)

    # exact production block
    dt = timed(lambda h, p, e: block_apply(p, cfg, h, e), (x, params, emb), 1)
    report("exact", shape, dt)

    # weights pre-normalized outside jit (conv sees a plain constant-shaped
    # arg; per-call fp32 weight-norm removed)
    from vivid_tpu.nn.mp import _normalized_weight
    pre = jax.tree.map(lambda w: w, params)
    pre["conv_res0"] = {"w": np.asarray(
        _normalized_weight(params["conv_res0"]["w"], 1.0))}
    pre["conv_res1"] = {"w": np.asarray(
        _normalized_weight(params["conv_res1"]["w"], 1.0))}
    orig_nw = mp._normalized_weight
    try:
        mp._normalized_weight = lambda w, gain: w.astype(jnp.float32) * gain
        dt = timed(lambda h, p, e: block_apply(p, cfg, h, e), (x, pre, emb), 1)
        report("pre-wn", shape, dt)
    finally:
        mp._normalized_weight = orig_nw

    # clip off
    cfg_nc = BlockConfig(in_channels=c, out_channels=c, emb_channels=4 * c,
                         flavor="enc", clip_act=None)
    dt = timed(lambda h, p, e: block_apply(p, cfg_nc, h, e), (x, params, emb), 1)
    report("no-clip", shape, dt)

    # norm variants (monkeypatch the symbol block_apply closed over)
    import vivid_tpu.nn.blocks as blocks_mod
    orig_norm = blocks_mod.normalize
    try:
        blocks_mod.normalize = norm_f32div
        dt = timed(lambda h, p, e: block_apply(p, cfg, h, e),
                   (x, params, emb), 1)
        report("norm-f32div", shape, dt)
        blocks_mod.normalize = norm_bf16
        dt = timed(lambda h, p, e: block_apply(p, cfg, h, e),
                   (x, params, emb), 1)
        report("norm-bf16", shape, dt)
    finally:
        blocks_mod.normalize = orig_norm

    # floor: two raw convs, nothing else
    w0 = np.asarray(_normalized_weight(params["conv_res0"]["w"], 1.0),
                    np.float32).astype(jnp.bfloat16)

    def two_convs(h, w):
        for _ in range(2):
            h = jax.lax.conv_general_dilated(
                h, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return h

    dt = timed(two_convs, (x, jnp.asarray(w0)), 1)
    report("conv-only", shape, dt)


if __name__ == "__main__":
    main()
