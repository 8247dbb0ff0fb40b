#!/usr/bin/env python
"""Isolate the SR level-0 conv inefficiency (256px, C=64).

The SR forward trace (tools/trace_fwd.py --what sr) shows the 256x256 C=64
3x3 convs running at ~24 TF/s — far below both the base model's conv pool
(~89 TF/s) and the 50% lane-utilization ceiling (~99 TF/s) the C=64 minor
dim implies. This lab times a stack of back-to-back 3x3 convs in different
but FLOP-comparable formulations to find which axis (spatial size, batch,
channel width, layout, packing) is responsible:

  a. baseline      [16,256,256,64]  3x3 C64->C64   (the SR level-0 shape)
  b. small-spatial [64,128,128,64]  3x3 C64->C64   (same FLOPs, 4x batch)
  c. wide-channel  [16,128,128,128] 3x3 C128->C128 (same FLOPs, full lanes)
  d. base-shape    [16,64,64,64]    3x3 C64->C64   (the 64px level-0 that
                                                    hits the conv ceiling)
  e. s2d-packed    [16,128,128,256] 3x3 C256->C256 (4x FLOPs — what a
                                                    space-to-depth rewrite
                                                    of (a) would cost)
  f. w-packed      [16,256,128,128] 3x3 C128->C128 (2x FLOPs — a W-only
                                                    pixel-pair rewrite)

Chained timing (the axon tunnel executes lazily), fetches a scalar, and
differences two chain lengths. Prints achieved TF/s per formulation.
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


def conv_stack(n_layers, epilogue=None):
    def fn(x, w):
        for _ in range(n_layers):
            x = jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            if epilogue is not None:
                x = epilogue(x)
        return x
    return jax.jit(fn)


def block_epilogue(x):
    """The level-0 block's per-conv elementwise work, as the model runs it:
    fp32 pixel norm over channels (enc flavor), mp_silu with an emb gain,
    and the clip_act clamp (blocks.py block_apply)."""
    x32 = x.astype(jnp.float32)
    norm = jnp.sqrt(jnp.sum(x32 * x32, axis=-1, keepdims=True))
    x = x / (1e-4 + norm / np.sqrt(x.shape[-1])).astype(x.dtype)
    x = jax.nn.silu(x * 1.01) / 0.596
    return jnp.clip(x, -256, 256)


def time_stack(name, shape, cin, cout, n_layers=8, dtype=jnp.bfloat16,
               epilogue=None):
    b, h, w = shape
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (b, h, w, cin), dtype)
    wgt = (jax.random.normal(jax.random.fold_in(key, 1), (3, 3, cin, cout),
                             dtype) / float(3 * np.sqrt(cin)))
    assert cin == cout, "chained timing needs matching in/out"
    fn = conv_stack(n_layers, epilogue)

    def chain(iters):
        t0 = time.perf_counter()
        o = x
        for _ in range(iters):
            o = fn(o, wgt)
        _ = np.asarray(o[0, 0, 0, 0])
        return time.perf_counter() - t0

    chain(2)
    t1 = min(chain(2) for _ in range(3))
    t2 = min(chain(10) for _ in range(3))
    dt = max((t2 - t1) / 8, 1e-9) / n_layers
    flops = 2 * b * h * w * 9 * cin * cout
    print(f"{name:14s} {str((b,h,w,cin)):>20s}: {dt*1e3:7.3f} ms/conv  "
          f"{flops/dt/1e12:6.1f} TF/s", flush=True)
    return flops / dt / 1e12


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=8)
    args = ap.parse_args()
    print(f"device: {jax.devices()[0].platform}", flush=True)
    L = args.layers
    time_stack("a.baseline", (16, 256, 256), 64, 64, L)
    time_stack("b.small-spatial", (64, 128, 128), 64, 64, L)
    time_stack("c.wide-channel", (16, 128, 128), 128, 128, L)
    time_stack("d.base-shape", (16, 64, 64), 64, 64, L)
    time_stack("e.s2d-packed", (16, 128, 128), 256, 256, L)
    time_stack("f.w-packed", (16, 256, 128), 128, 128, L)
    time_stack("g.base+epi", (16, 256, 256), 64, 64, L,
               epilogue=block_epilogue)
    time_stack("h.wpack+epi", (16, 256, 128), 128, 128, L,
               epilogue=block_epilogue)
    time_stack("i.wide+epi", (16, 128, 128), 128, 128, L,
               epilogue=block_epilogue)
    # Base-model level-0 shape (64px): is w-packing worth it there too?
    # Predicted no — the unpacked convs already run near the half-lane
    # ceiling (~89 TF/s), so the packed 2x-FLOPs form would need >178.
    time_stack("j.base64-wpack", (16, 64, 32), 128, 128, L,
               epilogue=block_epilogue)
    time_stack("k.base64-plain", (16, 64, 64), 64, 64, L,
               epilogue=block_epilogue)


if __name__ == "__main__":
    main()
