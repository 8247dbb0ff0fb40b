#!/usr/bin/env python
"""Static HBM accounting for the guided serving anomaly (round-5 VERDICT
item 3b: guided img/s peaks at b=32 — 16.70 — and REGRESSES at b=64 —
16.36; logs/r4/guided_sweep_attndot.log).

Compiles (does not execute) the 32-step guided sampler program at b=32 and
b=64 and prints XLA's memory_analysis. If the b=64 program's temp residency
approaches the 16 GiB HBM, the regression is allocator pressure (spills /
layout compromises) and b=32 is the documented serving point; if residency
is small, the cause is schedule-side instead.

Usage: python tools/guided_mem.py [--ch 64] [--batches 32,64,128]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from vivid_tpu.core.util import enable_persistent_compilation_cache

enable_persistent_compilation_cache()


def report(ch, batch, num_steps=32):
    from vivid_tpu.diffusion.sampler import edm_sampler, make_denoiser
    from vivid_tpu.nn.precond import PrecondConfig, precond_init

    cfg = PrecondConfig(img_resolution=64, num_sources=2, model_channels=ch,
                        extra_attn=1, use_bf16=True, remat=False)
    gcfg = PrecondConfig(img_resolution=64, num_sources=2, model_channels=ch,
                         extra_attn=1, use_bf16=True, remat=False, uncond=True)
    params = jax.eval_shape(lambda k: precond_init(k, cfg),
                            jax.random.PRNGKey(0))
    gparams = jax.eval_shape(lambda k: precond_init(k, gcfg),
                             jax.random.PRNGKey(2))

    @jax.jit
    def sample(p, gp, s, g, n):
        den = make_denoiser(p, cfg, src=s, geometry=g)
        gden = make_denoiser(gp, gcfg)
        return edm_sampler(den, n, gnet_denoise=gden, guidance=1.5,
                           num_steps=num_steps)

    f32 = jnp.float32
    src = jax.ShapeDtypeStruct((batch, 2, 64, 64, 3), f32)
    geometry = jax.ShapeDtypeStruct((batch, 2, 20), f32)
    noise = jax.ShapeDtypeStruct((batch, 64, 64, 3), f32)

    compiled = sample.lower(params, gparams, src, geometry, noise).compile()
    ma = compiled.memory_analysis()
    print(f"--- guided ch={ch} b={batch} ({num_steps} steps)")
    if ma is None:
        print("memory_analysis unavailable on this backend")
        return
    gib = 2.0**30
    for k in ("argument_size_in_bytes", "output_size_in_bytes",
              "temp_size_in_bytes", "generated_code_size_in_bytes"):
        v = getattr(ma, k, None)
        if v is not None:
            print(f"{k:36s} {v / gib:8.3f} GiB")
    arg = getattr(ma, "argument_size_in_bytes", 0)
    tmp = getattr(ma, "temp_size_in_bytes", 0)
    print(f"{'live peak (args + temps)':36s} {(arg + tmp) / gib:8.3f} GiB "
          f"(v5e HBM: 16 GiB)", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ch", type=int, default=64)
    ap.add_argument("--batches", default="32,64")
    args = ap.parse_args()
    for b in [int(x) for x in args.batches.split(",")]:
        report(args.ch, b)


if __name__ == "__main__":
    main()
