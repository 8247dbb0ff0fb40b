#!/usr/bin/env python
"""Serving benchmarks: guided-sampler throughput vs batch, and the flagship
base->SR cascade (the reference README's full protocol) — img/s per chip.

Usage: python tools/bench_serve.py [--what sweep|cascade] [--batches 16,32,64]
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


def guided_sampler(ch, batch, num_steps=32):
    from vivid_tpu.diffusion.sampler import edm_sampler, make_denoiser
    from vivid_tpu.nn.precond import PrecondConfig, precond_init
    cfg = PrecondConfig(img_resolution=64, num_sources=2, model_channels=ch,
                        extra_attn=1, use_bf16=True, remat=False)
    gcfg = PrecondConfig(img_resolution=64, num_sources=2, model_channels=ch,
                         extra_attn=1, use_bf16=True, remat=False, uncond=True)
    params = precond_init(jax.random.PRNGKey(0), cfg)
    gparams = precond_init(jax.random.PRNGKey(2), gcfg)

    @jax.jit
    def sample(p, gp, s, g, n):
        den = make_denoiser(p, cfg, src=s, geometry=g)
        gden = make_denoiser(gp, gcfg)
        return edm_sampler(den, n, gnet_denoise=gden, guidance=1.5,
                           num_steps=num_steps)

    key = jax.random.PRNGKey(1)
    src = jax.random.normal(key, (batch, 2, 64, 64, 3))
    geometry = jax.random.normal(jax.random.fold_in(key, 3), (batch, 2, 20))
    noise = jax.random.normal(jax.random.fold_in(key, 4), (batch, 64, 64, 3))

    def chain(iters):
        t0 = time.perf_counter()
        o = noise
        for _ in range(iters):
            o = sample(params, gparams, src, geometry, o)
        np.asarray(o[0, 0, 0, 0])
        return time.perf_counter() - t0

    chain(1)  # compile
    t1 = min(chain(1) for _ in range(2))
    t2 = min(chain(3) for _ in range(2))
    per = (t2 - t1) / 2
    return batch / per, per


def sr_config(arch: str):
    """The 256px SR stage config. 'log' = the only size-documented SR model
    (experiments/log.txt:720-792 param table, 57.55M: extra_attn=1 puts
    attention at S=16384/4096/1024, single-source, labels 20/20 — 1532
    GF/img). 'in0' = the live-code reading (vivid-sr preset leaves extra_attn
    unset, so attention only at the 32x32 bottleneck in0 — 530 GF/img; this
    was the round-2/3 bench arch). The live reference CLI cannot actually
    build either (opts.extra_attn AttributeError), so the log table is the
    parity anchor; 'in0' is kept for comparison with old numbers."""
    from vivid_tpu.nn.precond import PrecondConfig
    if arch == "log":
        return PrecondConfig(img_resolution=256, num_sources=1,
                             model_channels=64, super_res=True, extra_attn=1,
                             source_label_dim=20, target_label_dim=20,
                             use_bf16=True, remat=False)
    assert arch == "in0", arch
    return PrecondConfig(img_resolution=256, num_sources=2, model_channels=64,
                         super_res=True, use_bf16=True, remat=False)


def cascade(batch=8, num_steps=32, sr_arch="log"):
    """Guided ch=128 base at 64px + unguided SR at 256px (reference README
    serving protocol)."""
    from vivid_tpu.diffusion.sampler import edm_sampler, make_denoiser
    from vivid_tpu.diffusion.loss import down_up_resize
    from vivid_tpu.nn.precond import PrecondConfig, precond_init
    cfg = PrecondConfig(img_resolution=64, num_sources=2, model_channels=128,
                        extra_attn=1, use_bf16=True, remat=False,
                        source_label_dim=20, target_label_dim=40)
    gcfg = PrecondConfig(img_resolution=64, num_sources=2, model_channels=128,
                         extra_attn=1, use_bf16=True, remat=False, uncond=True)
    sr_cfg = sr_config(sr_arch)
    params = precond_init(jax.random.PRNGKey(0), cfg)
    gparams = precond_init(jax.random.PRNGKey(2), gcfg)
    sr_params = precond_init(jax.random.PRNGKey(3), sr_cfg)

    @jax.jit
    def run(p, gp, sp, src, sr_src, geo, sr_geo, noise, sr_noise):
        den = make_denoiser(p, cfg, src=src, geometry=geo)
        gden = make_denoiser(gp, gcfg)
        latents = edm_sampler(den, noise, gnet_denoise=gden, guidance=1.5,
                              num_steps=num_steps)
        low = jax.image.resize(latents, sr_noise.shape, method="bilinear")
        sr_den = make_denoiser(sp, sr_cfg, src=sr_src, geometry=sr_geo,
                               conditioning_image=low,
                               rng=jax.random.PRNGKey(7))
        return edm_sampler(sr_den, sr_noise, num_steps=num_steps)

    key = jax.random.PRNGKey(1)
    b = batch
    ns = sr_cfg.num_sources
    src = jax.random.normal(key, (b, 2, 64, 64, 3))
    sr_src = jax.random.normal(jax.random.fold_in(key, 1),
                               (b, ns, 256, 256, 3))
    geo = jax.random.normal(jax.random.fold_in(key, 2), (b, 2, 20))
    sr_geo = jax.random.normal(jax.random.fold_in(key, 3), (b, ns, 20))
    noise = jax.random.normal(jax.random.fold_in(key, 4), (b, 64, 64, 3))
    sr_noise = jax.random.normal(jax.random.fold_in(key, 5), (b, 256, 256, 3))

    def chain(iters):
        t0 = time.perf_counter()
        o = sr_noise
        for _ in range(iters):
            o = run(params, gparams, sr_params, src, sr_src, geo, sr_geo,
                    noise, o)
        np.asarray(o[0, 0, 0, 0])
        return time.perf_counter() - t0

    chain(1)
    t1 = min(chain(1) for _ in range(2))
    t2 = min(chain(3) for _ in range(2))
    per = (t2 - t1) / 2
    return batch / per, per


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--what", default="sweep")
    ap.add_argument("--ch", type=int, default=64)
    ap.add_argument("--batches", default="16,32,64")
    ap.add_argument("--batch", type=int, default=8,
                    help="cascade batch size")
    ap.add_argument("--sr-arch", default="log", choices=("log", "in0"),
                    help="SR stage architecture (see sr_config)")
    args = ap.parse_args()
    if args.what == "sweep":
        for b in [int(x) for x in args.batches.split(",")]:
            rate, per = guided_sampler(args.ch, b)
            print(f"guided ch={args.ch} b={b}: {rate:.2f} img/s "
                  f"({per * 1e3:.0f} ms/batch)", flush=True)
    else:
        rate, per = cascade(batch=args.batch, sr_arch=args.sr_arch)
        print(f"FLAGSHIP cascade b={args.batch} sr={args.sr_arch}: "
              f"{rate:.2f} img/s ({per:.2f} s/batch)", flush=True)


if __name__ == "__main__":
    main()
