#!/usr/bin/env python
"""Pre-seed the persistent compilation cache with the production programs.

Cold train-step / sampler compiles take minutes through a remote-compile TPU
backend; with the persistent cache (now enabled by every CLI —
core/util.enable_persistent_compilation_cache) they load in seconds. This
tool AOT-lowers and compiles the standard program set WITHOUT allocating any
real weights (abstract avals via jax.eval_shape), so a deploy host can prime
its cache before the first real run. Prints compile seconds per program —
rerun to see the warm-load time.

Usage: python tools/prime_cache.py [--set base|flagship|serve|all]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from vivid_tpu.core.util import enable_persistent_compilation_cache

enable_persistent_compilation_cache()


def _abstract(fn, *args):
    return jax.eval_shape(fn, *args)


def _sds(shape, dtype=jnp.float32):
    return jax.ShapeDtypeStruct(shape, dtype)


def _time(name, build):
    t0 = time.perf_counter()
    build()
    print(f"{name}: compiled in {time.perf_counter() - t0:.1f} s", flush=True)


def prime_train(ch, batch, remat, label_dims=(20, 40), res=64, imsize=None):
    from vivid_tpu.diffusion.loss import NVLoss
    from vivid_tpu.diffusion.phema import std_to_exp
    from vivid_tpu.nn.precond import PrecondConfig, precond_init
    from vivid_tpu.train.step import (TrainConfig, init_train_state,
                                      make_train_step)
    cfg = PrecondConfig(img_resolution=res, num_sources=2, model_channels=ch,
                        extra_attn=1, use_bf16=True, remat=remat,
                        source_label_dim=label_dims[0],
                        target_label_dim=label_dims[1])
    tcfg = TrainConfig(batch_size=batch, nimg_mult=6)
    exps = tuple(float(std_to_exp(s) + 1) for s in tcfg.ema_stds)
    step = jax.jit(make_train_step(NVLoss(P_mean=-0.8, P_std=1.6),
                               cfg, tcfg, exps),
                   donate_argnums=0)
    params = _abstract(precond_init, jax.random.PRNGKey(0), cfg)
    state = _abstract(init_train_state, params, tcfg)
    batch_avals = {"src": _sds((batch, 2, res, res, 3)),
                   "tgt": _sds((batch, res, res, 3)),
                   "geometry": _sds((batch, 2, label_dims[0]))}
    key = _sds((2,), jnp.uint32)
    _time(f"train ch={ch} b={batch} remat={remat}",
          lambda: step.lower(state, batch_avals, key).compile())


def prime_sampler(ch, batch, num_steps=32, res=64):
    from vivid_tpu.diffusion.sampler import edm_sampler, make_denoiser
    from vivid_tpu.nn.precond import PrecondConfig, precond_init
    cfg = PrecondConfig(img_resolution=res, num_sources=2, model_channels=ch,
                        extra_attn=1, use_bf16=True, remat=False,
                        source_label_dim=20,
                        target_label_dim=40 if ch == 128 else 20 * 2)
    gcfg = PrecondConfig(img_resolution=res, num_sources=2, model_channels=ch,
                         extra_attn=1, use_bf16=True, remat=False,
                         uncond=True)

    @jax.jit
    def sample(p, gp, s, g, n):
        den = make_denoiser(p, cfg, src=s, geometry=g)
        gden = make_denoiser(gp, gcfg)
        return edm_sampler(den, n, gnet_denoise=gden, guidance=1.5,
                           num_steps=num_steps)

    params = _abstract(precond_init, jax.random.PRNGKey(0), cfg)
    gparams = _abstract(precond_init, jax.random.PRNGKey(1), gcfg)
    args = (params, gparams, _sds((batch, 2, res, res, 3)),
            _sds((batch, 2, cfg.target_label_dim // 2)),
            _sds((batch, res, res, 3)))
    _time(f"guided sampler ch={ch} b={batch} steps={num_steps}",
          lambda: sample.lower(*args).compile())


def prime_sr_sampler(batch, num_steps=32, res=256):
    from vivid_tpu.diffusion.sampler import edm_sampler, make_denoiser
    from vivid_tpu.nn.precond import precond_init
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from bench_serve import sr_config
    cfg = sr_config("log")  # the size-documented SR arch (57.55M)

    @jax.jit
    def sample(p, s, g, c, n):
        den = make_denoiser(p, cfg, src=s, geometry=g, conditioning_image=c)
        return edm_sampler(den, n, num_steps=num_steps)

    ns = cfg.num_sources
    params = _abstract(precond_init, jax.random.PRNGKey(0), cfg)
    args = (params, _sds((batch, ns, res, res, 3)), _sds((batch, ns, 20)),
            _sds((batch, res, res, 3)), _sds((batch, res, res, 3)))
    _time(f"SR sampler b={batch} steps={num_steps} {res}px",
          lambda: sample.lower(*args).compile())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--set", default="all",
                    choices=("base", "flagship", "serve", "all"))
    args = ap.parse_args()
    print(f"device: {jax.devices()[0].platform}; cache: "
          f"{jax.config.jax_compilation_cache_dir}", flush=True)
    if args.set in ("base", "all"):
        prime_train(64, 32, True, label_dims=(20, 40))
        prime_train(64, 32, "save_dots", label_dims=(20, 40))
    if args.set in ("flagship", "all"):
        prime_train(128, 32, "save_dots", label_dims=(20, 40))
    if args.set in ("serve", "all"):
        prime_sampler(128, 8)
        prime_sr_sampler(8)


if __name__ == "__main__":
    main()
