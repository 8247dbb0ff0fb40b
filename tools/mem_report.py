#!/usr/bin/env python
"""Static HBM accounting for a train-step program (round-5 VERDICT item 5).

Compiles (does NOT execute) the requested train step and prints XLA's
memory_analysis(): argument/output/temp/generated-code bytes and the peak.
Because nothing runs, an over-HBM configuration can be analyzed without an
OOM — this is how the SR 256px microbatch-16 residency was itemized.

Usage:
  python tools/mem_report.py --sr --batch 16 --remat save_dots
  VIVID_REMAT_HIRES_AREA=4096 python tools/mem_report.py --sr --batch 16 \
      --remat save_dots
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from vivid_tpu.core.util import enable_persistent_compilation_cache

enable_persistent_compilation_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ch", type=int, default=64)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--remat", type=str, default="save_dots",
                    help="true|false|save_dots")
    ap.add_argument("--sr", action="store_true")
    ap.add_argument("--flagship", action="store_true")
    args = ap.parse_args()

    from vivid_tpu.diffusion.loss import NVLoss, SRNVLoss
    from vivid_tpu.diffusion.phema import std_to_exp
    from vivid_tpu.nn.precond import PrecondConfig, precond_init
    from vivid_tpu.train.step import (TrainConfig, init_train_state,
                                      make_train_step)

    remat = {"true": True, "false": False,
             "save_dots": "save_dots"}[args.remat.lower()]
    kw = dict(img_resolution=64, num_sources=2, extra_attn=1, use_bf16=True,
              remat=remat)
    if args.flagship:
        kw.update(model_channels=128, source_label_dim=20, target_label_dim=40)
    elif args.sr:
        kw.update(img_resolution=256, model_channels=64, super_res=True,
                  extra_attn=1, num_sources=1, source_label_dim=20,
                  target_label_dim=20)
    else:
        kw.update(model_channels=args.ch)
    cfg = PrecondConfig(**kw)

    # Abstract init: no device memory touched before compile.
    params = jax.eval_shape(lambda k: precond_init(k, cfg),
                            jax.random.PRNGKey(0))
    b = args.batch
    tcfg = TrainConfig(batch_size=b, ref_lr=1e-3, rampup_Mimg=0,
                       nimg_mult=1 if args.sr else 6, num_accum=1)
    exps = tuple(float(std_to_exp(s) + 1) for s in tcfg.ema_stds)
    loss_cls = SRNVLoss if args.sr else NVLoss
    step = jax.jit(make_train_step(loss_cls(P_mean=-0.8, P_std=1.6), cfg,
                                   tcfg, exps), donate_argnums=0)

    state = jax.eval_shape(lambda p: init_train_state(p, tcfg), params)
    res, ns = cfg.img_resolution, cfg.num_sources
    f32 = jnp.float32
    batch = {
        "src": jax.ShapeDtypeStruct((b, ns, res, res, 3), f32),
        "tgt": jax.ShapeDtypeStruct((b, res, res, 3), f32),
        "geometry": jax.ShapeDtypeStruct((b, ns, 20), f32),
    }
    rng = jax.ShapeDtypeStruct((2,), jnp.uint32)

    n = sum(int(x.size) for x in jax.tree.leaves(params))
    print(f"model: {n / 1e6:.2f}M params, res={res}, batch={b}, "
          f"remat={remat}, hires_area="
          f"{os.environ.get('VIVID_REMAT_HIRES_AREA', '16384 (default)')}",
          flush=True)
    compiled = step.lower(state, batch, rng).compile()
    ma = compiled.memory_analysis()
    if ma is None:
        print("memory_analysis unavailable on this backend")
        return
    gib = 2.0**30
    for k in ("argument_size_in_bytes", "output_size_in_bytes",
              "temp_size_in_bytes", "generated_code_size_in_bytes",
              "alias_size_in_bytes"):
        v = getattr(ma, k, None)
        if v is not None:
            print(f"{k:36s} {v / gib:8.3f} GiB")
    # args alias outputs via donation; live peak ~= args + temps.
    arg = getattr(ma, "argument_size_in_bytes", 0)
    tmp = getattr(ma, "temp_size_in_bytes", 0)
    print(f"{'peak (args + temps)':36s} {(arg + tmp) / gib:8.3f} GiB "
          f"(v5e HBM: 16 GiB)")


if __name__ == "__main__":
    main()
