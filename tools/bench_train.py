#!/usr/bin/env python
"""Training-step benchmark: steady-state fused step (loss+grad+Adam+EMA)
time on one chip. Usage: python tools/bench_train.py [--ch 64] [--batch 32]
[--no-remat] [--flagship]"""

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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ch", type=int, default=64)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--no-remat", action="store_true")
    ap.add_argument("--remat", type=str, default=None,
                    help="override remat mode: true|false|save_dots")
    ap.add_argument("--flagship", action="store_true",
                    help="ch=128 with the production label dims")
    ap.add_argument("--sr", action="store_true",
                    help="SR config: 256px ch=64 super_res + SRNVLoss "
                    "(reference vivid-sr preset shapes)")
    ap.add_argument("--batch-gpu", type=int, default=None,
                    help="per-device microbatch; smaller than --batch runs "
                    "gradient accumulation (reference batch_gpu_total math, "
                    "training_loop.py:213-217)")
    ap.add_argument("--auto-layout", action="store_true",
                    help="compile the step with compiler-chosen (AUTO) "
                    "layouts for the train state and materialize the state "
                    "in that layout before stepping. Probes whether the "
                    "per-step f32 weight relayout copies (the dominant "
                    "class of the 19.8 ms copy/layout pool in the r5 "
                    "flagship train trace) disappear when params LIVE in "
                    "the layout the convs want.")
    ap.add_argument("--no-wpack", action="store_true",
                    help="force width-packed level-0 convs OFF (ablation)")
    ap.add_argument("--wpack", action="store_true",
                    help="force width-packed level-0 convs ON (ablation; "
                    "the default is OFF everywhere)")
    args = ap.parse_args()

    from vivid_tpu.diffusion.loss import NVLoss, SRNVLoss
    from vivid_tpu.diffusion.phema import std_to_exp
    from vivid_tpu.nn.precond import PrecondConfig, precond_init
    from vivid_tpu.train.step import (TrainConfig, init_train_state,
                                      make_train_step)

    remat = not args.no_remat
    if args.remat is not None:
        allowed = {"true": True, "false": False, "save_dots": "save_dots"}
        if args.remat.lower() not in allowed:
            ap.error(f"--remat must be one of {sorted(allowed)}, "
                     f"got {args.remat!r}")
        remat = allowed[args.remat.lower()]
    kw = dict(img_resolution=64, num_sources=2, extra_attn=1, use_bf16=True,
              remat=remat)
    if args.flagship:
        kw.update(model_channels=128, source_label_dim=20, target_label_dim=40)
    elif args.sr:
        # The size-documented SR model (experiments/log.txt:720-792, 57.55M):
        # extra_attn=1 (attention at S=16384/4096/1024), single-source,
        # labels 20/20. See tools/bench_serve.sr_config for the archaeology.
        kw.update(img_resolution=256, model_channels=64, super_res=True,
                  extra_attn=1, num_sources=1, source_label_dim=20,
                  target_label_dim=20)
    else:
        kw.update(model_channels=args.ch)
    if args.no_wpack:
        kw.update(wpack=False)
    elif args.wpack:
        kw.update(wpack=True)
    cfg = PrecondConfig(**kw)
    params = precond_init(jax.random.PRNGKey(0), cfg)
    n = sum(int(x.size) for x in jax.tree.leaves(params))
    b = args.batch
    num_accum = 1
    if args.batch_gpu and args.batch_gpu < b:
        assert b % args.batch_gpu == 0, (b, args.batch_gpu)
        num_accum = b // args.batch_gpu
    # nimg accounting: x6 only in dual-source mode (the SR preset is vanilla).
    nimg_mult = 1 if args.sr else 6
    tcfg = TrainConfig(batch_size=b, ref_lr=1e-3, rampup_Mimg=0,
                       nimg_mult=nimg_mult, num_accum=num_accum)
    exps = tuple(float(std_to_exp(s) + 1) for s in tcfg.ema_stds)
    loss_cls = SRNVLoss if args.sr else NVLoss
    step_fn = make_train_step(loss_cls(P_mean=-0.8, P_std=1.6), cfg,
                              tcfg, exps)
    step = jax.jit(step_fn, donate_argnums=0)
    state = init_train_state(params, tcfg)
    key = jax.random.PRNGKey(1)
    res = cfg.img_resolution
    ns = cfg.num_sources
    batch = {"src": jax.random.normal(key, (b, ns, res, res, 3)),
             "tgt": jax.random.normal(jax.random.fold_in(key, 1), (b, res, res, 3)),
             "geometry": jax.random.normal(jax.random.fold_in(key, 2), (b, ns, 20))}
    if num_accum > 1:  # [B, ...] -> [rounds, B/rounds, ...] like the trainer
        batch = jax.tree.map(
            lambda x: x.reshape((num_accum, x.shape[0] // num_accum)
                                + x.shape[1:]), batch)

    if args.auto_layout:
        # AUTO layouts: let XLA pick the layout every train-state leaf should
        # LIVE in (instead of the default row-major it must relayout from on
        # every step), then materialize the state in exactly that layout.
        # Donation aliases state-in to state-out, so the chosen layouts are
        # stable across steps and the relayout copies should vanish from the
        # steady-state profile.
        from jax.experimental.layout import Format, Layout
        auto = Format(Layout.AUTO)
        jitted = jax.jit(step_fn, in_shardings=(auto, None, None),
                         out_shardings=(auto, None), donate_argnums=0)
        def avals(t):
            # AUTO layouts lower against abstract avals only (a concrete
            # array carries a concrete layout, contradicting AUTO).
            return jax.tree.map(lambda x: jax.ShapeDtypeStruct(
                x.shape, x.dtype, sharding=x.sharding), t)
        t0 = time.perf_counter()
        compiled = jitted.lower(avals(state), avals(batch),
                                avals(jax.random.PRNGKey(2))).compile()
        print(f"auto-layout compile: {time.perf_counter() - t0:.1f}s",
              flush=True)
        in_fmts = compiled.input_formats
        state_fmts = in_fmts[0][0] if isinstance(in_fmts, tuple) \
            and len(in_fmts) == 2 else in_fmts[0]
        nondefault = sum(
            1 for f in jax.tree.leaves(state_fmts)
            if "{" in str(getattr(f, "layout", f)))
        print(f"auto-layout: {nondefault}/{len(jax.tree.leaves(state_fmts))} "
              f"state leaves got a compiler-chosen layout", flush=True)
        state = jax.device_put(state, state_fmts)
        step = compiled

    t0 = time.perf_counter()
    state, st = step(state, batch, jax.random.PRNGKey(2))
    float(st["Loss/loss"])
    print(f"first step (incl. compile): {time.perf_counter() - t0:.1f}s",
          flush=True)

    def chain(iters):
        nonlocal state
        t0 = time.perf_counter()
        st = None
        for i in range(iters):
            state, st = step(state, batch, jax.random.fold_in(key, i))
        float(st["Loss/loss"])
        return time.perf_counter() - t0

    chain(2)
    t1 = min(chain(3) for _ in range(2))
    t2 = min(chain(13) for _ in range(2))
    dt = (t2 - t1) / 10
    accum_note = f" accum={num_accum}x{args.batch_gpu}" if num_accum > 1 else ""
    print(f"train step{' SR' if args.sr else ''} "
          f"ch={kw['model_channels']} b={b}{accum_note} "
          f"remat={remat} ({n / 1e6:.1f}M params): "
          f"{dt * 1e3:.1f} ms = {b * nimg_mult / dt:.0f} nimg/s "
          f"({b / dt:.0f} rows/s)", flush=True)


if __name__ == "__main__":
    main()
