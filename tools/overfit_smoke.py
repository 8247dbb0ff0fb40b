#!/usr/bin/env python
"""End-to-end convergence demonstration: overfit a small model on a few
synthetic scenes and show (a) the training loss falls and (b) the sampled
novel views approach the ground-truth targets (PSNR rises vs the untrained
model). This is the learning proof the unit suite can't give — the analogue
of eyeballing the reference's periodic sample grids
(training_loop.py:380-465).

Runs on whatever device JAX finds (real chip: ~5 min incl. compile with a
warm cache). Writes the loss curve + PSNR numbers to --out (JSON) and exits
nonzero if the convergence gates fail.

Usage: python tools/overfit_smoke.py [--steps 300] [--out docs/overfit_smoke.json]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from vivid_tpu.core.util import enable_persistent_compilation_cache

enable_persistent_compilation_cache()


def psnr(a, b, span=2.0):
    mse = float(np.mean((np.asarray(a, np.float64) - np.asarray(b)) ** 2))
    return 10 * np.log10(span ** 2 / max(mse, 1e-12))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--ch", type=int, default=64)
    ap.add_argument("--imsize", type=int, default=32)
    ap.add_argument("--out", default="docs/overfit_smoke.json")
    args = ap.parse_args()

    from vivid_tpu.data.collate import BatchLoader, DualSourceCollate
    from vivid_tpu.data.scenes import SceneDataset, make_synthetic_dataset
    from vivid_tpu.diffusion.loss import NVLoss
    from vivid_tpu.diffusion.phema import std_to_exp
    from vivid_tpu.diffusion.sampler import edm_sampler, make_denoiser
    from vivid_tpu.nn.precond import PrecondConfig, precond_init
    from vivid_tpu.train.step import (TrainConfig, init_train_state,
                                      make_train_step)
    import tempfile

    data_dir = tempfile.mkdtemp(prefix="overfit_scenes_")
    make_synthetic_dataset(data_dir, num_scenes=4, num_views=6,
                           imsize=args.imsize)
    collate = DualSourceCollate(imsize=args.imsize, seed=0)
    loader = BatchLoader(iter(SceneDataset(data_dir, seed=0)), collate,
                         batch_size=args.batch, prefetch=2, num_threads=2)

    cfg = PrecondConfig(img_resolution=args.imsize, num_sources=2,
                        model_channels=args.ch,
                        attn_resolutions=(args.imsize // 2, args.imsize // 4),
                        use_bf16=True, remat=False)
    params = precond_init(jax.random.PRNGKey(0), cfg)
    tcfg = TrainConfig(batch_size=args.batch, ref_lr=8e-3, rampup_Mimg=0.002,
                       nimg_mult=1, ema_stds=(0.05,))
    exps = tuple(float(std_to_exp(s) + 1) for s in tcfg.ema_stds)
    step = jax.jit(make_train_step(NVLoss(P_mean=-0.8, P_std=1.6), cfg, tcfg,
                                   exps), donate_argnums=0)
    state = init_train_state(params, tcfg)

    # Sample INSIDE the trained noise range: the production P(-0.8, 1.6)
    # training distribution concentrates at sigma ~0.04-2.2, and a 2000-step
    # overfit has no coverage above that, so launching the sampler from the
    # production sigma_max=80 walks through an untrained regime and lands in
    # the wrong memorized view's basin (measured: denoise PSNR 34.6 dB at
    # sigma=0.1, 29.7 at 1.0, 10.9 at 20). sigma_max=2 keeps the whole
    # trajectory on trained ground — the demonstration is of learning + the
    # sampler mechanics, not of full-scale noise coverage (which needs
    # production-length training).
    @jax.jit
    def sample(p, src, geometry, noise):
        den = make_denoiser(p, cfg, src=src, geometry=geometry)
        return edm_sampler(den, noise, num_steps=16, sigma_max=2.0)

    # Fixed eval batch (reused for the before/after PSNR comparison).
    ev = next(loader)
    from vivid_tpu.data.encoders import StandardRGBEncoder
    enc = StandardRGBEncoder()
    ev_src = enc.encode_latents(ev["src_image"])
    ev_tgt = enc.encode_latents(ev["tgt_image"])
    ev_geo = jnp.asarray(ev["geometry"])
    ev_noise = jax.random.normal(jax.random.PRNGKey(99), ev_tgt.shape)

    before = np.asarray(sample(state.params, ev_src, ev_geo, ev_noise))
    psnr_before = psnr(before, ev_tgt)
    # Copy-the-source floor: a model that ignores geometry and emits the
    # first source view scores this; reconstruction must beat it.
    psnr_src_floor = psnr(np.asarray(ev_src)[:, 0], ev_tgt)

    losses = []
    t0 = time.time()
    for i in range(args.steps):
        batch = next(loader)
        b = {"src": enc.encode_latents(batch["src_image"]),
             "tgt": enc.encode_latents(batch["tgt_image"]),
             "geometry": jnp.asarray(batch["geometry"])}
        state, st = step(state, b, jax.random.fold_in(jax.random.PRNGKey(1), i))
        if i % 20 == 0 or i == args.steps - 1:
            losses.append((i, float(st["Loss/loss"])))
            print(f"step {i:4d}  loss {losses[-1][1]:.4f}  "
                  f"({time.time() - t0:.0f}s)", flush=True)
    loader.close()

    after_ema = np.asarray(sample(state.emas[0], ev_src, ev_geo, ev_noise))
    after_raw = np.asarray(sample(state.params, ev_src, ev_geo, ev_noise))
    psnr_ema = psnr(after_ema, ev_tgt)
    psnr_raw = psnr(after_raw, ev_tgt)
    psnr_after = max(psnr_ema, psnr_raw)

    # Gates: sustained loss decrease (first-vs-last thirds) and PSNR gain.
    curve = [v for _, v in losses]
    third = max(len(curve) // 3, 1)
    head, tail = float(np.mean(curve[:third])), float(np.mean(curve[-third:]))
    result = dict(steps=args.steps, batch=args.batch, ch=args.ch,
                  imsize=args.imsize, loss_curve=losses,
                  loss_head_third=head, loss_tail_third=tail,
                  psnr_before_db=psnr_before, psnr_after_db=psnr_after,
                  psnr_src_floor_db=psnr_src_floor,
                  psnr_after_ema_db=psnr_ema, psnr_after_raw_db=psnr_raw,
                  wall_s=round(time.time() - t0, 1),
                  device=str(jax.devices()[0].platform))
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({k: v for k, v in result.items() if k != "loss_curve"}))

    ok = tail < 0.7 * head and psnr_after > psnr_before + 3.0
    print("CONVERGENCE", "OK" if ok else "FAILED",
          f"(loss {head:.3f}->{tail:.3f}, psnr {psnr_before:.1f}->"
          f"{psnr_after:.1f} dB, copy-src floor {psnr_src_floor:.1f})")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
