#!/usr/bin/env python
"""Headline benchmark — the full round row on one chip, one JSON line:

  * precond_fwd_tflops  — NVPrecond ch=64 dual-source forward (the primary
    metric; baseline = the reference's A40 profile, visualize.json:2:
    733.53 GMACs in 863.91 ms = 1.70 TFLOP/s achieved).
  * guided_img_per_s    — 32-step guided sampler (net + uncond gnet), b=32
    (the measured serving sweet spot; logs/r4/guided_sweep_attndot.log).
  * flagship_train      — ch=128 (250.7M params) b=32 save_dots train step,
    ms/step and nimg/s (nimg = batch x 6 dual-source accounting).
  * cascade_img_per_s   — guided ch=128 base + 256px SR (log-parity 57.5M
    arch), b=8: the reference README's full serving protocol.

Families are independent: one failing records an error string in `detail`
instead of killing the line. VIVID_BENCH_FAMILIES=fwd,guided,train,cascade
selects a subset (CPU fallback runs fwd only).
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_comp_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

A40_BASELINE_TFLOPS = 1.70  # visualize.json: 733.53 GMACs in 863.91 ms


def _tunnel_note():
    """The axon TPU tunnel has transient outages (backend init raises
    UNAVAILABLE). Probe it in a subprocess (a failed in-process init can
    stick); wait up to VIVID_BENCH_TUNNEL_WAIT_S (default 20 min), then fall
    back to CPU so the bench still emits its one JSON line — with an explicit
    note, so a down tunnel is never mistaken for a framework regression."""
    import subprocess
    probe = ("import jax, numpy as np; x = jax.numpy.ones((4, 4)); "
             "assert float(np.asarray((x @ x)[0, 0])) == 4.0")
    wait_s = float(os.environ.get("VIVID_BENCH_TUNNEL_WAIT_S", "1200"))
    deadline = time.time() + wait_s
    while True:
        try:
            r = subprocess.run([sys.executable, "-c", probe],
                               capture_output=True, timeout=150)
            if r.returncode == 0:
                return None
        except subprocess.TimeoutExpired:
            pass
        if time.time() >= deadline:
            jax.config.update("jax_platforms", "cpu")
            return ("TPU tunnel unavailable for %.0f min; CPU fallback — "
                    "value is NOT a TPU measurement" % (wait_s / 60))
        time.sleep(60)


def bench_fwd(on_tpu):
    """Primary family: ch=64 dual-source forward TF/s + latency."""
    import numpy as np
    from vivid_tpu.nn.precond import PrecondConfig, precond_apply, precond_init

    batch = 16 if on_tpu else 2
    cfg = PrecondConfig(img_resolution=64, num_sources=2, model_channels=64,
                        extra_attn=1, use_bf16=on_tpu, remat=False)
    params = precond_init(jax.random.PRNGKey(0), cfg)

    key = jax.random.PRNGKey(1)
    src = jax.random.normal(key, (batch, 2, 64, 64, 3))
    dst = jax.random.normal(jax.random.fold_in(key, 1), (batch, 64, 64, 3))
    sigma = jnp.exp(jax.random.normal(jax.random.fold_in(key, 2), (batch,)))
    geometry = jax.random.normal(jax.random.fold_in(key, 3), (batch, 2, 20))

    fwd = jax.jit(lambda p, s, d, sg, g: precond_apply(p, cfg, s, d, sg, g))
    cost = fwd.lower(params, src, dst, sigma, geometry).compile().cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    flops = float(cost.get("flops", 0.0))

    # The axon tunnel executes lazily — block_until_ready does not actually
    # synchronize — so chain iterations (output feeds the next input), force
    # execution with a scalar fetch, and difference two chain lengths to
    # cancel the fetch/tunnel overhead.
    def timed_chain(iters):
        t0 = time.perf_counter()
        o = dst
        for _ in range(iters):
            o = fwd(params, src, o, sigma, geometry)
        _ = np.asarray(o[0, 0, 0, 0])
        return time.perf_counter() - t0

    n1, n2 = (5, 25) if on_tpu else (1, 3)
    timed_chain(2)  # warm up
    t1 = min(timed_chain(n1) for _ in range(3))
    t2 = min(timed_chain(n2) for _ in range(3))
    dt = max((t2 - t1) / (n2 - n1), 1e-9)
    return dict(tflops=flops / dt / 1e12, latency_ms=dt * 1e3,
                gflops_per_fwd=flops / 1e9, batch=batch)


def bench_guided():
    """32-step guided sampler img/s at the b=32 serving point."""
    from tools.bench_serve import guided_sampler
    rate, per = guided_sampler(ch=64, batch=32)
    return dict(img_per_s=rate, s_per_batch=per, batch=32)


def bench_train():
    """Flagship ch=128 b=32 save_dots train step."""
    import numpy as np
    from vivid_tpu.diffusion.loss import NVLoss
    from vivid_tpu.diffusion.phema import std_to_exp
    from vivid_tpu.nn.precond import PrecondConfig, precond_init
    from vivid_tpu.train.step import (TrainConfig, init_train_state,
                                      make_train_step)
    b = 32
    cfg = PrecondConfig(img_resolution=64, num_sources=2, model_channels=128,
                        extra_attn=1, use_bf16=True, remat="save_dots",
                        source_label_dim=20, target_label_dim=40)
    params = precond_init(jax.random.PRNGKey(0), cfg)
    tcfg = TrainConfig(batch_size=b, ref_lr=1e-3, rampup_Mimg=0, nimg_mult=6)
    exps = tuple(float(std_to_exp(s) + 1) for s in tcfg.ema_stds)
    step = jax.jit(make_train_step(NVLoss(P_mean=-0.8, P_std=1.6), cfg, tcfg,
                                   exps), donate_argnums=0)
    state = init_train_state(params, tcfg)
    del params
    key = jax.random.PRNGKey(1)
    batch = {"src": jax.random.normal(key, (b, 2, 64, 64, 3)),
             "tgt": jax.random.normal(jax.random.fold_in(key, 1), (b, 64, 64, 3)),
             "geometry": jax.random.normal(jax.random.fold_in(key, 2), (b, 2, 20))}

    def chain(iters):
        nonlocal state
        t0 = time.perf_counter()
        st = None
        for i in range(iters):
            state, st = step(state, batch, jax.random.fold_in(key, i))
        float(st["Loss/loss"])
        return time.perf_counter() - t0

    chain(2)  # compile + warm
    t1 = min(chain(3) for _ in range(2))
    t2 = min(chain(13) for _ in range(2))
    dt = (t2 - t1) / 10
    return dict(ms_per_step=dt * 1e3, nimg_per_s=b * 6 / dt, batch=b,
                remat="save_dots")


def bench_cascade():
    """Flagship serving cascade (README protocol), log-parity SR arch."""
    from tools.bench_serve import cascade
    rate, per = cascade(batch=8, sr_arch="log")
    return dict(img_per_s=rate, s_per_batch=per, batch=8, sr_arch="log")


def main():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    note = _tunnel_note()
    on_tpu = jax.devices()[0].platform != "cpu"
    default = "fwd,guided,train,cascade" if on_tpu else "fwd"
    families = [f for f in os.environ.get("VIVID_BENCH_FAMILIES",
                                          default).split(",") if f]

    detail = {"platform": jax.devices()[0].platform,
              "baseline": "A40 1.70 TFLOP/s measured (reference visualize.json)"}
    if note:
        detail["note"] = note
    tflops = 0.0

    runners = {"fwd": lambda: bench_fwd(on_tpu), "guided": bench_guided,
               "train": bench_train, "cascade": bench_cascade}
    for fam in families:
        try:
            r = runners[fam]()
            if fam == "fwd":
                tflops = r.pop("tflops")
                detail.update(batch=r["batch"],
                              latency_ms=round(r["latency_ms"], 2),
                              gflops_per_fwd=round(r["gflops_per_fwd"], 1))
            elif fam == "guided":
                detail["guided_sampler_img_per_s"] = round(r["img_per_s"], 2)
                detail["guided_batch"] = r["batch"]
            elif fam == "train":
                detail["flagship_train_ms"] = round(r["ms_per_step"], 1)
                detail["flagship_train_nimg_per_s"] = round(r["nimg_per_s"])
            elif fam == "cascade":
                detail["cascade_img_per_s"] = round(r["img_per_s"], 3)
        except Exception as err:  # one family failing must not kill the line
            detail[f"{fam}_error"] = f"{type(err).__name__}: {err}"[:200]
        finally:
            import gc
            gc.collect()

    print(json.dumps({
        "metric": "precond_fwd_tflops",
        "value": round(tflops, 3),
        "unit": "TFLOP/s",
        "vs_baseline": round(tflops / A40_BASELINE_TFLOPS, 3),
        "detail": detail,
    }))


if __name__ == "__main__":
    sys.exit(main())
