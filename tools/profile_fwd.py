#!/usr/bin/env python
"""Component-level TPU profile of the NVPrecond forward at the benchmark
config (ch=64 dual-source, b=16, bf16).

The axon tunnel executes lazily and sub-0.5ms timings are unreliable, so all
measurements are chained differential timings (see bench.py): run a data-
dependent chain of N iterations, fetch a scalar, difference two chain lengths.

Usage: python tools/profile_fwd.py [--ch 64] [--batch 16]
Sections:
  full        — precond_apply end to end (the bench number)
  conv-only   — same net with attn_resolutions=() extra_attn=None
  no-pallas   — full net with VIVID_DISABLE_PALLAS=1 semantics
  attn-micro  — fused_attention at every (S, KV, H) the model instantiates,
                flash vs einsum, x layer count
  block-micro — one full xattn block at the hot shape
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


def timed(fn, *args, n1=5, n2=25, reps=3, chain_arg=0):
    """Differential chained timing: fn's output must be shape-compatible with
    args[chain_arg]."""
    args = list(args)

    def chain(iters):
        a = list(args)
        t0 = time.perf_counter()
        for _ in range(iters):
            a[chain_arg] = fn(*a)
        np.asarray(jax.tree.leaves(a[chain_arg])[0]).ravel()[0]
        return time.perf_counter() - t0

    chain(2)  # warm up / compile
    t1 = min(chain(n1) for _ in range(reps))
    t2 = min(chain(n2) for _ in range(reps))
    return max((t2 - t1) / (n2 - n1), 1e-9)


def flops_of(fn, *args):
    cost = jax.jit(fn).lower(*args).compile().cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    return float(cost.get("flops", 0.0))


def section_full(ch, batch, variant="full"):
    from vivid_tpu.nn.precond import PrecondConfig, precond_apply, precond_init
    kw = dict(img_resolution=64, num_sources=2, model_channels=ch,
              extra_attn=1, use_bf16=True, remat=False)
    if variant == "conv-only":
        kw.update(attn_resolutions=(), extra_attn=None)
    cfg = PrecondConfig(**kw)
    params = precond_init(jax.random.PRNGKey(0), cfg)
    key = jax.random.PRNGKey(1)
    src = jax.random.normal(key, (batch, 2, 64, 64, 3))
    dst = jax.random.normal(jax.random.fold_in(key, 1), (batch, 64, 64, 3))
    sigma = jnp.exp(jax.random.normal(jax.random.fold_in(key, 2), (batch,)))
    geometry = jax.random.normal(jax.random.fold_in(key, 3), (batch, 2, 20))

    # params must be jit ARGUMENTS (closed-over trees become HLO literals and
    # overflow the tunnel's remote-compile transport).
    fwd = jax.jit(lambda p, s, d, sg, g: precond_apply(p, cfg, s, d, sg, g))
    dt = timed(fwd, params, src, dst, sigma, geometry, chain_arg=2)
    fl = flops_of(fwd, params, src, dst, sigma, geometry)
    print(f"{variant:>20}: {dt * 1e3:7.2f} ms  {fl / dt / 1e12:6.1f} TF/s "
          f"({fl / 1e9:.0f} GF)")
    return dt


def model_attention_shapes(ch, batch):
    """(label, B, Sq, Sk, H, n_layers) for every attention site at the
    benchmark config (img 64, mult 1/2/3/4, blocks 3, attn 16/8, extra 1)."""
    out = []
    for res, n_enc, n_dec in ((32, 1, 1), (16, 3, 4), (8, 3 + 2, 4 + 1)):
        c = ch * {32: 2, 16: 3, 8: 4}[res]
        h = c // 64
        s = res * res
        n = n_enc + n_dec
        out.append((f"unet-xattn r{res}", batch, s, 3 * s, h, n))
        out.append((f"encoder-self r{res}", 2 * batch, s, s, h, n))
    return out


STACK = 32  # attention applications per jitted program (amortizes the
            # tunnel's unreliable sub-0.5ms timing floor)


def section_attn_micro(ch, batch):
    from vivid_tpu.kernels.attention import fused_attention, reference_attention
    total = {"flash": 0.0, "einsum": 0.0}
    print(f"\nattention micro (lax.scan stack of {STACK}, per-layer):")
    for label, b, sq, sk, h, n in model_attention_shapes(ch, batch):
        key = jax.random.PRNGKey(0)
        # Kernel-native layout [B, H, S, D] (kernels/attention.py contract).
        q = jax.random.normal(key, (b, h, sq, 64), jnp.bfloat16)
        k = jax.random.normal(jax.random.fold_in(key, 1), (b, h, sk, 64), jnp.bfloat16)
        v = jax.random.normal(jax.random.fold_in(key, 2), (b, h, sk, 64), jnp.bfloat16)
        row = f"  {label:>18} B={b:<3} Sq={sq:<5} Sk={sk:<5} H={h} x{n}:"
        for name, fn in (("flash", fused_attention), ("einsum", reference_attention)):
            def stack(q_, k_, v_, _fn=fn):
                def body(x, _):
                    # feed output back as q so nothing is dead code
                    return _fn(x, k_, v_, None).astype(x.dtype), ()
                return jax.lax.scan(body, q_, None, length=STACK)[0]
            f = jax.jit(stack)
            dt = timed(f, q, k, v, n1=2, n2=8, reps=2) / STACK
            mm = 4 * b * h * sq * sk * 64  # QK^T + PV matmul flops
            row += f"  {name} {dt * 1e3:6.3f} ms ({mm / dt / 1e12:5.1f} TF/s)"
            total[name] += dt * n
        print(row)
    print(f"  TOTAL attention: flash {total['flash'] * 1e3:.2f} ms | "
          f"einsum {total['einsum'] * 1e3:.2f} ms")
    return total


def section_block_micro(ch, batch):
    """Full xattn block (convs + packing + attention + epilogues) per level,
    as a jitted scan stack — multiply by layer counts to account for the
    full-model attention region."""
    from vivid_tpu.nn.blocks import BlockConfig, block_apply, block_init
    print(f"\nxattn block stacks of {STACK} (per-layer):")
    for res, mult, n_layers in ((32, 2, 2), (16, 3, 7), (8, 4, 10)):
        c = ch * mult
        cfg = BlockConfig(in_channels=c, out_channels=c, emb_channels=ch * 4,
                          flavor="enc", attention=True, xattn=True,
                          num_cross_sources=2, channels_per_head=64)
        params = block_init(jax.random.PRNGKey(0), cfg)
        params = jax.tree.map(lambda x: x.astype(jnp.bfloat16)
                              if x.ndim >= 2 else x, params)
        key = jax.random.PRNGKey(1)
        x = jax.random.normal(key, (batch, res, res, c), jnp.bfloat16)
        emb = jax.random.normal(jax.random.fold_in(key, 1), (batch, ch * 4),
                                jnp.bfloat16)
        f1 = jax.random.normal(jax.random.fold_in(key, 2), (batch, res, res, c),
                               jnp.bfloat16)
        f2 = jax.random.normal(jax.random.fold_in(key, 3), (batch, res, res, c),
                               jnp.bfloat16)

        def make(block_cfg, p):
            def stack(p_, x_):
                def body(h, _):
                    feats = [f1, f2] if block_cfg.xattn else None
                    return block_apply(p_, block_cfg, h, emb,
                                       features=feats).astype(h.dtype), ()
                return jax.lax.scan(body, x_, None, length=STACK)[0]
            return jax.jit(stack)

        full = make(cfg, params)
        dt = timed(full, params, x, n1=2, n2=8, reps=2, chain_arg=1) / STACK
        fl = flops_of(full, params, x) / STACK
        ncfg = BlockConfig(in_channels=c, out_channels=c, emb_channels=ch * 4,
                           flavor="enc", attention=False)
        nparams = {k: v for k, v in params.items()
                   if k in ("emb_gain", "conv_res0", "emb_linear", "conv_res1")}
        noattn = make(ncfg, nparams)
        dt2 = timed(noattn, nparams, x, n1=2, n2=8, reps=2, chain_arg=1) / STACK
        print(f"  r{res:<3} C={c:<4} x{n_layers:<3}: full {dt * 1e3:6.3f} ms "
              f"({fl / dt / 1e12:5.1f} TF/s) | conv-part {dt2 * 1e3:6.3f} ms "
              f"| attn region {(dt - dt2) * 1e3:6.3f} ms "
              f"(x{n_layers} = {(dt - dt2) * n_layers * 1e3:6.2f} ms)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ch", type=int, default=64)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--sections", default="full,conv,attn,block")
    args = ap.parse_args()
    print(f"platform={jax.devices()[0].platform} ch={args.ch} b={args.batch}")
    s = args.sections.split(",")
    if "full" in s:
        section_full(args.ch, args.batch, "full")
    if "conv" in s:
        section_full(args.ch, args.batch, "conv-only")
    if "attn" in s:
        section_attn_micro(args.ch, args.batch)
    if "block" in s:
        section_block_micro(args.ch, args.batch)


if __name__ == "__main__":
    main()
