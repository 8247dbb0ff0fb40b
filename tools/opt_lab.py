#!/usr/bin/env python
"""Optimizer-pool lab (round-5 VERDICT item 2, elementwise half).

The flagship train step spends ~18.9 ms in "true elementwise" work; the
optimizer section (NaN scrub + global-norm clip + Adam + 2 power-EMA updates)
traverses the ~400-leaf param tree as per-leaf fused kernels. This lab
isolates that section at flagship scale and measures three formulations on
the chip:

  tree    — the production formulation (per-leaf jax.tree.map chains).
  flat    — identical math on ONE pre-flattened [N] f32 buffer per state
            tensor: the upper bound for any bucketing scheme (zero
            concat/unflatten cost, one kernel for the whole pool).
  hybrid  — the realistic integration: grads+params arrive as trees (the
            model needs a tree), m/v/emas stored flat; the step pays
            concat(grads), concat(params), fused update, unflatten(params').

Decision rule (BWD_ILV standard): integrate only if `hybrid` beats `tree`
by >2 ms at flagship scale; if `flat` ~= `tree`, the pool is already at its
HBM floor and per-leaf launch overhead is a myth on this compiler/chip —
record the falsification in docs/PERF.md and move on.

HBM traffic floor for reference: 6 reads + 5 writes of the 1.003 GB param
footprint = 11 GB ~= 13.5 ms at the v5e's 819 GB/s.

Usage: python tools/opt_lab.py [--ch 128] [--iters 30]
"""

import argparse
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vivid_tpu.core.util import enable_persistent_compilation_cache

enable_persistent_compilation_cache()

BETAS = (0.9, 0.99)
EPS = 1e-8
LR = 1e-4
EMA_BETAS = (0.995, 0.999)  # stand-ins for the power-function betas (same op shape)


def scrub_clip_adam_ema_tree(state, grads):
    """The production pool, verbatim op structure (train/step.py:132-160)."""
    p, m, v, e1, e2 = state
    grads = jax.tree.map(lambda g: jnp.nan_to_num(g, nan=0.0, posinf=0.0,
                                                  neginf=0.0), grads)
    gnorm = jnp.sqrt(sum(jnp.sum(jnp.square(x.astype(jnp.float32)))
                         for x in jax.tree.leaves(grads)))
    scale = jnp.minimum(1.0, 1.0 / (gnorm + 1e-12))
    grads = jax.tree.map(lambda g: g * scale, grads)
    m = jax.tree.map(lambda mm, g: BETAS[0] * mm + (1 - BETAS[0]) * g, m, grads)
    v = jax.tree.map(lambda vv, g: BETAS[1] * vv + (1 - BETAS[1]) * g * g, v, grads)
    p = jax.tree.map(lambda pp, mm, vv: pp - LR * mm / (jnp.sqrt(vv) + EPS),
                     p, m, v)
    e1 = jax.tree.map(lambda e, pp: e + (1 - EMA_BETAS[0]) * (pp - e), e1, p)
    e2 = jax.tree.map(lambda e, pp: e + (1 - EMA_BETAS[1]) * (pp - e), e2, p)
    return (p, m, v, e1, e2), gnorm


def scrub_clip_adam_ema_flat(state, g):
    """Same math on flat [N] buffers — one fused kernel for the whole pool."""
    p, m, v, e1, e2 = state
    g = jnp.nan_to_num(g, nan=0.0, posinf=0.0, neginf=0.0)
    gnorm = jnp.sqrt(jnp.sum(jnp.square(g)))
    g = g * jnp.minimum(1.0, 1.0 / (gnorm + 1e-12))
    m = BETAS[0] * m + (1 - BETAS[0]) * g
    v = BETAS[1] * v + (1 - BETAS[1]) * g * g
    p = p - LR * m / (jnp.sqrt(v) + EPS)
    e1 = e1 + (1 - EMA_BETAS[0]) * (p - e1)
    e2 = e2 + (1 - EMA_BETAS[1]) * (p - e2)
    return (p, m, v, e1, e2), gnorm


def flatten_tree(tree):
    return jnp.concatenate([l.reshape(-1) for l in jax.tree.leaves(tree)])


def unflatten_like(flat, tree):
    leaves, treedef = jax.tree.flatten(tree)
    out, off = [], 0
    for l in leaves:
        out.append(jax.lax.dynamic_slice_in_dim(flat, off, l.size).reshape(l.shape))
        off += l.size
    return jax.tree.unflatten(treedef, out)


def scrub_clip_adam_ema_hybrid(state, grads):
    """Grads/params as trees (the model's view), m/v/emas flat."""
    p_tree, m, v, e1, e2 = state
    g = flatten_tree(grads)
    p = flatten_tree(p_tree)
    (p, m, v, e1, e2), gnorm = scrub_clip_adam_ema_flat((p, m, v, e1, e2), g)
    return (unflatten_like(p, p_tree), m, v, e1, e2), gnorm


def chain_time(step, state, grads, iters, fetch):
    t0 = time.perf_counter()
    for _ in range(iters):
        state, gn = step(state, grads)
    fetch(state)
    return time.perf_counter() - t0, state


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ch", type=int, default=128)
    ap.add_argument("--which", default="tree,flat,hybrid")
    args = ap.parse_args()

    from vivid_tpu.nn.precond import PrecondConfig, precond_init
    cfg = PrecondConfig(img_resolution=64, num_sources=2,
                        model_channels=args.ch, extra_attn=1,
                        source_label_dim=20, target_label_dim=40)
    params = precond_init(jax.random.PRNGKey(0), cfg)
    n = sum(int(x.size) for x in jax.tree.leaves(params))
    n_leaves = len(jax.tree.leaves(params))
    print(f"ch={args.ch}: {n/1e6:.1f}M params, {n_leaves} leaves, "
          f"state+grads footprint {(n*4*6)/2**30:.2f} GiB", flush=True)

    key = jax.random.PRNGKey(1)
    grads_tree = jax.tree.map(
        lambda x: 1e-3 * jax.random.normal(key, x.shape, x.dtype), params)
    copy = lambda t: jax.tree.map(lambda x: jnp.array(x, copy=True), t)

    def measure(name, step_fn, make_state, grads, fetch):
        step = jax.jit(step_fn, donate_argnums=0)
        st = make_state()
        t0 = time.perf_counter()
        st, _ = step(st, grads)
        fetch(st)
        print(f"{name}: first call (incl. compile) "
              f"{time.perf_counter() - t0:.1f}s", flush=True)
        _, st = chain_time(step, st, grads, 2, fetch)
        t1, st = chain_time(step, st, grads, 5, fetch)
        t1b, st = chain_time(step, st, grads, 5, fetch)
        t2, st = chain_time(step, st, grads, 25, fetch)
        t2b, st = chain_time(step, st, grads, 25, fetch)
        dt = (min(t2, t2b) - min(t1, t1b)) / 20
        gbps = (n * 4 * 11) / dt / 1e9
        print(f"{name}: {dt*1e3:.2f} ms/iter ({gbps:.0f} GB/s effective "
              f"on the 11x-footprint floor)", flush=True)
        del st

    which = args.which.split(",")
    if "tree" in which:
        fetch = lambda st: np.asarray(jax.tree.leaves(st[0])[0].ravel()[0])
        make = lambda: (copy(params), jax.tree.map(jnp.zeros_like, params),
                        jax.tree.map(jnp.zeros_like, params), copy(params),
                        copy(params))
        measure("tree  ", scrub_clip_adam_ema_tree, make, grads_tree, fetch)
    if "flat" in which:
        p_flat = flatten_tree(params)
        g_flat = flatten_tree(grads_tree)
        fetch = lambda st: np.asarray(st[0][0])
        make = lambda: (jnp.array(p_flat, copy=True), jnp.zeros_like(p_flat),
                        jnp.zeros_like(p_flat), jnp.array(p_flat, copy=True),
                        jnp.array(p_flat, copy=True))
        measure("flat  ", scrub_clip_adam_ema_flat, make, g_flat, fetch)
    if "hybrid" in which:
        p_flat = flatten_tree(params)
        fetch = lambda st: np.asarray(jax.tree.leaves(st[0])[0].ravel()[0])
        make = lambda: (copy(params), jnp.zeros_like(p_flat),
                        jnp.zeros_like(p_flat), jnp.array(p_flat, copy=True),
                        jnp.array(p_flat, copy=True))
        measure("hybrid", scrub_clip_adam_ema_hybrid, make, grads_tree, fetch)


if __name__ == "__main__":
    main()
