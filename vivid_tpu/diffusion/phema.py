"""Power-function EMA and post-hoc EMA reconstruction (EDM2).

Parity surface: training/phema.py. The solver/profile math is host-side
numpy (it runs once per snapshot); the online EMA update is a pure pytree op
usable inside the jitted train step:

    beta(std, t, dt) = (1 - dt/t) ** (std_to_exp(std) + 1)      (Eq. 127)
    ema <- ema + (1 - beta) * (p - ema)

Tracked stds default to [0.050, 0.100] like the reference, and `get()` yields
(params, '-0.050'-style suffix) pairs for snapshot naming parity.
"""

import os
import re

import numpy as np
import jax
import jax.numpy as jnp


# -- EMA profile algebra -------------------------------------------------------
# Re-derived from the power-function EMA definition (EDM2, Karras et al.
# 2024). An EMA with exponent gamma realized at training time T weights the
# parameter trajectory theta(t) by the normalized profile
#
#     p(t) = (gamma + 1) * t**gamma / T**(gamma + 1),     0 <= t <= T     (*)
#
# (the unique power profile integrating to 1). Every function below is an
# integral of (*); the derivations are inline so the code can be checked
# against the math rather than against another implementation.

def exp_to_std(exp):
    """Relative time-width of profile (*): with raw moments
    E[t^k]/T^k = (g+1)/(g+1+k), the variance collapses to
    var/T^2 = (g+1)/(g+3) - ((g+1)/(g+2))^2 = (g+1)/((g+2)^2 (g+3))
    because (g+2)^2 - (g+1)(g+3) = 1. EDM2 parameterizes EMA width by this
    time-std/T ("sigma_rel")."""
    g = np.asarray(exp, np.float64)
    m1 = (g + 1) / (g + 2)
    m2 = (g + 1) / (g + 3)
    return np.sqrt(m2 - m1 * m1)


def std_to_exp(std):
    """Invert exp_to_std: sigma^-2 = (g+2)^2 (g+3) / (g+1) rearranges, via
    (g+2)^2 (g+3) = g^3 + 7 g^2 + 16 g + 12, to the monic cubic
        g^3 + 7 g^2 + (16 - sigma^-2) g + (12 - sigma^-2) = 0.
    The physical branch is the largest real root (g -> inf as sigma -> 0;
    the other two roots sit left of g = -1 where (*) is not normalizable)."""
    std = np.asarray(std, np.float64)
    out = np.empty(std.shape, np.float64)
    flat = out.reshape(-1)
    for i, sigma in enumerate(std.reshape(-1)):
        c = 1.0 / (sigma * sigma)
        flat[i] = np.roots([1.0, 7.0, 16.0 - c, 12.0 - c]).real.max()
    return out


def power_function_response(ofs, std, length, axis=0):
    """Profile (*) sampled on the integer grid t = 0..length-1 for an EMA
    realized at time `ofs` with width `std`, renormalized over the grid
    (the continuous normalization doesn't survive discretization)."""
    ofs, std = np.broadcast_arrays(np.asarray(ofs, np.float64),
                                   np.asarray(std, np.float64))
    t_end = np.expand_dims(ofs, axis)
    g = np.expand_dims(std_to_exp(std), axis)
    shape = [1] * g.ndim
    shape[axis] = -1
    t = np.arange(length, dtype=np.float64).reshape(shape)
    resp = np.where(t <= t_end, (t / t_end) ** g, 0.0) * (g + 1) / t_end
    return resp / np.sum(resp, axis=axis, keepdims=True)


def power_function_correlation(a_ofs, a_std, b_ofs, b_std):
    """Inner product <p_a, p_b> = int_0^min(Ta,Tb) p_a(t) p_b(t) dt between
    two profiles (*). Substituting and integrating t^(ga+gb) gives, with
    Tm = min(Ta, Tb):
        (ga+1)(gb+1)/(ga+gb+1) * Tm^(ga+gb+1) / (Ta^(ga+1) Tb^(gb+1))
    written below with the <= 1 ratios (Tm/Ta), (Tm/Tb) so nimg-scale
    offsets raised to large exponents can never overflow. Symmetric in
    (a, b) by construction."""
    ga = std_to_exp(a_std)
    gb = std_to_exp(b_std)
    ta = np.asarray(a_ofs, np.float64)
    tb = np.asarray(b_ofs, np.float64)
    tm = np.minimum(ta, tb)
    amp = (ga + 1) * (gb + 1) / (ga + gb + 1)
    return amp * (tm / ta) ** (ga + 1) * (tm / tb) ** (gb + 1) / tm


def power_function_beta(std, t_next, t_delta):
    """Per-step decay realizing profile (*) online: requiring the update
    ema <- beta * ema + (1-beta) * theta to reproduce the profile's ratio
    between consecutive steps gives beta = (t/t_next)^(g+1)
    = (1 - t_delta/t_next)^(g+1). Traceable in t_next/t_delta; the exponent
    from `std` is a static host-side constant."""
    exponent = float(std_to_exp(np.float64(std)) + 1)
    return (1 - t_delta / t_next) ** exponent


def solve_posthoc_coefficients(in_ofs, in_std, out_ofs, out_std):
    """Mix tracked snapshots to reproduce arbitrary target EMA profiles:
    minimize || sum_i x_i p_i - p_target ||_2 in profile space. The normal
    equations need only pairwise profile inner products — Gram matrix G of
    the tracked profiles and cross moments b against each target — so
    x = G^-1 b, then renormalized to sum exactly to 1 per target (constant
    parameter modes must pass through unchanged; the continuous solution
    sums to ~1 already, this pins it against discretization error).
    Returns [num_in, num_out]."""
    in_ofs, in_std = np.broadcast_arrays(in_ofs, in_std)
    out_ofs, out_std = np.broadcast_arrays(out_ofs, out_std)
    col = lambda x: np.asarray(x, np.float64).reshape(-1, 1)
    row = lambda x: np.asarray(x, np.float64).reshape(1, -1)
    gram = power_function_correlation(col(in_ofs), col(in_std),
                                      row(in_ofs), row(in_std))
    cross = power_function_correlation(col(in_ofs), col(in_std),
                                       row(out_ofs), row(out_std))
    coef = np.linalg.solve(gram, cross)
    return coef / np.sum(coef, axis=0)


# -- post-hoc reconstruction ---------------------------------------------------

_SNAPSHOT_RE = re.compile(r"network-snapshot-(\d+)-(\d+\.\d+)\.pkl$")


def list_phema_snapshots(run_dir):
    """Scan a training run directory for the per-std EMA snapshot series the
    trainer writes (`network-snapshot-{nimg//1000:07d}-{std:.3f}.pkl`,
    train/loop.py) -> sorted [(nimg, std, path)]."""
    out = []
    for name in os.listdir(run_dir):
        m = _SNAPSHOT_RE.search(name)
        if m:
            out.append((int(m.group(1)) * 1000, float(m.group(2)),
                        os.path.join(run_dir, name)))
    return sorted(out)


def reconstruct_phema(inputs, out_std, out_nimg=None, out_dir=None,
                      verbose=True):
    """Post-hoc EMA: synthesize a model at an ARBITRARY EMA std from the two
    (or more) tracked-std snapshot series, via the least-squares profile
    combination of `solve_posthoc_coefficients` (EDM2 Algorithm 3 — the
    reason the trainer tracks two stds; training/phema.py:80-89 ships the
    solver but no applier).

    inputs   : a run directory (scanned with list_phema_snapshots), a list of
               snapshot paths, or a list of (nimg, std, param_tree) triples.
    out_std  : target EMA std (float or list of floats).
    out_nimg : reconstruction point in images; defaults to the latest
               snapshot's nimg (only snapshots with nimg <= out_nimg
               contribute — later ones are not part of the profile).
    out_dir  : if set, each reconstruction is saved there as
               `phema-{nimg//1000:07d}-{std:.3f}.pkl` (requires path inputs,
               whose snapshots carry the model config).

    Returns [EasyDict(params, std, nimg, path)] aligned with out_std.
    Accumulation is float64 on host: X mixes large +/- coefficients, so
    fp32 accumulation loses several digits.
    """
    from vivid_tpu.core.easydict import EasyDict

    if isinstance(inputs, str):
        inputs = list_phema_snapshots(inputs)
        if not inputs:
            raise ValueError("no network-snapshot-*-*.pkl series found")
    entries = []
    for item in inputs:
        if isinstance(item, str):
            m = _SNAPSHOT_RE.search(os.path.basename(item))
            if m is None:
                raise ValueError(f"cannot parse (nimg, std) from {item!r}")
            entries.append((int(m.group(1)) * 1000, float(m.group(2)), item))
        else:
            entries.append(tuple(item))
    entries.sort(key=lambda e: (e[0], e[1]))

    out_stds = [float(s) for s in np.atleast_1d(out_std)]
    if out_nimg is None:
        out_nimg = max(e[0] for e in entries)
    entries = [e for e in entries if 0 < e[0] <= out_nimg]
    if not entries:
        raise ValueError(f"no snapshots at nimg <= {out_nimg}")

    in_ofs = np.asarray([e[0] for e in entries], np.float64)
    in_std = np.asarray([e[1] for e in entries], np.float64)
    coef = solve_posthoc_coefficients(in_ofs, in_std,
                                      np.full(len(out_stds), float(out_nimg)),
                                      np.asarray(out_stds))   # [in, out]

    acc = [None] * len(out_stds)  # fp64 numpy trees
    model_cfg = None
    for i, (nimg, std, src) in enumerate(entries):
        if isinstance(src, str):
            from vivid_tpu.train.snapshots import load_snapshot
            snap = load_snapshot(src)
            tree, model_cfg = snap.params, snap.cfg
            if verbose:
                print(f"  {os.path.basename(src)}: "
                      + " ".join(f"{c:+.4f}" for c in coef[i]))
        else:
            tree = src
        tree64 = jax.tree.map(
            lambda x: np.asarray(jax.device_get(x), np.float64), tree)
        for j in range(len(out_stds)):
            c = float(coef[i, j])
            if acc[j] is None:
                acc[j] = jax.tree.map(lambda x: c * x, tree64)
            else:
                acc[j] = jax.tree.map(lambda a, x: a + c * x, acc[j], tree64)

    results = []
    for j, std in enumerate(out_stds):
        params = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), acc[j])
        path = None
        if out_dir is not None:
            if model_cfg is None:
                raise ValueError("out_dir requires snapshot-path inputs "
                                 "(in-memory trees carry no model config)")
            from vivid_tpu.train.snapshots import save_snapshot
            os.makedirs(out_dir, exist_ok=True)
            path = os.path.join(
                out_dir, f"phema-{int(out_nimg) // 1000:07d}-{std:.3f}.pkl")
            save_snapshot(path, params, model_cfg)
            if verbose:
                print(f"saved {path}")
        results.append(EasyDict(params=params, std=std, nimg=int(out_nimg),
                                path=path))
    return results


# -- online trackers ----------------------------------------------------------

def ema_update(emas, params, cur_nimg, batch_size, stds):
    """Pure pytree update usable inside jit. emas: list of param trees aligned
    with `stds`; cur_nimg/batch_size may be traced scalars."""
    new = []
    for std, ema in zip(stds, emas):
        exponent = float(std_to_exp(np.float64(std)) + 1)
        beta = (1.0 - batch_size / jnp.maximum(cur_nimg, batch_size)) ** exponent
        new.append(jax.tree.map(lambda e, p: e + (1.0 - beta) * (p - e), ema, params))
    return new


class PowerFunctionEMA:
    """Stateful convenience wrapper (the trainer holds the tree itself and
    calls ema_update inside its jitted step; this wrapper serves checkpoints,
    snapshots, and the registry surface)."""

    def __init__(self, params, stds=(0.050, 0.100)):
        self.stds = list(stds)
        self.emas = [jax.tree.map(lambda x: jnp.array(x, copy=True), params) for _ in self.stds]

    def reset(self, params):
        self.emas = [jax.tree.map(lambda x: jnp.array(x, copy=True), params) for _ in self.stds]

    def update(self, params, cur_nimg, batch_size):
        self.emas = ema_update(self.emas, params, float(cur_nimg),
                               float(batch_size), self.stds)

    def get(self):
        return [(ema, f"-{std:.3f}") for std, ema in zip(self.stds, self.emas)]

    def state_dict(self):
        return dict(stds=self.stds, emas=self.emas)

    def load_state_dict(self, state):
        self.stds = list(state["stds"])
        self.emas = list(state["emas"])


class TraditionalEMA:
    """Half-life EMA with rampup (training/phema.py:133-165)."""

    def __init__(self, params, halflife_Mimg=float("inf"), rampup_ratio=0.09):
        self.halflife_Mimg = halflife_Mimg
        self.rampup_ratio = rampup_ratio
        self.ema = jax.tree.map(lambda x: jnp.array(x, copy=True), params)

    def reset(self, params):
        self.ema = jax.tree.map(lambda x: jnp.array(x, copy=True), params)

    def update(self, params, cur_nimg, batch_size):
        halflife = self.halflife_Mimg
        if self.rampup_ratio is not None:
            halflife = min(halflife, cur_nimg / 1e6 * self.rampup_ratio)
        beta = 0.5 ** (batch_size / max(halflife * 1e6, 1e-8))
        self.ema = jax.tree.map(lambda e, p: e + (1.0 - beta) * (p - e),
                                self.ema, params)

    def get(self):
        return [(self.ema, "")]

    def state_dict(self):
        return dict(ema=self.ema, halflife_Mimg=self.halflife_Mimg,
                    rampup_ratio=self.rampup_ratio)

    def load_state_dict(self, state):
        self.ema = state["ema"]
        self.halflife_Mimg = state.get("halflife_Mimg", self.halflife_Mimg)
        self.rampup_ratio = state.get("rampup_ratio", self.rampup_ratio)
