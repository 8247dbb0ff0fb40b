"""Power-function EMA and post-hoc EMA reconstruction (EDM2).

Parity surface: training/phema.py. The solver/profile math is host-side
numpy (it runs once per snapshot); the online EMA update is a pure pytree op
usable inside the jitted train step:

    beta(std, t, dt) = (1 - dt/t) ** (std_to_exp(std) + 1)      (Eq. 127)
    ema <- ema + (1 - beta) * (p - ema)

Tracked stds default to [0.050, 0.100] like the reference, and `get()` yields
(params, '-0.050'-style suffix) pairs for snapshot naming parity.
"""

import numpy as np
import jax
import jax.numpy as jnp


# -- profile conversions (Eq. 123 / 126, Algorithm 2) -------------------------

def exp_to_std(exp):
    exp = np.asarray(exp, np.float64)
    return np.sqrt((exp + 1) / (exp + 2) ** 2 / (exp + 3))


def std_to_exp(std):
    std = np.asarray(std, np.float64)
    tmp = std.flatten() ** -2
    exp = [np.roots([1, 7, 16 - t, 12 - t]).real.max() for t in tmp]
    return np.asarray(exp, np.float64).reshape(std.shape)


def power_function_response(ofs, std, length, axis=0):
    """Reconstruction response profiles (Eq. 121/108)."""
    ofs, std = np.broadcast_arrays(ofs, std)
    ofs = np.stack([np.float64(ofs)], axis=axis)
    exp = np.stack([std_to_exp(std)], axis=axis)
    s = [1] * exp.ndim
    s[axis] = -1
    t = np.arange(length).reshape(s)
    resp = np.where(t <= ofs, (t / ofs) ** exp, 0) / ofs * (exp + 1)
    return resp / np.sum(resp, axis=axis, keepdims=True)


def power_function_correlation(a_ofs, a_std, b_ofs, b_std):
    """Inner products between EMA profiles (Eq. 151, Algorithm 3)."""
    a_exp = std_to_exp(a_std)
    b_exp = std_to_exp(b_std)
    t_ratio = a_ofs / b_ofs
    t_exp = np.where(a_ofs < b_ofs, b_exp, -a_exp)
    t_max = np.maximum(a_ofs, b_ofs)
    num = (a_exp + 1) * (b_exp + 1) * t_ratio ** t_exp
    den = (a_exp + b_exp + 1) * t_max
    return num / den


def power_function_beta(std, t_next, t_delta):
    """Per-step EMA decay (Eq. 127). Traceable in t_next/t_delta; the exponent
    from `std` is a static host-side constant."""
    exponent = float(std_to_exp(np.float64(std)) + 1)
    return (1 - t_delta / t_next) ** exponent


def solve_posthoc_coefficients(in_ofs, in_std, out_ofs, out_std):
    """Least-squares combination of tracked snapshots reconstructing an
    arbitrary target EMA profile (Algorithm 3). Returns [in, out]."""
    in_ofs, in_std = np.broadcast_arrays(in_ofs, in_std)
    out_ofs, out_std = np.broadcast_arrays(out_ofs, out_std)
    rv = lambda x: np.float64(x).reshape(-1, 1)
    cv = lambda x: np.float64(x).reshape(1, -1)
    A = power_function_correlation(rv(in_ofs), rv(in_std), cv(in_ofs), cv(in_std))
    B = power_function_correlation(rv(in_ofs), rv(in_std), cv(out_ofs), cv(out_std))
    X = np.linalg.solve(A, B)
    return X / np.sum(X, axis=0)


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
