"""The jitted training step: loss + grad + Adam + EMA in one XLA program.

Parity surface: the reference inner step (training_loop.py:506-590) —
per-pair sigma/noise, learned-variance loss with mean±3std clamp, loss scaled
by loss_scaling/batch, NaN->0 gradient scrub (`force_finite`), global grad
norm clip 1.0, Adam(0.9, 0.99) with the LR schedule applied every step, then
power-function EMA updates — all fused into a single compiled step.

TPU-native form of DDP: the batch is sharded over the mesh 'data' axis and
params are replicated; XLA inserts the gradient all-reduce (the NCCL bucket
machinery of the reference collapses into compiler-placed psums). Gradient
accumulation is a lax.scan over microbatches, syncing once at the end —
the semantic twin of ddp_sync(no_sync until last round).

Optimizer is hand-rolled Adam matching torch.optim.Adam semantics (bias
correction, eps outside the sqrt) so resumed runs step identically.
"""

from dataclasses import dataclass, field
from functools import partial
from typing import Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from vivid_tpu.diffusion.loss import clamp_loss
from vivid_tpu.diffusion.lr import learning_rate_schedule
from vivid_tpu.nn.mp import force_weight_normalize


@dataclass(frozen=True)
class TrainConfig:
    batch_size: int                       # global batch (pairs per step)
    loss_scaling: float = 1.0
    force_finite: bool = True
    clip_grad_norm: float = 1.0
    adam_betas: Tuple[float, float] = (0.9, 0.99)
    adam_eps: float = 1e-8
    ref_lr: float = 100e-4
    ref_batches: float = 70e3
    rampup_Mimg: float = 10.0
    ema_stds: Tuple[float, ...] = (0.050, 0.100)
    nimg_mult: int = 1                    # 6 in dual-source (training_loop.py:583-586)
    loss_clamp_3sigma: bool = True
    force_wn: bool = False                # forced weight normalization per step
    num_accum: int = 1                    # gradient accumulation rounds


class TrainState(NamedTuple):
    params: dict
    adam_m: dict
    adam_v: dict
    adam_step: jax.Array          # int32 scalar
    emas: tuple                   # one param tree per ema std
    cur_nimg: jax.Array           # int64-ish float64-safe counter (int32 ok < 2^31)


def init_train_state(params, cfg: TrainConfig) -> TrainState:
    # EMA trees must be deep copies: aliasing the param buffers breaks buffer
    # donation (same buffer donated twice) and would tie EMA to live params.
    copy = lambda t: jax.tree.map(lambda x: jnp.array(x, copy=True), t)
    return TrainState(
        params=params,
        adam_m=jax.tree.map(jnp.zeros_like, params),
        adam_v=jax.tree.map(jnp.zeros_like, params),
        adam_step=jnp.zeros((), jnp.int32),
        emas=tuple(copy(params) for _ in cfg.ema_stds),
        cur_nimg=jnp.zeros((), jnp.int64 if jax.config.read("jax_enable_x64") else jnp.int32),
    )


def global_norm(tree):
    return jnp.sqrt(sum(jnp.sum(jnp.square(x.astype(jnp.float32)))
                        for x in jax.tree.leaves(tree)))


def adam_update(params, grads, m, v, step, lr, betas, eps):
    b1, b2 = betas
    step = step + 1
    m = jax.tree.map(lambda mm, g: b1 * mm + (1 - b1) * g, m, grads)
    v = jax.tree.map(lambda vv, g: b2 * vv + (1 - b2) * g * g, v, grads)
    bc1 = 1 - b1 ** step.astype(jnp.float32)
    bc2 = 1 - b2 ** step.astype(jnp.float32)
    new_params = jax.tree.map(
        lambda p, mm, vv: p - lr * (mm / bc1) / (jnp.sqrt(vv / bc2) + eps),
        params, m, v)
    return new_params, m, v, step


def make_train_step(loss_fn: Callable, model_cfg, train_cfg: TrainConfig,
                    ema_exponents: Tuple[float, ...]):
    """loss_fn(params, model_cfg, rng, src, tgt, geometry, train) ->
    elementwise loss. Returns step(state, batch, rng) -> (state, stats);
    jit it (donating state) at the call site.

    ema_exponents: std_to_exp(std)+1 per tracked std, precomputed on host
    (np.roots is not traceable)."""

    def microbatch_loss(params, rng, batch):
        loss = loss_fn(params, model_cfg, rng, batch["src"], batch["tgt"],
                       batch["geometry"], train=True)
        if loss.ndim > 0 and train_cfg.loss_clamp_3sigma:
            loss = clamp_loss(loss)
        mean_stat = jnp.mean(loss)
        std_stat = jnp.std(loss)
        b = batch["tgt"].shape[0]
        scalar = jnp.sum(loss) * (train_cfg.loss_scaling / b)
        return scalar, (mean_stat, std_stat)

    grad_fn = jax.grad(microbatch_loss, has_aux=True)

    def step(state: TrainState, batch: Dict[str, jax.Array], rng: jax.Array):
        """batch arrays have a leading [num_accum, micro_batch, ...] layout
        when num_accum > 1, else [batch, ...]."""
        if train_cfg.num_accum > 1:
            def accum(carry, xs):
                acc_g, acc_aux = carry
                mb, k = xs
                g, aux = grad_fn(state.params, k, mb)
                acc_g = jax.tree.map(jnp.add, acc_g, g)
                return (acc_g, (acc_aux[0] + aux[0], acc_aux[1] + aux[1])), None
            keys = jax.random.split(rng, train_cfg.num_accum)
            zero_g = jax.tree.map(jnp.zeros_like, state.params)
            (grads, aux_sum), _ = jax.lax.scan(accum, (zero_g, (0.0, 0.0)),
                                               (batch, keys))
            grads = jax.tree.map(lambda g: g / train_cfg.num_accum, grads)
            loss_mean = aux_sum[0] / train_cfg.num_accum
            loss_std = aux_sum[1] / train_cfg.num_accum
        else:
            grads, (loss_mean, loss_std) = grad_fn(state.params, rng, batch)

        if train_cfg.force_finite:
            grads = jax.tree.map(lambda g: jnp.nan_to_num(g, nan=0.0, posinf=0.0,
                                                          neginf=0.0), grads)
        gnorm = global_norm(grads)
        if train_cfg.clip_grad_norm is not None:
            scale = jnp.minimum(1.0, train_cfg.clip_grad_norm / (gnorm + 1e-12))
            grads = jax.tree.map(lambda g: g * scale, grads)

        lr = learning_rate_schedule(state.cur_nimg, train_cfg.batch_size,
                                    ref_lr=train_cfg.ref_lr,
                                    ref_batches=train_cfg.ref_batches,
                                    rampup_Mimg=train_cfg.rampup_Mimg)
        params, m, v, adam_step = adam_update(
            state.params, grads, state.adam_m, state.adam_v, state.adam_step,
            lr, train_cfg.adam_betas, train_cfg.adam_eps)

        if train_cfg.force_wn:
            params = force_weight_normalize(params)

        cur_nimg = state.cur_nimg + train_cfg.batch_size * train_cfg.nimg_mult
        # Power-function EMA (phema.py Eq. 127), exponent static per std.
        t_next = jnp.maximum(cur_nimg.astype(jnp.float32),
                             float(train_cfg.batch_size))
        emas = tuple(
            jax.tree.map(
                lambda e, p, beta=(1.0 - train_cfg.batch_size / t_next) ** exp:
                e + (1.0 - beta) * (p - e),
                ema, params)
            for exp, ema in zip(ema_exponents, state.emas))

        new_state = TrainState(params=params, adam_m=m, adam_v=v,
                               adam_step=adam_step, emas=emas, cur_nimg=cur_nimg)
        stats = {"Loss/loss": loss_mean, "Loss/loss_std": loss_std,
                 "Loss/learning_rate": lr, "Grad/global_norm": gnorm}
        return new_state, stats

    return step


class _AutoLayoutStep:
    """AOT wrapper for AUTO-layout train steps. AUTO layouts are only
    resolvable through lower()/compile(), so the first call compiles on the
    live avals, converts the incoming state into the compiler-chosen layouts
    once, and caches the executable; donation then keeps the state in those
    layouts for every subsequent step. Exposes .lower() so the startup FLOPs
    report (analyze_flops) keeps working."""

    def __init__(self, jitted):
        self._jitted = jitted
        self._compiled = None

    def lower(self, *args):
        return self._jitted.lower(*map(self._avals, args))

    @staticmethod
    def _avals(tree):
        # AUTO layouts only lower against abstract avals (a concrete array
        # carries a concrete layout, which contradicts AUTO).
        return jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype,
                                           sharding=x.sharding), tree)

    def __call__(self, state, batch, rng):
        if self._compiled is None:
            comp = self._jitted.lower(self._avals(state), self._avals(batch),
                                      self._avals(rng)).compile()
            fmts = comp.input_formats
            state_fmts = fmts[0][0] if isinstance(fmts, tuple) \
                and len(fmts) == 2 else fmts[0]
            state = jax.device_put(state, state_fmts)
            self._compiled = comp
        return self._compiled(state, batch, rng)


def jit_train_step(step, mesh, state: TrainState, fsdp_axis: str = None,
                   accum: bool = False, fsdp_min_size: int = 2 ** 13,
                   auto_layout: bool = False):
    """Jit `step` with the train state's shardings pinned over `mesh` and
    place `state` accordingly. Returns (jitted_step, placed_state).

    fsdp_axis=None replicates params/optimizer/EMA state on every device (the
    reference's DDP memory model). fsdp_axis='data' shards every state leaf
    over that axis (ZeRO-3): XLA all-gathers weights at use, reduce-scatters
    gradients, and the Adam/EMA updates run on local shards — per-device
    state memory drops by the axis size. The batch stays sharded on 'data'
    either way; out_shardings keep the state sharded across steps."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from vivid_tpu.core.sharding import fsdp_shardings, shard_tree

    if fsdp_axis is not None:
        state_sh = fsdp_shardings(mesh, state, axis=fsdp_axis,
                                  min_size=fsdp_min_size)
    else:
        state_sh = jax.tree.map(lambda _: NamedSharding(mesh, P()), state)
    batch_sh = NamedSharding(mesh, P(None, "data") if accum else P("data"))
    rng_sh = NamedSharding(mesh, P())
    if auto_layout:
        # Compiler-chosen layouts for every state leaf: the r5 flagship
        # train trace showed ~60% of the 19.8 ms copy/layout pool is XLA
        # relayouting fp32 master weights into the MXU-tiled conv layout
        # every step (docs/PERF.md "copy/layout pool is fp32 weight relayout
        # traffic"). With AUTO the state LIVES in the preferred layout and
        # the per-step relayouts disappear from steady state.
        from jax.experimental.layout import Format, Layout
        fmt_sh = jax.tree.map(lambda sh: Format(Layout.AUTO, sh), state_sh)
        jitted = jax.jit(step, donate_argnums=0,
                         in_shardings=(fmt_sh, batch_sh, rng_sh),
                         out_shardings=(fmt_sh, None))
        return _AutoLayoutStep(jitted), shard_tree(state, state_sh)
    jitted = jax.jit(step, donate_argnums=0,
                     in_shardings=(state_sh, batch_sh, rng_sh),
                     out_shardings=(state_sh, None))
    return jitted, shard_tree(state, state_sh)
