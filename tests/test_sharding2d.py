"""2-D mesh parallelism: FSDP (ZeRO-3) state sharding and tensor/sequence
activation sharding on the virtual 8-device CPU mesh.

Beyond-reference coverage: the reference implements only DDP
(/root/reference/training/training_loop.py:254, SURVEY.md §2.9); these tests
pin the framework's scaling headroom — sharded optimizer state and
model-axis activation sharding — to the replicated numerics.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vivid_tpu.core.sharding import (act_sharding, fsdp_shardings, fsdp_spec,
                                     make_mesh, replicate, shard_batch,
                                     shard_tree, unshard_tree)
from vivid_tpu.diffusion.loss import NVLoss
from vivid_tpu.diffusion.phema import std_to_exp
from vivid_tpu.nn.precond import PrecondConfig, precond_apply, precond_init
from vivid_tpu.train.step import (TrainConfig, init_train_state,
                                  jit_train_step, make_train_step)

TINY = dict(model_channels=16, channel_mult=(1, 2), num_blocks=1,
            attn_resolutions=(8,), channels_per_head=8, use_bf16=False)


def _tiny_model(batch=4, imsize=16):
    cfg = PrecondConfig(img_resolution=imsize, num_sources=2, **TINY)
    params = precond_init(jax.random.PRNGKey(0), cfg)
    key = jax.random.PRNGKey(1)
    inputs = dict(
        src=jax.random.normal(key, (batch, 2, imsize, imsize, 3)),
        dst=jax.random.normal(jax.random.fold_in(key, 1),
                              (batch, imsize, imsize, 3)),
        sigma=jnp.exp(jax.random.normal(jax.random.fold_in(key, 2), (batch,))),
        geometry=jax.random.normal(jax.random.fold_in(key, 3), (batch, 2, 20)),
    )
    return cfg, params, inputs


def _fwd(cfg):
    return jax.jit(lambda p, s, d, sg, g: precond_apply(p, cfg, s, d, sg, g))


def test_fsdp_spec_picks_divisible_axis():
    assert fsdp_spec((3, 3, 16, 32), "data", 8, min_size=0) == \
        jax.sharding.PartitionSpec(None, None, None, "data")
    assert fsdp_spec((), "data", 8, min_size=0) == jax.sharding.PartitionSpec()
    # Non-divisible dims stay replicated.
    assert fsdp_spec((3, 3), "data", 8, min_size=0) == jax.sharding.PartitionSpec()
    # Small leaves stay replicated under the size floor.
    assert fsdp_spec((16,), "data", 8) == jax.sharding.PartitionSpec()


def test_tp_forward_matches_replicated():
    cfg, params, inp = _tiny_model(batch=4)
    base = np.asarray(_fwd(cfg)(params, inp["src"], inp["dst"], inp["sigma"],
                                inp["geometry"]))
    mesh = make_mesh(n_data=2, n_model=4)
    with act_sharding(mesh, tp="model"):
        f = _fwd(cfg)  # fresh jit: constraints bake in at trace time
        out = f(replicate(mesh, params),
                *shard_batch(mesh, [inp["src"], inp["dst"], inp["sigma"],
                                    inp["geometry"]]))
        np.testing.assert_allclose(np.asarray(out), base, atol=2e-5, rtol=1e-5)


def test_sp_forward_matches_replicated():
    cfg, params, inp = _tiny_model(batch=4)
    base = np.asarray(_fwd(cfg)(params, inp["src"], inp["dst"], inp["sigma"],
                                inp["geometry"]))
    mesh = make_mesh(n_data=2, n_model=4)
    with act_sharding(mesh, sp="model"):
        f = _fwd(cfg)
        out = f(replicate(mesh, params),
                *shard_batch(mesh, [inp["src"], inp["dst"], inp["sigma"],
                                    inp["geometry"]]))
        np.testing.assert_allclose(np.asarray(out), base, atol=2e-5, rtol=1e-5)


def _train_setup(batch):
    cfg, params, _ = _tiny_model(batch)
    tcfg = TrainConfig(batch_size=batch, ref_lr=1e-3, ref_batches=100,
                       rampup_Mimg=0, nimg_mult=6)
    exps = tuple(float(std_to_exp(s) + 1) for s in tcfg.ema_stds)
    step = make_train_step(NVLoss(P_mean=-0.8, P_std=1.6), cfg, tcfg, exps)
    key = jax.random.PRNGKey(7)
    batch_data = {
        "src": jax.random.normal(key, (batch, 2, 16, 16, 3)),
        "tgt": jax.random.normal(jax.random.fold_in(key, 1), (batch, 16, 16, 3)),
        "geometry": jax.random.normal(jax.random.fold_in(key, 2), (batch, 2, 20)),
    }
    return cfg, tcfg, params, step, batch_data


def test_fsdp_matches_replicated_training():
    batch = 8
    _, tcfg, params, step, batch_data = _train_setup(batch)
    rngs = [jax.random.PRNGKey(11), jax.random.PRNGKey(12)]
    mesh = make_mesh(n_data=8)

    def run(fsdp_axis):
        # Fresh param buffers per run: the jitted step donates the state, and
        # device placement may alias rather than copy.
        p = jax.tree.map(lambda x: jnp.array(x, copy=True), params)
        st = init_train_state(p, tcfg)
        jitted, st = jit_train_step(step, mesh, st, fsdp_axis=fsdp_axis,
                                    fsdp_min_size=0)
        data = shard_batch(mesh, batch_data)
        losses = []
        for r in rngs:
            st, stats = jitted(st, data, r)
            losses.append(float(stats["Loss/loss"]))
        return st, losses

    st_rep, loss_rep = run(None)
    st_fsdp, loss_fsdp = run("data")

    # The sharded run must actually shard something.
    sharded = [x.sharding for x in jax.tree.leaves(st_fsdp.params)
               if not x.sharding.is_fully_replicated]
    assert sharded, "FSDP run left every param leaf replicated"

    np.testing.assert_allclose(loss_fsdp, loss_rep, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(st_rep.params),
                    jax.tree.leaves(st_fsdp.params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=1e-5, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(st_rep.emas[0]),
                    jax.tree.leaves(st_fsdp.emas[0])):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=1e-5, rtol=1e-5)

    # unshard_tree round-trips the sharded state to host-readable leaves.
    gathered = unshard_tree(mesh, st_fsdp.params)
    for x in jax.tree.leaves(gathered):
        assert x.sharding.is_fully_replicated


def test_fsdp_plus_tp_combined_step():
    batch = 8
    _, tcfg, params, step, batch_data = _train_setup(batch)
    rng = jax.random.PRNGKey(11)

    copy = lambda t: jax.tree.map(lambda x: jnp.array(x, copy=True), t)
    st = init_train_state(copy(params), tcfg)
    base_step = jax.jit(step, donate_argnums=0)
    _, base_stats = base_step(st, batch_data, rng)
    base_loss = float(base_stats["Loss/loss"])

    mesh = make_mesh(n_data=2, n_model=4)
    with act_sharding(mesh, tp="model"):
        st2 = init_train_state(copy(params), tcfg)
        jitted, st2 = jit_train_step(step, mesh, st2, fsdp_axis="data",
                                     fsdp_min_size=0)
        st2, stats = jitted(st2, shard_batch(mesh, batch_data), rng)
        loss = float(stats["Loss/loss"])
    assert np.isfinite(loss)
    np.testing.assert_allclose(loss, base_loss, rtol=1e-5)
