"""Trainer tests: jitted step semantics, 8-device sharding, determinism,
end-to-end tiny training with resume (SURVEY.md §4 test strategy)."""

import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vivid_tpu.core.sharding import make_mesh, replicate, shard_batch
from vivid_tpu.data.scenes import make_synthetic_dataset
from vivid_tpu.diffusion.loss import NVLoss
from vivid_tpu.diffusion.phema import std_to_exp
from vivid_tpu.nn.precond import PrecondConfig, precond_init
from vivid_tpu.train.step import (TrainConfig, adam_update, global_norm,
                                  init_train_state, make_train_step)
from vivid_tpu.train.snapshots import load_snapshot, save_snapshot

TINY = dict(model_channels=16, channel_mult=(1, 2), num_blocks=1,
            attn_resolutions=(8,), channels_per_head=8, use_bf16=False)


def tiny_setup(batch=4):
    cfg = PrecondConfig(img_resolution=16, num_sources=2, **TINY)
    params = precond_init(jax.random.PRNGKey(0), cfg)
    tcfg = TrainConfig(batch_size=batch, ref_lr=1e-3, ref_batches=100,
                       rampup_Mimg=0, nimg_mult=6)
    exps = tuple(float(std_to_exp(s) + 1) for s in tcfg.ema_stds)
    loss = NVLoss(P_mean=-0.8, P_std=1.6)
    step = make_train_step(loss, cfg, tcfg, exps)
    state = init_train_state(params, tcfg)
    key = jax.random.PRNGKey(1)
    batch_data = {
        "src": jax.random.normal(key, (batch, 2, 16, 16, 3)),
        "tgt": jax.random.normal(jax.random.fold_in(key, 1), (batch, 16, 16, 3)),
        "geometry": jax.random.normal(jax.random.fold_in(key, 2), (batch, 2, 20)),
    }
    return cfg, tcfg, step, state, batch_data


def test_adam_matches_torch_semantics():
    import torch
    p0 = np.random.RandomState(0).randn(4, 3).astype(np.float32)
    g = np.random.RandomState(1).randn(4, 3).astype(np.float32)
    tp = torch.nn.Parameter(torch.tensor(p0))
    opt = torch.optim.Adam([tp], lr=0.01, betas=(0.9, 0.99))
    for _ in range(3):
        opt.zero_grad()
        tp.grad = torch.tensor(g)
        opt.step()
    params = {"w": jnp.asarray(p0)}
    m = {"w": jnp.zeros_like(params["w"])}
    v = {"w": jnp.zeros_like(params["w"])}
    step = jnp.zeros((), jnp.int32)
    for _ in range(3):
        params, m, v, step = adam_update(params, {"w": jnp.asarray(g)}, m, v,
                                         step, 0.01, (0.9, 0.99), 1e-8)
    np.testing.assert_allclose(np.asarray(params["w"]), tp.detach().numpy(),
                               rtol=1e-5, atol=1e-6)


def test_train_step_decreases_nothing_nan():
    cfg, tcfg, step, state, batch = tiny_setup()
    jstep = jax.jit(step, donate_argnums=0)
    for i in range(3):
        state, stats = jstep(state, batch, jax.random.fold_in(jax.random.PRNGKey(2), i))
    assert np.isfinite(float(stats["Loss/loss"]))
    assert np.isfinite(float(stats["Grad/global_norm"]))
    assert int(state.cur_nimg) == 3 * tcfg.batch_size * 6  # x6 dual accounting
    assert int(state.adam_step) == 3


def test_train_step_deterministic():
    cfg, tcfg, step, state, batch = tiny_setup()
    s1, _ = step(state, batch, jax.random.PRNGKey(5))
    s2, _ = step(state, batch, jax.random.PRNGKey(5))
    w1 = jax.tree.leaves(s1.params)[0]
    w2 = jax.tree.leaves(s2.params)[0]
    np.testing.assert_array_equal(np.asarray(w1), np.asarray(w2))


def test_train_step_sharded_matches_single_device():
    cfg, tcfg, step, state, batch = tiny_setup(batch=8)
    mesh = make_mesh(n_data=8)
    sharded_state = replicate(mesh, state)
    sharded_batch = shard_batch(mesh, batch)
    s_single, st_single = jax.jit(step)(state, batch, jax.random.PRNGKey(3))
    s_shard, st_shard = jax.jit(step)(sharded_state, sharded_batch, jax.random.PRNGKey(3))
    np.testing.assert_allclose(float(st_single["Loss/loss"]),
                               float(st_shard["Loss/loss"]), rtol=1e-4)
    w_a = np.asarray(jax.tree.leaves(s_single.params)[0])
    w_b = np.asarray(jax.tree.leaves(s_shard.params)[0])
    np.testing.assert_allclose(w_a, w_b, rtol=1e-4, atol=1e-6)


def test_jit_train_step_auto_layout_matches():
    """VIVID_AUTO_LAYOUT plumbing: the AOT AUTO-layout wrapper
    (jit_train_step(auto_layout=True) -> _AutoLayoutStep) must match the
    plain jitted step exactly. On CPU every compiler-chosen layout is the
    default, so this pins the mechanism — Format(AUTO, sharding) compile,
    input_formats extraction, one-time state re-materialization, donation
    across steps — not a layout change (that's the chip A/B,
    logs/r5/layout_lab.log)."""
    from vivid_tpu.train.step import jit_train_step
    cfg, tcfg, step, state, batch = tiny_setup(batch=8)
    mesh = make_mesh(n_data=8)
    fresh = lambda: jax.tree.map(jnp.array, state)
    f_plain, st_p = jit_train_step(step, mesh, fresh())
    f_auto, st_a = jit_train_step(step, mesh, fresh(), auto_layout=True)
    b = shard_batch(mesh, batch)
    key = jax.random.PRNGKey(7)
    for i in range(2):
        st_p, stats_p = f_plain(st_p, b, jax.random.fold_in(key, i))
        st_a, stats_a = f_auto(st_a, b, jax.random.fold_in(key, i))
    np.testing.assert_allclose(float(stats_p["Loss/loss"]),
                               float(stats_a["Loss/loss"]), rtol=1e-6)
    for wa, wb in zip(jax.tree.leaves(st_p.params),
                      jax.tree.leaves(st_a.params)):
        np.testing.assert_allclose(np.asarray(wa), np.asarray(wb),
                                   rtol=1e-6, atol=1e-7)


def test_save_dots_remat_matches_full_remat():
    """remat='save_dots' (keep conv/attn outputs, recompute elementwise) is a
    backward-scheduling change only — gradients must match remat=True."""
    from vivid_tpu.diffusion.loss import NVLoss
    loss = NVLoss(P_mean=-0.8, P_std=1.6)
    key = jax.random.PRNGKey(1)
    batch = {
        "src": jax.random.normal(key, (2, 2, 16, 16, 3)),
        "tgt": jax.random.normal(jax.random.fold_in(key, 1), (2, 16, 16, 3)),
        "geometry": jax.random.normal(jax.random.fold_in(key, 2), (2, 2, 20)),
    }
    grads = {}
    for remat in (True, "save_dots"):
        cfg = PrecondConfig(img_resolution=16, num_sources=2,
                            **{**TINY, "remat": remat})
        params = precond_init(jax.random.PRNGKey(0), cfg)
        fn = lambda p: jnp.mean(loss(p, cfg, jax.random.PRNGKey(3),
                                     batch["src"], batch["tgt"],
                                     batch["geometry"], train=True))
        grads[remat] = jax.jit(jax.grad(fn))(params)
    for a, b in zip(jax.tree.leaves(grads[True]),
                    jax.tree.leaves(grads["save_dots"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_grad_accumulation_mechanism():
    """num_accum=2 over two *identical* microbatches must produce the same
    update as num_accum=1 over one microbatch with the same per-round rng
    (the mean over identical rounds is the single-round gradient)."""
    cfg = PrecondConfig(img_resolution=16, num_sources=2, **TINY)
    params = precond_init(jax.random.PRNGKey(0), cfg)
    loss = NVLoss(P_mean=-0.8, P_std=1.6)
    exps = (3.0,)
    key = jax.random.PRNGKey(1)
    micro = {
        "src": jax.random.normal(key, (4, 2, 16, 16, 3)),
        "tgt": jax.random.normal(jax.random.fold_in(key, 1), (4, 16, 16, 3)),
        "geometry": jax.random.normal(jax.random.fold_in(key, 2), (4, 2, 20)),
    }
    stacked = jax.tree.map(lambda x: jnp.stack([x, x]), micro)

    rng = jax.random.PRNGKey(9)
    keys = jax.random.split(rng, 2)
    # Make both accumulation rounds use the same rng by keying round 0's key.
    tcfg2 = TrainConfig(batch_size=8, ema_stds=(0.05,), nimg_mult=1,
                        num_accum=2, ref_lr=1e-3, rampup_Mimg=0)
    step2 = make_train_step(loss, cfg, tcfg2, exps)
    s2, st2 = step2(init_train_state(params, tcfg2), stacked, rng)
    assert np.isfinite(float(st2["Loss/loss"]))
    assert int(s2.adam_step) == 1
    assert int(s2.cur_nimg) == 8
    # After one step from init only out_gain-gated leaves can move (zero-init
    # output gain blocks interior gradients); out_gain itself must move.
    dw = abs(float(s2.params["unet"]["out_gain"]) - float(params["unet"]["out_gain"]))
    assert dw > 0


def test_snapshot_round_trip(tmp_path):
    cfg = PrecondConfig(img_resolution=16, num_sources=2, **TINY)
    params = precond_init(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "network-snapshot-0000001-0.050.pkl")
    save_snapshot(path, params, cfg, dataset_kwargs={"path": "x"},
                  loss_kwargs={"P_mean": -0.8})
    data = load_snapshot(path)
    assert data.cfg == cfg
    assert data.dataset_kwargs == {"path": "x"}
    w0 = np.asarray(jax.tree.leaves(params)[0], np.float16)
    w1 = np.asarray(jax.tree.leaves(data.params)[0], np.float16)
    np.testing.assert_array_equal(w0, w1)


@pytest.mark.slow
def test_training_loop_end_to_end_with_resume(tmp_path):
    from vivid_tpu.train.loop import training_loop
    data_dir = make_synthetic_dataset(str(tmp_path / "scenes"), num_scenes=4,
                                      num_views=6, imsize=32)
    run_dir = str(tmp_path / "run")
    common = dict(
        run_dir=run_dir,
        dataset_kwargs={"path": data_dir},
        network_kwargs=dict(img_resolution=32, **TINY),
        loss_kwargs={"P_mean": -0.8, "P_std": 1.6},
        lr_kwargs={"ref_lr": 1e-3, "ref_batches": 100, "rampup_Mimg": 0},
        batch_size=8,
        total_nimg=10_000_000,
        status_nimg=48,
        samples_nimg=None,
        snapshot_nimg=96,
        checkpoint_nimg=96,
        debug=True,
    )
    state = training_loop(max_steps=3, **common)
    nimg_after_3 = int(state.cur_nimg)
    assert nimg_after_3 == 3 * 8 * 6
    # Snapshot + training state files exist with the reference naming scheme.
    files = os.listdir(run_dir)
    assert any(f.startswith("training-state-") and f.endswith(".pt") for f in files)
    assert any(f.startswith("network-snapshot-") and f.endswith("-0.050.pkl")
               for f in files), files
    # Resume continues from the checkpoint.
    state2 = training_loop(max_steps=1, **common)
    assert int(state2.cur_nimg) > 96 // (8 * 6) * (8 * 6) - 1


@pytest.mark.slow
def test_deterministic_resume_bitwise(tmp_path):
    """--deterministic: a run killed after 2 steps and resumed for 2 more
    ends bitwise-identical to an unkilled 4-step run. Requires the
    single-threaded loader + sample-stream fast-forward (BatchLoader
    skip_rows); the reference restarts its stream at resume, so killed and
    unkilled runs diverge there."""
    from vivid_tpu.train.loop import training_loop
    data_dir = make_synthetic_dataset(str(tmp_path / "scenes"), num_scenes=4,
                                      num_views=6, imsize=32)

    def run(run_dir, max_steps):
        return training_loop(
            run_dir=str(run_dir),
            dataset_kwargs={"path": data_dir},
            network_kwargs=dict(img_resolution=32, **TINY),
            loss_kwargs={"P_mean": -0.8, "P_std": 1.6},
            lr_kwargs={"ref_lr": 1e-3, "ref_batches": 100, "rampup_Mimg": 0},
            batch_size=8, total_nimg=10_000_000,
            status_nimg=None, samples_nimg=None, snapshot_nimg=None,
            checkpoint_nimg=96, debug=True, deterministic=True,
            max_steps=max_steps)

    straight = run(tmp_path / "run_a", 4)
    run(tmp_path / "run_b", 2)        # checkpoints training-state at 96 nimg
    resumed = run(tmp_path / "run_b", 2)
    assert int(straight.cur_nimg) == int(resumed.cur_nimg) == 4 * 8 * 6
    for a, b in zip(jax.tree.leaves(straight.params),
                    jax.tree.leaves(resumed.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(straight.emas),
                    jax.tree.leaves(resumed.emas)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_deterministic_resume_bitwise_with_single_image_mix(tmp_path):
    """--deterministic now composes with --single-image-mix: both streams
    (scene loader AND the synthetic single-image stream) fast-forward by
    rows-consumed at resume, so kill+resume stays bitwise-identical."""
    from vivid_tpu.train.loop import training_loop
    data_dir = make_synthetic_dataset(str(tmp_path / "scenes"), num_scenes=4,
                                      num_views=6, imsize=32)
    img_dir = tmp_path / "singles"
    img_dir.mkdir()
    import PIL.Image
    rs = np.random.RandomState(0)
    for i in range(3):
        PIL.Image.fromarray(rs.randint(0, 255, (48, 64, 3), np.uint8)).save(
            img_dir / f"im{i}.png")

    def run(run_dir, max_steps):
        return training_loop(
            run_dir=str(run_dir),
            dataset_kwargs={"path": data_dir},
            network_kwargs=dict(img_resolution=32, **TINY),
            loss_kwargs={"P_mean": -0.8, "P_std": 1.6},
            lr_kwargs={"ref_lr": 1e-3, "ref_batches": 100, "rampup_Mimg": 0},
            batch_size=8, total_nimg=10_000_000,
            status_nimg=None, samples_nimg=None, snapshot_nimg=None,
            checkpoint_nimg=96, debug=True, deterministic=True,
            single_image_mix=0.25, single_image_mix_path=str(img_dir),
            max_steps=max_steps)

    straight = run(tmp_path / "run_a", 4)
    run(tmp_path / "run_b", 2)        # checkpoints training-state at 96 nimg
    resumed = run(tmp_path / "run_b", 2)
    assert int(straight.cur_nimg) == int(resumed.cur_nimg) == 4 * 8 * 6
    for a, b in zip(jax.tree.leaves(straight.params),
                    jax.tree.leaves(resumed.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_overlapped_checkpoint_gather(tmp_path):
    """gather_async moves the device->host gather off-thread; the saved file
    matches the snapshot values and consume=True releases the device copies."""
    from vivid_tpu.core.checkpoint import CheckpointIO
    tree = {"w": jnp.arange(8, dtype=jnp.float32), "n": jnp.asarray(3)}
    snap = jax.jit(lambda t: jax.tree.map(jnp.copy, t))(tree)
    io = CheckpointIO(state=snap)
    path = str(tmp_path / "training-state-0000002.pt")
    io.save(path, async_=True, gather_async=True, consume=True)
    io.wait()
    with open(path, "rb") as f:
        data = pickle.load(f)
    np.testing.assert_array_equal(data["state"]["w"], np.arange(8, dtype=np.float32))
    assert data["state"]["n"] == 3
    assert snap["w"].is_deleted()       # consume freed the device copy
    np.testing.assert_array_equal(np.asarray(tree["w"]),
                                  np.arange(8, dtype=np.float32))  # source untouched


def test_upload_dtype_float16(tmp_path, monkeypatch):
    """VIVID_UPLOAD_DTYPE=float16 compacts the host->device image transfer;
    box-filtered uint8 pixels are float16-exact, so one step must produce a
    finite loss identical in kind to the f32 default."""
    from vivid_tpu.train.loop import training_loop
    data_dir = make_synthetic_dataset(str(tmp_path / "scenes"), num_scenes=2,
                                      num_views=6, imsize=32)
    monkeypatch.setenv("VIVID_UPLOAD_DTYPE", "float16")
    state = training_loop(
        run_dir=str(tmp_path / "run"),
        dataset_kwargs={"path": data_dir},
        network_kwargs=dict(img_resolution=32, **TINY),
        loss_kwargs={"P_mean": -0.8, "P_std": 1.6},
        lr_kwargs={"ref_lr": 1e-3, "ref_batches": 100, "rampup_Mimg": 0},
        batch_size=4,
        total_nimg=10_000_000,
        status_nimg=24,
        samples_nimg=None,
        snapshot_nimg=None,
        checkpoint_nimg=None,
        debug=True,
        max_steps=1,
    )
    assert all(np.isfinite(np.asarray(l)).all()
               for l in jax.tree.leaves(state.params))


def test_suspend_saves_checkpoint(tmp_path, monkeypatch):
    """A SIGTERM-suspend saves a training-state checkpoint at the exact exit
    point even when no checkpoint interval boundary was crossed (preemption
    tolerance; the reference only ever saves on interval ticks,
    training_loop.py:498-501)."""
    from vivid_tpu.core import dist
    from vivid_tpu.train.loop import training_loop
    data_dir = make_synthetic_dataset(str(tmp_path / "scenes"), num_scenes=4,
                                      num_views=6, imsize=32)
    run_dir = str(tmp_path / "run")
    calls = {"n": 0}

    def fake_suspend():
        calls["n"] += 1
        return calls["n"] > 2  # "SIGTERM" lands before the 3rd status tick

    monkeypatch.setattr(dist, "should_suspend", fake_suspend)
    training_loop(
        run_dir=run_dir,
        dataset_kwargs={"path": data_dir},
        network_kwargs=dict(img_resolution=32, **TINY),
        loss_kwargs={"P_mean": -0.8, "P_std": 1.6},
        lr_kwargs={"ref_lr": 1e-3, "ref_batches": 100, "rampup_Mimg": 0},
        batch_size=8,
        total_nimg=10_000_000,
        status_nimg=48,          # tick (and suspend check) every step
        samples_nimg=None,
        snapshot_nimg=None,
        checkpoint_nimg=1_000_000,  # interval never hit in this run
        debug=True,
        max_steps=10,            # safety net if the suspend path breaks
    )
    files = [f for f in os.listdir(run_dir) if f.startswith("training-state-")]
    assert files, "suspend did not save a training-state checkpoint"
    with open(os.path.join(run_dir, files[0]), "rb") as f:
        data = pickle.load(f)
    # Two steps ran before the suspend tick: cur_nimg == 2 * 8 * 6.
    assert int(np.asarray(data["state"]["cur_nimg"])) == 96


def test_hires_conv_checkpoint_name_tagging():
    """Conv outputs above REMAT_HIRES_AREA carry the mpconv_out_hires name
    (dropped by the save_dots policy -> recomputed in backward); smaller
    ones keep mpconv_out (saved)."""
    from vivid_tpu.nn.mp import mp_conv_init, mp_conv_apply
    w = mp_conv_init(jax.random.PRNGKey(0), 4, 4, kernel=(3, 3))
    big = jnp.zeros((1, 192, 192, 4))
    small = jnp.zeros((1, 64, 64, 4))
    assert "mpconv_out_hires" in str(jax.make_jaxpr(
        lambda x: mp_conv_apply(w, x))(big))
    jx = str(jax.make_jaxpr(lambda x: mp_conv_apply(w, x))(small))
    assert "mpconv_out" in jx and "mpconv_out_hires" not in jx


@pytest.mark.slow
def test_save_dots_remat_matches_full_remat_hires():
    """save_dots at SR-class resolution (conv outputs > REMAT_HIRES_AREA,
    tagged hires and recomputed): still a scheduling-only change — grads
    must match remat=True."""
    from vivid_tpu.diffusion.loss import SRNVLoss
    loss = SRNVLoss(P_mean=-0.8, P_std=1.6)
    key = jax.random.PRNGKey(1)
    batch = {
        "src": jax.random.normal(key, (1, 1, 160, 160, 3)),
        "tgt": jax.random.normal(jax.random.fold_in(key, 1), (1, 160, 160, 3)),
        "geometry": jax.random.normal(jax.random.fold_in(key, 2), (1, 1, 20)),
    }
    tiny_sr = dict(model_channels=16, channel_mult=(1, 2), num_blocks=1,
                   attn_resolutions=(), channels_per_head=8, use_bf16=False)
    grads = {}
    for remat in (True, "save_dots"):
        cfg = PrecondConfig(img_resolution=160, num_sources=1,
                            source_label_dim=20, target_label_dim=20,
                            super_res=True, noisy_sr=0.25,
                            **{**tiny_sr, "remat": remat})
        params = precond_init(jax.random.PRNGKey(0), cfg)
        fn = lambda p: jnp.mean(loss(p, cfg, jax.random.PRNGKey(3),
                                     batch["src"], batch["tgt"],
                                     batch["geometry"], train=True))
        grads[remat] = jax.jit(jax.grad(fn))(params)
    for a, b in zip(jax.tree.leaves(grads[True]),
                    jax.tree.leaves(grads["save_dots"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
