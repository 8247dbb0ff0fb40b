"""Trainer extras: depth-conditioned training, SR-cascade sample grids,
in-training metric hook — tiny end-to-end runs on the CPU mesh."""

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vivid_tpu.data.scenes import make_synthetic_dataset
from vivid_tpu.nn.precond import PrecondConfig, precond_init
from vivid_tpu.train.loop import training_loop
from vivid_tpu.train.snapshots import save_snapshot

TINY_NET = dict(img_resolution=32, model_channels=16, channel_mult=(1, 2),
                num_blocks=1, attn_resolutions=(16,), channels_per_head=8,
                use_bf16=False)
FAST = dict(loss_kwargs={"P_mean": -0.8, "P_std": 1.6},
            lr_kwargs={"ref_lr": 1e-3, "ref_batches": 100, "rampup_Mimg": 0},
            batch_size=4, total_nimg=10 ** 8, status_nimg=None,
            snapshot_nimg=None, checkpoint_nimg=None, debug=True)


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("loopx")
    return make_synthetic_dataset(str(root / "scenes"), num_scenes=3,
                                  num_views=5, imsize=32)


def test_depth_model_conditioning(data_dir, tmp_path):
    fake_depth = lambda x: jnp.ones(x.shape[:3], jnp.float32)
    state = training_loop(
        run_dir=str(tmp_path / "run"),
        dataset_kwargs={"path": data_dir},
        network_kwargs=dict(depth_input=True, **TINY_NET),
        depth_model=fake_depth, samples_nimg=None, max_steps=1, **FAST)
    assert int(state.cur_nimg) == 4 * 6


def test_fsdp_training_loop(data_dir, tmp_path):
    """--fsdp end-to-end: 2 steps + a snapshot save (exercises the sharded
    state placement, the pinned out_shardings, and the host_state gather)."""
    state = training_loop(
        run_dir=str(tmp_path / "run"),
        dataset_kwargs={"path": data_dir},
        network_kwargs=dict(TINY_NET),
        fsdp=True, samples_nimg=None, max_steps=2,
        **{**FAST, "snapshot_nimg": 24})
    assert int(state.cur_nimg) == 2 * 4 * 6
    snaps = glob.glob(os.path.join(str(tmp_path / "run"), "network-snapshot-*.pkl"))
    assert snaps, "FSDP run wrote no snapshots"
    # Some state leaf must actually be sharded on the 8-device mesh.
    assert any(not x.sharding.is_fully_replicated
               for x in jax.tree.leaves(state.params))


def test_metrics_tick_recorded(data_dir, tmp_path):
    """Metric-tick results must land in durable artifacts: the run-dir
    metrics.jsonl and (via training_stats) a Metrics/ column in stats.jsonl,
    not just the stdout log (training_loop.py:481-483)."""
    import json
    run_dir = str(tmp_path / "run")
    calls = []

    def fake_metrics(ema_params, cfg):
        calls.append(1)
        return {"stub_fid": 12.5, "psnr": 30.0 + len(calls)}

    training_loop(
        run_dir=run_dir,
        dataset_kwargs={"path": data_dir},
        network_kwargs=dict(TINY_NET),
        samples_nimg=None, metrics_nimg=24, metrics_fn=fake_metrics,
        max_steps=3, **{**FAST, "status_nimg": 24, "debug": False})
    assert calls, "metrics_fn never fired"
    rows = [json.loads(l) for l in open(os.path.join(run_dir, "metrics.jsonl"))]
    assert rows and rows[0]["stub_fid"] == 12.5 and "nimg" in rows[0]
    stats_rows = [json.loads(l) for l in open(os.path.join(run_dir, "stats.jsonl"))]
    assert any("Metrics/psnr" in r for r in stats_rows), \
        "Metrics/ keys missing from stats.jsonl"


def test_sr_cascade_sample_grid(data_dir, tmp_path):
    sr_cfg = PrecondConfig(num_sources=2, super_res=True, noisy_sr=0.25,
                           **{**TINY_NET, "img_resolution": 32})
    sr_snap = str(tmp_path / "sr.pkl")
    save_snapshot(sr_snap, precond_init(jax.random.PRNGKey(0), sr_cfg), sr_cfg)
    base_net = dict(TINY_NET, img_resolution=16, attn_resolutions=(8,))
    run_dir = str(tmp_path / "run")
    state = training_loop(
        run_dir=run_dir,
        dataset_kwargs={"path": data_dir},
        test_dataset_path=data_dir,
        network_kwargs=base_net,
        sr_model=sr_snap,
        eval_samples=2,
        samples_nimg=24,       # fires after step 1 (24 nimg/step boundary)
        max_steps=2, **FAST)
    grids = glob.glob(os.path.join(run_dir, "results", "generated-samples-*.png"))
    assert grids, "sample grid with SR cascade was not written"
    import PIL.Image
    img = PIL.Image.open(grids[0])
    # Cascade output resolution (32), grid of 3 rows x eval_samples cols.
    assert img.size[1] == 3 * 32
