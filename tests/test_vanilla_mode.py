"""Vanilla (single-source) mode end-to-end: train a step, snapshot, sample."""

import glob
import os

import numpy as np
import pytest

from vivid_tpu.data.scenes import make_synthetic_dataset
from vivid_tpu.train.loop import training_loop


def test_vanilla_mode_train_and_sample(tmp_path):
    data = make_synthetic_dataset(str(tmp_path / "scenes"), num_scenes=3,
                                  num_views=5, imsize=32)
    run_dir = str(tmp_path / "run")
    state = training_loop(
        run_dir=run_dir,
        dataset_kwargs={"path": data},
        network_kwargs=dict(img_resolution=32, model_channels=16,
                            channel_mult=(1, 2), num_blocks=1,
                            attn_resolutions=(16,), channels_per_head=8,
                            use_bf16=False),
        loss_kwargs={"P_mean": -0.8, "P_std": 1.6},
        lr_kwargs={"ref_lr": 1e-3, "ref_batches": 100, "rampup_Mimg": 0},
        batch_size=4, total_nimg=10 ** 8, status_nimg=None, samples_nimg=None,
        snapshot_nimg=4, checkpoint_nimg=None, vanilla_mode=True,
        max_steps=2, debug=True)
    # Vanilla accounting: +batch per step (not x6).
    assert int(state.cur_nimg) == 2 * 4
    snaps = sorted(glob.glob(os.path.join(run_dir, "network-snapshot-*-0.050.pkl")))
    assert snaps
    from vivid_tpu.generate import generate_images_nvs
    out = [b for b in generate_images_nvs(
        net=snaps[-1], seeds=range(0, 2), max_batch_size=2, vanilla_mode=True,
        datakwargs={"path": data}, num_steps=2, verbose=False)
        if b.images is not None]
    assert out[0].images.shape == (2, 32, 32, 3)
