#!/usr/bin/env python
"""Executable quickstart: synthetic scenes -> short training -> sampling ->
metrics, end to end on whatever device JAX finds.

    python examples/quickstart.py --workdir /tmp/vivid_quickstart

Scaled down (tiny model, a handful of steps) so it finishes in minutes on a
single chip or CPU; swap the dataset path for a real scene directory (or a
RealEstate10K root) and drop the size overrides for real runs.
"""

import argparse
import glob
import os
import sys

# Allow running straight from a checkout: python examples/quickstart.py
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/vivid_quickstart")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--channels", type=int, default=32)
    ap.add_argument("--resolution", type=int, default=32)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp_cache"))

    from vivid_tpu.data.scenes import make_synthetic_dataset
    from vivid_tpu.generate import generate_images_nvs
    from vivid_tpu.metrics.api import get_metrics
    from vivid_tpu.train.loop import training_loop

    os.makedirs(args.workdir, exist_ok=True)
    data = make_synthetic_dataset(os.path.join(args.workdir, "scenes"),
                                  num_scenes=8, num_views=8,
                                  imsize=args.resolution)
    run_dir = os.path.join(args.workdir, "run")

    print("=== training ===")
    nimg_per_step = 8 * 6
    training_loop(
        run_dir=run_dir,
        dataset_kwargs={"path": data},
        test_dataset_path=data,
        network_kwargs=dict(img_resolution=args.resolution,
                            model_channels=args.channels,
                            channel_mult=(1, 2), num_blocks=1,
                            attn_resolutions=(args.resolution // 2,),
                            channels_per_head=8),
        loss_kwargs={"P_mean": -0.8, "P_std": 1.6},
        lr_kwargs={"ref_lr": 0.005, "ref_batches": 1000, "rampup_Mimg": 0.001},
        batch_size=8,
        total_nimg=10 ** 9,
        status_nimg=nimg_per_step * 5,
        samples_nimg=None,
        snapshot_nimg=nimg_per_step * args.steps,
        checkpoint_nimg=None,
        max_steps=args.steps,
        debug=True,
    )
    snaps = sorted(glob.glob(os.path.join(run_dir, "network-snapshot-*-0.050.pkl")))
    print("snapshot:", snaps[-1])

    print("=== sampling ===")
    outdir = os.path.join(args.workdir, "samples")
    for _ in generate_images_nvs(net=snaps[-1], outdir=outdir,
                                 seeds=range(0, 8), max_batch_size=8,
                                 datakwargs={"path": data}, num_steps=8):
        pass
    print("samples:", sorted(os.listdir(outdir))[:6], "...")

    print("=== metrics (stub detector) ===")
    results = get_metrics(net=snaps[-1], num_images=8, max_batch_size=8,
                          metrics=["stub_fid", "psnr"],
                          datakwargs={"path": data}, num_steps=8)
    print("metrics:", results)


if __name__ == "__main__":
    main()
