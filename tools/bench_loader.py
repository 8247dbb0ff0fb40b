#!/usr/bin/env python
"""Host data-loader throughput benchmark.

Answers "can this host's loader sustain the train step?" (the reference
reports the analogous resource telemetry via psutil,
training_loop.py:343-359). Two paths:

  * scenes: the production streaming format — .npz scenes decoded +
    collated by BatchLoader/DualSourceCollate (what training consumes).
  * re10k: the file-based RealEstate10K layout — 360x640 PNG frames through
    the native C decoder (vivid_tpu/native/fast_image.c) vs the PIL
    fallback (VIVID_NO_NATIVE=1).

Prints rows/s and the margin against a given train-step demand
(default: flagship ch=128 b=32 at ~323 ms => ~99 rows/s, 3 images each).

Usage: python tools/bench_loader.py [--mode scenes|re10k] [--seconds 20]
       [--batch 32] [--demand-rows-per-s 99]
"""

import argparse
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def bench_scenes(batch, seconds, imsize):
    from vivid_tpu.data.collate import BatchLoader, DualSourceCollate
    from vivid_tpu.data.scenes import SceneDataset, make_synthetic_dataset
    tmp = tempfile.mkdtemp(prefix="bench_scenes_")
    try:
        # 256px views ~ the stored RealEstate10K-converted resolution class.
        make_synthetic_dataset(tmp, num_scenes=12, num_views=8, imsize=256)
        loader = BatchLoader(iter(SceneDataset(tmp)),
                             DualSourceCollate(imsize=imsize),
                             batch_size=batch, prefetch=2, num_threads=2)
        next(loader)  # warm the pipeline
        rows = 0
        t0 = time.time()
        while time.time() - t0 < seconds:
            b = next(loader)
            rows += b["tgt_image"].shape[0]
        dt = time.time() - t0
        loader.close()
        return rows / dt
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def bench_re10k(batch, seconds, imsize):
    from vivid_tpu.data.collate import BatchLoader, DualSourceCollate
    from vivid_tpu.data.re10k_scenes import RealEstate10KScenes
    import PIL.Image
    rng = np.random.RandomState(0)
    tmp = tempfile.mkdtemp(prefix="bench_re10k_")
    try:
        seq_dir = os.path.join(tmp, "RealEstate10K", "train")
        os.makedirs(seq_dir, exist_ok=True)
        for s in range(2):
            seq = f"seq{s:03d}"
            frame_dir = os.path.join(tmp, "train", seq)
            os.makedirs(frame_dir, exist_ok=True)
            lines = ["https://example.com/video"]
            for f in range(48):
                ts = str(1000 + f)
                pose = [1, 0, 0, 0.05 * f, 0, 1, 0, 0, 0, 0, 1, 0.02 * f]
                lines.append(" ".join([ts, "0.9", "1.6", "0.5", "0.5", "0", "0"]
                                      + [f"{v:.6f}" for v in pose]))
                img = rng.randint(0, 255, (360, 640, 3), np.uint8)
                PIL.Image.fromarray(img, "RGB").save(
                    os.path.join(frame_dir, ts + ".png"))
            with open(os.path.join(seq_dir, seq + ".txt"), "w") as fh:
                fh.write("\n".join(lines))
        ds = RealEstate10KScenes(tmp, split="train")
        loader = BatchLoader(iter(ds), DualSourceCollate(imsize=imsize),
                             batch_size=batch, prefetch=2, num_threads=2)
        next(loader)
        rows = 0
        t0 = time.time()
        while time.time() - t0 < seconds:
            b = next(loader)
            rows += b["tgt_image"].shape[0]
        dt = time.time() - t0
        loader.close()
        return rows / dt
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="scenes", choices=["scenes", "re10k"])
    ap.add_argument("--seconds", type=float, default=20.0)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--imsize", type=int, default=64)
    ap.add_argument("--demand-rows-per-s", type=float, default=99.0,
                    help="train-step consumption to compare against "
                         "(flagship ch=128 b=32 ~= 99 rows/s)")
    args = ap.parse_args()
    fn = bench_scenes if args.mode == "scenes" else bench_re10k
    rate = fn(args.batch, args.seconds, args.imsize)
    native = "native-C" if not os.environ.get("VIVID_NO_NATIVE") else "PIL"
    margin = rate / args.demand_rows_per_s
    print(f"loader[{args.mode}/{native}]: {rate:.1f} rows/s "
          f"({rate * 3:.0f} images/s) = {margin:.1f}x the "
          f"{args.demand_rows_per_s:.0f} rows/s flagship demand")


if __name__ == "__main__":
    main()
