#!/usr/bin/env python
"""Dump random scenes from a dataset to PNGs for eyeballing
(the reference's lookattrash.py surface).

Usage: python inspect_dataset.py --data=/path/to/scenes --outdir=/tmp/inspect
"""

import os

import click
import numpy as np
import PIL.Image


@click.command()
@click.option("--data", required=True, help="Scene dataset directory")
@click.option("--outdir", default="dataset_inspection", show_default=True)
@click.option("--num-scenes", default=30, show_default=True)
@click.option("--views-per-scene", default=3, show_default=True)
@click.option("--seed", default=0, show_default=True)
def main(data, outdir, num_scenes, views_per_scene, seed):
    from vivid_tpu.data.scenes import SceneDataset
    os.makedirs(outdir, exist_ok=True)
    ds = SceneDataset(data, seed=seed)
    rng = np.random.RandomState(seed)
    it = iter(ds)
    for i in range(min(num_scenes, len(ds))):
        scene = next(it)
        imgs = scene["image"]
        idx = rng.choice(imgs.shape[0], min(views_per_scene, imgs.shape[0]),
                         replace=False)
        strip = np.concatenate([imgs[j] for j in idx], axis=1)
        path = os.path.join(outdir, f"scene_{i:03d}.png")
        PIL.Image.fromarray(strip.astype(np.uint8), "RGB").save(path)
        print(f"{path}: views={imgs.shape[0]} size={imgs.shape[1]}x{imgs.shape[2]} "
              f"c2w_range=[{scene['c2w'][:, :3, 3].min():.3f},"
              f"{scene['c2w'][:, :3, 3].max():.3f}]")
    print(f"Wrote {min(num_scenes, len(ds))} scene strips to {outdir}")


if __name__ == "__main__":
    main()
