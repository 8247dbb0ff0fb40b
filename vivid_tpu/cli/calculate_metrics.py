"""Metrics CLI: `gen` (generate + measure) and `calc` (measure saved images).

Parity surface: calculate_metrics.py:353-430. The `calc` subcommand is
*functional* here (the reference's was broken — five undefined names,
SURVEY.md §2.10.1): it scans src_/tgt_/sample_*.png triplets written by the
generate CLI and computes the same statistics.
"""

import os
import re
from glob import glob

import click
import numpy as np
import PIL.Image
import tqdm

from vivid_tpu.core import dist, util
from vivid_tpu.core.easydict import EasyDict
from vivid_tpu.metrics.frechet import calculate_metrics_from_stats_nvs
from vivid_tpu.metrics.stats import (calculate_stats_for_iterable_nvs,
                                     load_stats, save_stats)
from vivid_tpu.metrics.detectors import metric_specs


def parse_metric_list(s):
    metrics = s if isinstance(s, list) else s.split(",")
    for metric in metrics:
        if metric not in metric_specs:
            raise click.ClickException(f'Invalid metric "{metric}"')
    return metrics


class ImageFolderIterable:
    """Reload src_/tgt_/sample_{seed}.png triplets for offline metric calc
    (working replacement for the reference's broken ImageFolderDataset,
    datautils.py:185-196)."""

    def __init__(self, path, max_size=None, random_seed=0, max_batch_size=64):
        paths = sorted(
            glob(os.path.join(path, "**", "sample_*.png"), recursive=True),
            key=lambda p: int(re.search(r"\d+", os.path.basename(p)).group()))
        if max_size is not None and len(paths) > max_size:
            rng = np.random.RandomState(random_seed)
            paths = sorted(rng.choice(paths, max_size, replace=False),
                           key=lambda p: int(re.search(r"\d+", os.path.basename(p)).group()))
        if len(paths) < 2:
            raise click.ClickException(
                f"Found {len(paths)} sample images under {path}, need >= 2")
        # Shard across processes.
        self.paths = paths[dist.get_rank()::dist.get_world_size()]
        self.max_batch_size = max_batch_size

    def __len__(self):
        return (len(self.paths) + self.max_batch_size - 1) // self.max_batch_size

    def __iter__(self):
        def load(p):
            from vivid_tpu.native.fast_image import load_rgb
            return load_rgb(p)
        for i in range(len(self)):
            chunk = self.paths[i * self.max_batch_size:(i + 1) * self.max_batch_size]
            yield EasyDict(
                images=np.stack([load(p) for p in chunk]),
                tgt=np.stack([load(p.replace("sample_", "tgt_")) for p in chunk]),
                src=np.stack([load(p.replace("sample_", "src_")) for p in chunk]),
            )


@click.group()
def cmdline():
    """Calculate evaluation metrics (FID, FD-DINOv2, joint variants, PSNR).

    Examples:

    \b
    # Calculate metrics directly for a given model without saving images
    python calculate_metrics.py gen --net=snapshot.pkl --data=scenes/ --num=10000

    \b
    # Calculate metrics for saved image triplets
    python calculate_metrics.py calc --images=out --ref=ref-stats.pkl
    """
    util.enable_persistent_compilation_cache()


@cmdline.command()
@click.option("--images", "image_path", help="Path to the images", metavar="PATH", type=str, required=True)
@click.option("--ref", "ref_path", help="Dataset reference statistics", metavar="PKL", type=str, default=None)
@click.option("--metrics", help="List of metrics to compute", metavar="LIST", type=parse_metric_list, default="fid,fd_dinov2", show_default=True)
@click.option("--num", "num_images", help="Number of images to use", metavar="INT", type=click.IntRange(min=2), default=50000, show_default=True)
@click.option("--seed", help="Random seed for selecting the images", metavar="INT", type=int, default=0, show_default=True)
@click.option("--batch", "max_batch_size", help="Maximum batch size", metavar="INT", type=click.IntRange(min=1), default=64, show_default=True)
@click.option("--dest", "dest_path", help="Where to save the computed statistics", metavar="PKL", type=str, default=None)
def calc(image_path, ref_path, metrics, num_images, seed, max_batch_size, dest_path):
    """Calculate metrics for a given set of saved images."""
    dist.init()
    image_iter = ImageFolderIterable(image_path, max_size=num_images,
                                     random_seed=seed,
                                     max_batch_size=max_batch_size)
    stats_iter = calculate_stats_for_iterable_nvs(image_iter, metrics=metrics,
                                                  dest_path=dest_path)
    r = ref = None
    for r, ref in tqdm.tqdm(stats_iter, unit="batch",
                            disable=(dist.get_rank() != 0)):
        pass
    if dist.get_rank() == 0:
        ext_ref = load_stats(ref_path) if ref_path else ref.stats
        calculate_metrics_from_stats_nvs(stats=r.stats, ref=ext_ref, metrics=metrics)
    dist.barrier("calc")


@cmdline.command()
@click.option("--net", help="Network snapshot filename", metavar="PATH", type=str, required=True)
@click.option("--data", "data_path", help="Path to scene dataset", metavar="DIR", type=str, required=True)
@click.option("--gnet", help="Guidance network snapshot", metavar="PATH", type=str, default=None, show_default=True)
@click.option("--metrics", help="List of metrics to compute", metavar="LIST", type=parse_metric_list, default="fid,joint_fid,psnr", show_default=True)
@click.option("--num", "num_images", help="Number of images to generate", metavar="INT", type=click.IntRange(min=2), default=10000, show_default=True)
@click.option("--seed", help="Random seed for the generation", metavar="INT", type=int, default=0, show_default=True)
@click.option("--batch", "max_batch_size", help="Maximum batch size", metavar="INT", type=click.IntRange(min=1), default=32, show_default=True)
@click.option("--sr-model", help="Path to SR model snapshot", metavar="STR", type=str, default=None, show_default=True)
@click.option("--range-selection", help="Range selection", metavar="MID,LONG", type=str, default=None, show_default=True)
@click.option("--guidance", help="Guidance factor", metavar="FLOAT", type=float, default=1.0, show_default=True)
@click.option("--depth-model", help="Depth model for evaluation", metavar="STR", type=str, default=None, show_default=True)
@click.option("--outdir", help="Where to save the output images", metavar="DIR", type=str, default=None, show_default=True)
@click.option("--vanilla-mode", help="Single-source conditioning", is_flag=True)
def gen(net, data_path, metrics, num_images, seed, **opts):
    """Calculate metrics for a given NVS model using default sampler settings."""
    from vivid_tpu.generate import generate_images_nvs
    dist.init()
    image_iter = generate_images_nvs(net=net, seeds=range(seed, seed + num_images),
                                     datakwargs={"path": data_path}, **opts)
    stats_iter = calculate_stats_for_iterable_nvs(image_iter, metrics=metrics)
    r = ref = None
    for r, ref in tqdm.tqdm(stats_iter, unit="batch",
                            disable=(dist.get_rank() != 0), leave=False):
        pass
    results = None
    if dist.get_rank() == 0:
        results = calculate_metrics_from_stats_nvs(stats=r.stats, ref=ref.stats,
                                                   metrics=metrics)
    dist.barrier("gen-metrics")
    return results


if __name__ == "__main__":
    cmdline()
