"""In-training / programmatic metric evaluation.

Parity surface: calculate_metrics.py:325-338 (`get_metrics`) — generate N
images through the real sampler, accumulate detector statistics, compute
metrics on process 0.
"""

from typing import List, Optional

import tqdm

from vivid_tpu.core import dist
from vivid_tpu.generate import generate_images_nvs
from vivid_tpu.metrics.frechet import calculate_metrics_from_stats_nvs
from vivid_tpu.metrics.stats import calculate_stats_for_iterable_nvs


def get_metrics(net, encoder=None, num_images: int = 10_000,
                metrics: Optional[List[str]] = None,
                sr_model=None, depth_model=None, datakwargs=None,
                seed: int = 0, verbose: bool = False, max_batch_size: int = 25,
                **gen_kwargs):
    metrics = list(metrics or ["fid", "fd_dinov2", "joint_fid",
                               "joint_fd_dinov2", "psnr"])
    image_iter = generate_images_nvs(
        net=net, encoder=encoder, seeds=range(seed, seed + num_images),
        max_batch_size=max_batch_size, sr_model=sr_model,
        depth_model=depth_model, datakwargs=datakwargs, verbose=verbose,
        **gen_kwargs)
    stats_iter = calculate_stats_for_iterable_nvs(image_iter, metrics=metrics,
                                                  verbose=verbose)
    r = ref = None
    for r, ref in tqdm.tqdm(stats_iter, unit="batch",
                            disable=(dist.get_rank() != 0 or not verbose),
                            leave=False):
        pass
    results = None
    if dist.get_rank() == 0 and r is not None:
        results = calculate_metrics_from_stats_nvs(stats=r.stats, ref=ref.stats,
                                                   metrics=metrics, verbose=verbose)
    dist.barrier("metrics")
    return results
