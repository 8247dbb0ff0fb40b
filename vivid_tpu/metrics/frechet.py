"""Frechet distance and metric computation from accumulated statistics.

Parity surface: calculate_metrics.py:293-322 —
FID = |mu1 - mu2|^2 + tr(S1 + S2 - 2 sqrtm(S1 S2)).
"""

from typing import List

import numpy as np
import scipy.linalg


def frechet_distance(mu1, sigma1, mu2, sigma2) -> float:
    m = np.square(mu1 - mu2).sum()
    s = scipy.linalg.sqrtm(np.dot(sigma1, sigma2))
    return float(np.real(m + np.trace(sigma1 + sigma2 - s * 2)))


STAT_METRICS = ("fid", "fd_dinov2", "joint_fid", "joint_fd_dinov2",
                "stub_fid", "joint_stub_fid")


def calculate_metrics_from_stats_nvs(stats, ref,
                                     metrics: List[str] = ("fid", "fd_dinov2",
                                                           "joint_fid",
                                                           "joint_fd_dinov2",
                                                           "psnr"),
                                     verbose: bool = True) -> dict:
    if isinstance(ref, str):
        from vivid_tpu.metrics.stats import load_stats
        ref = load_stats(ref, verbose=verbose)
    results = {}
    for metric in metrics:
        if metric not in stats or (metric in STAT_METRICS and metric not in ref):
            if verbose:
                print(f"No statistics computed for {metric} -- skipping.")
            continue
        if verbose:
            print(f"Calculating {metric}...")
        if metric in STAT_METRICS:
            value = frechet_distance(stats[metric]["mu"], stats[metric]["sigma"],
                                     ref[metric]["mu"], ref[metric]["sigma"])
        else:
            value = float(np.asarray(stats[metric]["val"]).reshape(()))
        results[metric] = value
        if verbose:
            print(f"{metric} = {value:g}")
    return results
