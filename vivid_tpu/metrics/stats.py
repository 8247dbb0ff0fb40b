"""Distributed feature-moment accumulation.

Parity surface: calculate_metrics.py:134-248 — for each metric, running
fp64 sums of features and feature outer products for the generated images AND
the reference (target) images, plus joint (gen ‖ src-features) variants, and
PSNR as a running mean; one cross-process reduction at the last batch.

The StatsIterable yields (r, ref) pairs; r.stats is populated on the final
batch (same contract the reference trainer and CLI consume).
"""

from typing import Iterable, List, Optional

import numpy as np
import jax

from vivid_tpu.core import dist
from vivid_tpu.core.easydict import EasyDict
from vivid_tpu.metrics.detectors import get_detector, metric_specs

BASE_METRICS = ("fid", "fd_dinov2", "stub_fid")


def _all_reduce_sum(x: np.ndarray) -> np.ndarray:
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        return np.asarray(multihost_utils.process_allgather(x)).sum(axis=0)
    return x


def psnr(a, b):
    """Per-image PSNR over uint8-range images [N,H,W,C]."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    mse = ((a - b) ** 2).mean(axis=(1, 2, 3))
    return 10 * np.log10(255.0 ** 2 / np.maximum(mse, 1e-12))


def calculate_stats_for_iterable_nvs(
    image_iter,
    metrics: List[str] = ("fid", "fd_dinov2", "joint_fid", "joint_fd_dinov2", "psnr"),
    verbose: bool = True,
    dest_path: Optional[str] = None,
):
    """image_iter yields EasyDicts with .images/.tgt/.src (NHWC uint8-range)
    and .num_batches. Returns an iterable yielding (r, ref) per batch."""
    metrics = list(metrics)
    num_batches = len(image_iter)
    for metric in metrics:
        if metric.startswith("joint_"):
            assert metric[len("joint_"):] in metrics, \
                f"{metric} requires {metric[len('joint_'):]}"
    detectors = {m: get_detector(m, verbose=verbose)
                 for m in metrics if "detector_class" in metric_specs[m]
                 and not m.startswith("joint_")}
    if verbose:
        dist.print0("Calculating feature statistics...")

    class StatsIterable:
        def __len__(self):
            return num_batches

        def __iter__(self):
            state = [EasyDict(metric=m, detector=d) for m, d in detectors.items()]
            ref_state = [EasyDict(metric=m, detector=d) for m, d in detectors.items()]
            for s in state + ref_state:
                dim = s.detector.feature_dim
                s.cum_mu = np.zeros(dim, np.float64)
                s.cum_sigma = np.zeros((dim, dim), np.float64)
                if "joint_" + s.metric in metrics:
                    s.j_cum_mu = np.zeros(dim * 2, np.float64)
                    s.j_cum_sigma = np.zeros((dim * 2, dim * 2), np.float64)
            cum_psnr = 0.0
            cum_images = 0
            cum_tgt = 0

            def update(s, sref, images, tgt, src):
                f = np.asarray(s.detector(images), np.float64)
                s.cum_mu += f.sum(0)
                s.cum_sigma += f.T @ f
                tf = np.asarray(s.detector(tgt), np.float64)
                sref.cum_mu += tf.sum(0)
                sref.cum_sigma += tf.T @ tf
                if "joint_" + s.metric in metrics:
                    sf = np.asarray(s.detector(src), np.float64)
                    jf = np.concatenate([f, sf], -1)
                    s.j_cum_mu += jf.sum(0)
                    s.j_cum_sigma += jf.T @ jf
                    jf = np.concatenate([tf, sf], -1)
                    sref.j_cum_mu += jf.sum(0)
                    sref.j_cum_sigma += jf.T @ jf

            for batch_idx, data in enumerate(image_iter):
                images = data.get("images") if hasattr(data, "get") else data.images
                tgt = data.get("tgt")
                src = data.get("src")
                if images is not None and tgt is not None:
                    for s, sref in zip(state, ref_state):
                        update(s, sref, images, tgt, src)
                    cum_images += np.asarray(images).shape[0]
                    cum_tgt += np.asarray(tgt).shape[0]
                    if "psnr" in metrics:
                        cum_psnr += psnr(images, tgt).sum()

                r = EasyDict(stats=None, images=images, batch_idx=batch_idx,
                             num_batches=num_batches)
                ref = EasyDict(stats=None, batch_idx=batch_idx,
                               num_batches=num_batches)
                if batch_idx == num_batches - 1:
                    n_img = int(_all_reduce_sum(np.asarray([cum_images]))[0])
                    n_tgt = int(_all_reduce_sum(np.asarray([cum_tgt]))[0])
                    r.num_images = n_img
                    ref.num_images = n_tgt
                    assert n_img >= 2, "need >= 2 images for covariance stats"
                    r.stats = dict(num_images=n_img)
                    ref.stats = dict(num_images=n_tgt)

                    def reduce_into(stats_dict, slist, n):
                        for s in slist:
                            mu = _all_reduce_sum(s.cum_mu) / n
                            sigma = (_all_reduce_sum(s.cum_sigma)
                                     - np.outer(mu, mu) * n) / (n - 1)
                            stats_dict[s.metric] = dict(mu=mu, sigma=sigma)
                            if "joint_" + s.metric in metrics:
                                jmu = _all_reduce_sum(s.j_cum_mu) / n
                                jsig = (_all_reduce_sum(s.j_cum_sigma)
                                        - np.outer(jmu, jmu) * n) / (n - 1)
                                stats_dict["joint_" + s.metric] = dict(mu=jmu, sigma=jsig)

                    reduce_into(r.stats, state, n_img)
                    reduce_into(ref.stats, ref_state, n_tgt)
                    if "psnr" in metrics:
                        total = _all_reduce_sum(np.asarray([cum_psnr]))[0]
                        r.stats["psnr"] = dict(val=total / n_img)
                    if dest_path is not None and dist.get_rank() == 0:
                        save_stats(r.stats, dest_path)
                yield r, ref

    return StatsIterable()


def save_stats(stats, path, verbose=False):
    import pickle
    with open(path, "wb") as f:
        pickle.dump(stats, f)
    if verbose:
        print(f"Saved statistics to {path}")


def load_stats(path, verbose=False):
    import pickle
    if verbose:
        print(f"Loading statistics from {path}")
    with open(path, "rb") as f:
        return pickle.load(f)
