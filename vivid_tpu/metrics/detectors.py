"""Feature detectors for FID / FD-DINOv2.

Parity surface: calculate_metrics.py:31-126. The reference fetches an
InceptionV3 torch pickle from NVIDIA's CDN and DINOv2 via torch.hub — both
network downloads. Here detectors resolve from a local weights directory
($VIVID_DETECTOR_DIR or ~/.cache/vivid_tpu) and degrade with a clear error
when absent; `StubDetector` provides a deterministic, dependency-free
detector so the full metric pipeline (moment accumulation, Frechet, sharded
reduction) stays testable without external weights.

Detector contract (unchanged): __call__(images NHWC uint8, 3ch) ->
[N, feature_dim] float32.
"""

import os
from typing import Dict

import numpy as np

from vivid_tpu.core import dist
from vivid_tpu.core.easydict import EasyDict


class Detector:
    def __init__(self, feature_dim: int):
        self.feature_dim = feature_dim

    def __call__(self, x):  # NHWC uint8 -> [N, C] float32
        raise NotImplementedError


class StubDetector(Detector):
    """Deterministic detector: fixed random projection of 16x16 box-pooled
    pixels. Useful statistical properties for pipeline tests (identical image
    sets -> identical moments; disjoint sets -> nonzero Frechet distance)."""

    def __init__(self, feature_dim: int = 64, seed: int = 0):
        super().__init__(feature_dim)
        rng = np.random.RandomState(seed)
        self.proj = rng.randn(16 * 16 * 3, feature_dim).astype(np.float32)

    def __call__(self, x):
        x = np.asarray(x, np.float32) / 255.0
        n, h, w, c = x.shape
        fh, fw = max(h // 16, 1), max(w // 16, 1)
        x = x[:, : fh * 16, : fw * 16]
        x = x.reshape(n, 16, fh, 16, fw, c).mean(axis=(2, 4))
        return x.reshape(n, -1) @ self.proj


def _weights_dir():
    return os.environ.get("VIVID_DETECTOR_DIR",
                          os.path.expanduser("~/.cache/vivid_tpu"))


class InceptionV3Detector(Detector):
    """FID detector (2048-d). Loads the NVIDIA inception-2015-12-05 torch
    pickle from the local weights dir (the reference downloads it from
    api.ngc.nvidia.com — calculate_metrics.py:45)."""

    def __init__(self):
        super().__init__(feature_dim=2048)
        path = os.path.join(_weights_dir(), "inception-2015-12-05.pkl")
        if not os.path.exists(path):
            raise FileNotFoundError(
                f"InceptionV3 detector weights not found at {path}. Download "
                "inception-2015-12-05.pkl (NVIDIA stylegan3 metrics) into "
                "$VIVID_DETECTOR_DIR to compute reference-comparable FID.")
        import pickle
        import torch  # CPU-only usage
        with open(path, "rb") as f:
            self.model = pickle.load(f)
        self.model.eval()
        self._torch = torch

    def __call__(self, x):
        torch = self._torch
        with torch.no_grad():
            t = torch.as_tensor(np.asarray(x, np.uint8)).permute(0, 3, 1, 2)
            return self.model(t, return_features=True).numpy()


class JaxInceptionDetector(Detector):
    """Device-side FID detector: the TF-slim inception-2015-12-05 graph
    re-implemented in JAX (metrics/inception_jax.py), weights imported from
    the same NVIDIA pickle the torch sidecar uses. Runs jitted on the
    accelerator — the torch-CPU sidecar dominates 10k-image evals on 1-core
    hosts."""

    def __init__(self):
        super().__init__(feature_dim=2048)
        from vivid_tpu.metrics.inception_jax import (init_params,
                                                     inception_features,
                                                     params_from_torch_module)
        if os.environ.get("VIVID_ALLOW_RANDOM_DETECTOR"):
            # Pipeline/throughput validation where the NVIDIA pickle is
            # unavailable (no-egress hosts): the full JAX graph with random
            # weights. Feature VALUES are meaningless — FID numbers from
            # this mode are plumbing checks, never quality metrics.
            import warnings
            warnings.warn("VIVID_ALLOW_RANDOM_DETECTOR: InceptionV3 running "
                          "with RANDOM weights; FID values are meaningless")
            import jax as _jax
            self.params = init_params(_jax.random.PRNGKey(0))
        else:
            torch_side = InceptionV3Detector()  # raises clearly if absent
            self.params = params_from_torch_module(torch_side.model)
            del torch_side
        self._features = inception_features

    def __call__(self, x):
        return np.asarray(self._features(self.params, np.asarray(x, np.uint8)),
                          np.float32)


class JaxDINOv2Detector(Detector):
    """Device-side FD-DINOv2 detector: the dinov2_vitl14 ViT in functional
    JAX (nn/dinov2.py, HF-parity-tested), final-norm class token, loading the
    torch-hub checkpoint file directly (no hub code execution). Preprocessing
    (bicubic-224 antialias + ImageNet normalize) stays on torch CPU for
    parity with the reference's resize kernel."""

    def __init__(self):
        super().__init__(feature_dim=1024)
        from vivid_tpu.metrics.dinov2_jax import (find_checkpoint,
                                                  load_dinov2_vitl14,
                                                  make_feature_fn)
        path = find_checkpoint(_weights_dir())
        if path is None:
            raise FileNotFoundError(
                f"dinov2_vitl14_pretrain.pth not found under {_weights_dir()}"
                " (torch_hub/checkpoints/). Download the DINOv2 ViT-L/14 "
                "checkpoint into $VIVID_DETECTOR_DIR to compute FD-DINOv2.")
        params, cfg = load_dinov2_vitl14(path)
        self._features = make_feature_fn(params, cfg)

    def __call__(self, x):
        return self._features(x)


class DINOv2Detector(Detector):
    """Torch-CPU sidecar FD-DINOv2 detector (dinov2_vitl14 via torch.hub from
    the local hub cache) — kept as the cross-check path; the metric specs use
    JaxDINOv2Detector."""

    def __init__(self, resize_mode: str = "torch"):
        super().__init__(feature_dim=1024)
        import torch
        torch.hub.set_dir(os.path.join(_weights_dir(), "torch_hub"))
        self.model = torch.hub.load("facebookresearch/dinov2:main",
                                    "dinov2_vitl14", trust_repo=True,
                                    verbose=False, skip_validation=True)
        self.model.eval().requires_grad_(False)
        self._torch = torch

    def __call__(self, x):
        torch = self._torch
        with torch.no_grad():
            t = torch.as_tensor(np.asarray(x, np.float32)).permute(0, 3, 1, 2)
            t = torch.nn.functional.interpolate(t, size=(224, 224),
                                                mode="bicubic", antialias=True)
            t = t / 255.0
            mean = torch.tensor([0.485, 0.456, 0.406]).reshape(1, -1, 1, 1)
            std = torch.tensor([0.229, 0.224, 0.225]).reshape(1, -1, 1, 1)
            return self.model((t - mean) / std).numpy()


metric_specs = {
    "fid": EasyDict(detector_class=JaxInceptionDetector),
    "fd_dinov2": EasyDict(detector_class=JaxDINOv2Detector),
    "joint_fid": EasyDict(detector_class=JaxInceptionDetector),
    "joint_fd_dinov2": EasyDict(detector_class=JaxDINOv2Detector),
    "psnr": EasyDict(),
    # Pipeline-testing metrics with the stub detector:
    "stub_fid": EasyDict(detector_class=StubDetector),
    "joint_stub_fid": EasyDict(detector_class=StubDetector),
}

_detector_cache: Dict[str, Detector] = {}


def get_detector(metric: str, verbose: bool = True) -> Detector:
    if metric in _detector_cache:
        return _detector_cache[metric]
    if dist.get_rank() != 0:
        dist.barrier("detector")
    cls = metric_specs[metric].detector_class
    if verbose:
        dist.print0(f"Setting up {cls.__name__}...")
    detector = cls()
    _detector_cache[metric] = detector
    if dist.get_rank() == 0:
        dist.barrier("detector")
    return detector
