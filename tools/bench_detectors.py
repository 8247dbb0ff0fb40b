#!/usr/bin/env python
"""Device-side metric-eval throughput: images/s through the JAX detectors
(JaxInceptionDetector / JaxDINOv2Detector) with random weights — weights
don't change the compute graph, so throughput is representative even where
the real checkpoints are unavailable ($VIVID_DETECTOR_DIR). Measures the
end-to-end detector __call__ loop (host uint8 batch in, [N, C] features
fetched back — exactly what the FID/FD-DINOv2 pipeline does per batch,
metrics/stats.py), and projects the 10k-image FID feature-extraction
wall-clock. The np.asarray fetch of every feature batch forces execution
through the lazily-executing axon tunnel, so plain wall-clock is valid here.

Usage: python tools/bench_detectors.py [--batch 64] [--imsize 64] [--iters 20]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

from vivid_tpu.core.util import enable_persistent_compilation_cache

enable_persistent_compilation_cache()


def bench(name, features, batch, imsize, iters):
    rng = np.random.RandomState(0)
    x = rng.randint(0, 255, (batch, imsize, imsize, 3), np.uint8)
    f = features(x)  # compile
    assert f.shape[0] == batch and np.isfinite(f).all(), f.shape
    t0 = time.perf_counter()
    for i in range(iters):
        # Vary one pixel so no caching layer can short-circuit the batch.
        x[0, 0, 0, 0] = i & 0xFF
        f = features(x)
    dt = time.perf_counter() - t0
    rate = batch * iters / dt
    print(f"{name}: {rate:.1f} img/s (batch {batch}, {imsize}px in, "
          f"feature dim {f.shape[1]}); 10k-image FID feature pass "
          f"~{10000 / rate:.1f} s", flush=True)
    return rate


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--imsize", type=int, default=64)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    print(f"device: {jax.devices()[0].platform}", flush=True)

    # Inception: random params, same graph as the NVIDIA-pickle weights.
    from vivid_tpu.metrics.inception_jax import inception_features, init_params
    iparams = init_params(jax.random.PRNGKey(0))
    bench("JaxInception(fid)",
          lambda x: np.asarray(inception_features(iparams, x)),
          args.batch, args.imsize, args.iters)

    # DINOv2 ViT-L/14 at 224px (16x16 patches + cls = 257 tokens): random
    # params synthesized through the same state-dict mapping the real
    # checkpoint uses.
    from vivid_tpu.metrics.dinov2_jax import make_feature_fn
    from vivid_tpu.nn.dinov2 import (VIT_SIZES, expected_vit_shapes,
                                     params_from_state_dict)
    cfg = VIT_SIZES["vitl"]
    rng = np.random.RandomState(1)
    sd = {k: (rng.standard_normal(shp).astype(np.float32)
              * (0.02 if len(shp) > 1 else 1.0))
          for k, shp in expected_vit_shapes(cfg, 257).items()}
    dparams = params_from_state_dict(sd, cfg)
    bench("JaxDINOv2(fd_dinov2)", make_feature_fn(dparams, cfg),
          args.batch, args.imsize, args.iters)


if __name__ == "__main__":
    main()
