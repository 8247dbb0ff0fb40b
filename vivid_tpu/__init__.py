"""vivid_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for novel-view-synthesis
pixel-space diffusion, with the capabilities of the VIVID reference
(arXiv:2411.07765, EDM2-based PyTorch implementation).

Layer map (bottom → top), mirroring SURVEY.md §1 but re-designed for TPU:

  core/       config, registry, logging, stats (psum moments), rng, sharding, checkpoint IO
  geometry/   camera pose codec, epipolar geometry, depth-warp features, homography aug
  nn/         magnitude-preserving primitives + EDM2 U-Nets + NVPrecond (functional pytrees)
  kernels/    Pallas TPU kernels for the hot paths (fused pixel-norm attention)
  diffusion/  EDM Heun sampler (lax.scan), losses, LR schedule, power-function EMA
  data/       scene datasets, collates (vanilla / dual-source pair-axis), RealEstate10K
  metrics/    feature detectors, fp64 moment accumulation, Frechet/PSNR
  train/      jitted train step + orchestration loop
  compat/     PyTorch persistence-pickle reader and weight mapping
  cli/        train_nvs / generate_images / calculate_metrics click CLIs
"""

__version__ = "0.1.0"
