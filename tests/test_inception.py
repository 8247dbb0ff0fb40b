"""JAX-native InceptionV3 detector: spec sanity, torch parity, wiring.

The real inception-2015-12-05 weights need egress, so correctness is
established structurally: the same architecture spec drives both the JAX
forward and a torch twin, and random weights must produce matching features
(validates every conv/bn/pool/pad/resize decision). A weight-gated test
covers the NVIDIA-pickle import when $VIVID_DETECTOR_DIR is provisioned.
"""

import os

import numpy as np
import pytest

import jax

from vivid_tpu.metrics.inception_jax import (FEATURE_DIM, INCEPTION_V3_SPEC,
                                             build_torch_twin,
                                             inception_features, init_params,
                                             iter_convs)


def test_spec_channel_bookkeeping():
    convs = list(iter_convs())
    names = [c[0] for c in convs]
    assert len(names) == len(set(names)), "duplicate conv names"
    assert len(convs) == 94  # TF-slim inception v3 conv count
    # Final mixed output must be 2048 = 320 + 768 + 768 + 192.
    n_params = sum(np.prod((kh, kw, cin, cout)) + 3 * cout
                   for _, cin, cout, (kh, kw), _, _ in convs)
    assert 21e6 < n_params < 25e6  # ~23.8M, the known InceptionV3 size


def test_jax_vs_torch_twin_parity():
    """Random-weight features must match between the JAX forward and the
    torch twin interpreted from the same spec."""
    params = init_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    imgs = rng.randint(0, 256, (2, 64, 64, 3), np.uint8)
    got = np.asarray(inception_features(params, imgs, use_bf16=False))
    want = build_torch_twin(params)(imgs)
    assert got.shape == want.shape == (2, FEATURE_DIM)
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-4 * scale)
    # Features are image-dependent (not constant).
    assert np.abs(want[0] - want[1]).max() > 1e-6


def test_tf1_resize_matches_nvidia_grid_sample():
    """tf1_resize_bilinear must reproduce the NVIDIA inception pickle's
    internal resize EXACTLY. The pickle emulates TF1
    resize_bilinear(align_corners=False) with an affine_grid whose theta is
    shifted by 1/in - 1/out, then grid_sample(bilinear, border,
    align_corners=False) — reconstructed verbatim here as the oracle."""
    import torch
    import torch.nn.functional as F
    from vivid_tpu.metrics.inception_jax import tf1_resize_bilinear

    rng = np.random.RandomState(0)
    for in_hw, out_hw in (((64, 64), (299, 299)), ((256, 256), (299, 299)),
                          ((299, 299), (150, 75)), ((40, 56), (299, 299))):
        x = rng.randint(0, 256, (2, *in_hw, 3)).astype(np.float32)
        xt = torch.as_tensor(x).permute(0, 3, 1, 2)  # NCHW
        n, c, h, w = xt.shape
        new_h, new_w = out_hw
        theta = torch.eye(2, 3)
        theta[0, 2] += theta[0, 0] / w - theta[0, 0] / new_w
        theta[1, 2] += theta[1, 1] / h - theta[1, 1] / new_h
        theta = theta.unsqueeze(0).repeat([n, 1, 1])
        grid = F.affine_grid(theta, [n, c, new_h, new_w], align_corners=False)
        want = F.grid_sample(xt, grid, mode="bilinear", padding_mode="border",
                             align_corners=False)
        want = want.permute(0, 2, 3, 1).numpy()
        got = np.asarray(tf1_resize_bilinear(x, new_h, new_w))
        # atol: grid_sample quantizes through fp32 normalized coords
        # (~3e-4 relative on 0..255 data); the half-pixel delta is >1.0.
        np.testing.assert_allclose(got, want, rtol=0, atol=2e-2)

    # And it must DIFFER from half-pixel resize (the bug being fixed).
    x = rng.randint(0, 256, (1, 64, 64, 3)).astype(np.float32)
    half_pixel = np.asarray(jax.image.resize(
        jax.numpy.asarray(x), (1, 299, 299, 3), "bilinear"))
    tf1 = np.asarray(tf1_resize_bilinear(x, 299, 299))
    assert np.abs(tf1 - half_pixel).max() > 1.0


def test_jax_inception_batch_invariance():
    params = init_params(jax.random.PRNGKey(1))
    rng = np.random.RandomState(1)
    imgs = rng.randint(0, 256, (3, 32, 32, 3), np.uint8)
    full = np.asarray(inception_features(params, imgs, use_bf16=False))
    one = np.asarray(inception_features(params, imgs[1:2], use_bf16=False))
    np.testing.assert_allclose(full[1], one[0], rtol=0,
                               atol=1e-4 * np.abs(full).max())


@pytest.mark.skipif(
    not os.path.exists(os.path.join(
        os.environ.get("VIVID_DETECTOR_DIR",
                       os.path.expanduser("~/.cache/vivid_tpu")),
        "inception-2015-12-05.pkl")),
    reason="real InceptionV3 weights not provisioned (needs egress)")
def test_nvidia_pickle_import_matches_torch():
    from vivid_tpu.metrics.detectors import InceptionV3Detector
    from vivid_tpu.metrics.inception_jax import params_from_torch_module
    torch_det = InceptionV3Detector()
    params = params_from_torch_module(torch_det.model)
    rng = np.random.RandomState(2)
    imgs = rng.randint(0, 256, (2, 299, 299, 3), np.uint8)
    got = np.asarray(inception_features(params, imgs, use_bf16=False))
    want = torch_det(imgs)
    np.testing.assert_allclose(got, want, rtol=0,
                               atol=1e-3 * np.abs(want).max())
