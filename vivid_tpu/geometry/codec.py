"""Camera geometry codec: 20-d conditioning vector.

Layout (parity with reference training/utils.py:64-104): flattened 3x4
relative pose tgt2src (12) + source fx,fy,cx,cy (4) + target fx,fy,cx,cy (4),
z-normalized with the precomputed MEAN/STD below (constants copied verbatim
from training/utils.py:38-44 — they are part of the trained models' input
contract). The intrinsic slots are rescaled by imsize/64 (mean linearly,
std quadratically), and zero-STD slots (cx, cy) encode as 0.

All functions are pure jax.numpy, batch-agnostic (leading dims arbitrary),
and vmap/jit-friendly.
"""

import jax.numpy as jnp
import numpy as np

# Precomputed dataset statistics for geometry normalization (input contract of
# the shipped VIVID models; reference training/utils.py:38-44).
MEAN = np.array([
    9.6681e-01, -1.6038e-04, -3.7034e-05, -1.6904e-03, -8.7718e-05,
    9.9869e-01, 3.1288e-03, -1.0794e-03, 1.0653e-05, 3.0997e-03,
    9.6691e-01, 1.2561e-02, 5.7708e+01, 5.7704e+01, 3.2000e+01,
    3.2000e+01, 5.7708e+01, 5.7704e+01, 3.2000e+01, 3.2000e+01,
], dtype=np.float32)
STD = np.array([
    0.1104, 0.0346, 0.2279, 0.4930, 0.0347, 0.0091, 0.0367, 0.2208, 0.2279,
    0.0368, 0.1088, 1.0751, 6.6464, 6.6511, 0.0000, 0.0000, 6.6464, 6.6511,
    0.0000, 0.0000,
], dtype=np.float32)

GEOMETRY_DIM = 20


def _scaled_stats(imsize, dtype):
    mean = jnp.asarray(MEAN, dtype)
    std = jnp.asarray(STD, dtype)
    scale = imsize / 64.0
    mean = mean.at[12:].multiply(scale)
    std = std.at[12:].multiply(scale ** 2)
    return mean, std


def compose_K(K):
    """[..., 3, 3] intrinsics -> [..., 4] (fx, fy, cx, cy)."""
    return jnp.stack((K[..., 0, 0], K[..., 1, 1], K[..., 0, 2], K[..., 1, 2]), -1)


def decompose_K(t):
    """[..., 4] (fx, fy, cx, cy) -> [..., 3, 3] intrinsics."""
    fx, fy, cx, cy = jnp.split(t, 4, axis=-1)
    zeros = jnp.zeros_like(fx)
    ones = jnp.ones_like(fx)
    rows = jnp.stack([
        jnp.concatenate([fx, zeros, cx], -1),
        jnp.concatenate([zeros, fy, cy], -1),
        jnp.concatenate([zeros, zeros, ones], -1),
    ], axis=-2)
    return rows


def compose_geometry(tgt2src, src_K, tgt_K, imsize=64):
    """Pack relative pose [..., 3, 4] + intrinsic 4-vectors into a normalized
    [..., 20] conditioning vector."""
    tgt2src = jnp.asarray(tgt2src)
    src_K = jnp.asarray(src_K, tgt2src.dtype)
    tgt_K = jnp.asarray(tgt_K, tgt2src.dtype)
    mean, std = _scaled_stats(imsize, tgt2src.dtype)
    flat = tgt2src.reshape(*tgt2src.shape[:-2], 12)
    geometry = jnp.concatenate([flat, src_K, tgt_K], -1)
    return jnp.where(std > 0, (geometry - mean) / jnp.where(std > 0, std, 1.0),
                     jnp.zeros_like(geometry))


def decompose_geometry(t, imsize=64):
    """Inverse of compose_geometry -> (tgt2src [...,3,4], src_K [...,3,3], tgt_K [...,3,3])."""
    mean, std = _scaled_stats(imsize, t.dtype)
    t = t * std + mean
    tgt2src = t[..., :12].reshape(*t.shape[:-1], 3, 4)
    return tgt2src, decompose_K(t[..., 12:16]), decompose_K(t[..., 16:20])


def resize_geometry(geometry, _from, _to):
    """Re-encode a geometry vector for a different image size (intrinsics scale
    linearly with resolution)."""
    tgt2src, src_K, tgt_K = decompose_geometry(geometry, _from)
    scale = _to / _from
    src_K = src_K.at[..., :2, :].multiply(scale)
    tgt_K = tgt_K.at[..., :2, :].multiply(scale)
    return compose_geometry(tgt2src, compose_K(src_K), compose_K(tgt_K), _to)


def expand_extrinsics(extrinsics):
    """[..., 3, 4] -> [..., 4, 4] homogeneous."""
    bottom = jnp.broadcast_to(
        jnp.asarray([0, 0, 0, 1], extrinsics.dtype),
        extrinsics.shape[:-2] + (1, 4))
    return jnp.concatenate([extrinsics, bottom], -2)


def relative_pose(src_c2w, tgt_c2w):
    """tgt2src = inv(tgt_c2w) @ src_c2w for [..., 4, 4] camera-to-world mats."""
    return jnp.linalg.inv(tgt_c2w) @ src_c2w


def compose_geometry_np(tgt2src, src_K, tgt_K, imsize=64):
    """Numpy twin of compose_geometry for host-side data collation (avoids
    per-sample device dispatch in the input pipeline)."""
    tgt2src = np.asarray(tgt2src, np.float32)
    mean = MEAN.copy()
    std = STD.copy()
    scale = imsize / 64.0
    mean[12:] *= scale
    std[12:] *= scale ** 2
    flat = tgt2src.reshape(*tgt2src.shape[:-2], 12)
    geometry = np.concatenate([flat, np.asarray(src_K, np.float32),
                               np.asarray(tgt_K, np.float32)], -1)
    out = np.zeros_like(geometry)
    np.divide(geometry - mean, std, out=out, where=std > 0)
    return out
