"""Depth-based warping and homography augmentation.

Parity surfaces:
  * warp_image / get_warped_features — training/utils.py:189-216: unproject a
    pixel grid with predicted depth, transform by the relative pose, reproject;
    encode both grids with the model's logvar Fourier embedder into 128-channel
    coordinate features (64 channels per coordinate via the reshape trick).
  * homography rotation augmentation — datautils.py:49-75 (kornia replaced by
    closed-form math + a jax bilinear warp).

Everything is channel-last ([B, H, W, C]) per this framework's convention.
"""

import jax
import jax.numpy as jnp

from vivid_tpu.geometry.codec import decompose_geometry, expand_extrinsics


def warp_image(depth, geometry, coords):
    """Project target-grid coords into the source view using depth.

    depth:  [B, H, W, 1]
    geometry: [B, 20]
    coords: [B, H, W, 2] pixel coordinates (x, y)
    returns warped [B, H, W, 2] coordinates (NaNs zeroed).
    """
    tgt2src, src_K, tgt_K = decompose_geometry(geometry[:, None], imsize=coords.shape[-2])
    pts = jnp.concatenate([coords, jnp.ones_like(coords[..., :1])], -1)   # [B,H,W,3]
    w = pts @ jnp.swapaxes(jnp.linalg.inv(src_K), -1, -2)
    w = jnp.concatenate([w * depth, jnp.ones_like(depth)], axis=-1)
    inv_pose = jnp.linalg.inv(expand_extrinsics(tgt2src))
    w = w @ jnp.swapaxes(inv_pose, -1, -2)
    w = w[..., :3] @ jnp.swapaxes(tgt_K, -1, -2)
    warped = (w / w[..., 2:])[..., :2]
    return jnp.where(jnp.isnan(warped), 0.0, warped)


def get_warped_features(depth, geometry, embed_fn):
    """Fourier coordinate features for the identity grid and the depth-warped
    grid. embed_fn maps a flat scalar array [N] -> [N, 128] (the model's
    logvar_fourier); only its first 64 channels are kept per scalar so the
    (x, y) interleave packs into 128 channels total.

    depth: [B, H, W, 1]; returns (features, warped_features), each [B, H, W, 128].
    """
    b, h, w, _ = depth.shape
    ii, jj = jnp.meshgrid(jnp.arange(h, dtype=depth.dtype),
                          jnp.arange(w, dtype=depth.dtype), indexing="ij")
    grid = jnp.broadcast_to(jnp.stack([ii, jj], -1)[None], (b, h, w, 2)) + 0.5
    warped = warp_image(depth, geometry, grid)

    def encode(g):
        flat = embed_fn(g.reshape(-1))[..., :64]
        return flat.reshape(b, h, w, 128)

    return encode(grid), encode(warped)


def bilinear_sample(image, coords):
    """Sample [H, W, C] image at float pixel coords [..., 2] (x, y) with
    bilinear interpolation and zero padding outside."""
    h, w = image.shape[:2]
    x, y = coords[..., 0], coords[..., 1]
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1, y1 = x0 + 1, y0 + 1
    wx = x - x0.astype(x.dtype)
    wy = y - y0.astype(y.dtype)

    def gather(yi, xi):
        valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        xi = jnp.clip(xi, 0, w - 1)
        yi = jnp.clip(yi, 0, h - 1)
        vals = image[yi, xi]
        return jnp.where(valid[..., None], vals, 0.0)

    top = gather(y0, x0) * (1 - wx)[..., None] + gather(y0, x1) * wx[..., None]
    bot = gather(y1, x0) * (1 - wx)[..., None] + gather(y1, x1) * wx[..., None]
    return top * (1 - wy)[..., None] + bot * wy[..., None]


def warp_perspective(image, H, out_shape=None):
    """Apply homography H (maps src pixel -> dst pixel) to [H, W, C] image,
    sampling the inverse mapping bilinearly (kornia warp_perspective analogue)."""
    h_out, w_out = out_shape or image.shape[:2]
    Hinv = jnp.linalg.inv(H)
    ii, jj = jnp.meshgrid(jnp.arange(h_out, dtype=image.dtype),
                          jnp.arange(w_out, dtype=image.dtype), indexing="ij")
    pts = jnp.stack([jj, ii, jnp.ones_like(ii)], -1)                    # (x, y, 1)
    src = pts @ Hinv.T
    src = src[..., :2] / src[..., 2:]
    return bilinear_sample(image, src)


def euler_to_rotation_matrix(pitch, yaw, roll):
    """Rotation matrix from Euler angles (radians), XYZ convention matching
    kornia's quaternion_from_euler -> quaternion_to_rotation_matrix chain."""
    cp, sp = jnp.cos(pitch), jnp.sin(pitch)
    cy, sy = jnp.cos(yaw), jnp.sin(yaw)
    cr, sr = jnp.cos(roll), jnp.sin(roll)
    rx = jnp.array([[1, 0, 0], [0, cp, -sp], [0, sp, cp]])
    ry = jnp.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    rz = jnp.array([[cr, -sr, 0], [sr, cr, 0], [0, 0, 1]])
    return rx @ ry @ rz


def random_camera_rotation(key, image, extrinsics, intrinsics,
                           max_angle_pitch=0.0, max_angle_yaw=10.0, max_angle_roll=0.0):
    """Synthesize a rotated camera view of a single image via homography
    (single-image co-training augmentation, datautils.py:65-75).

    image: [H, W, C]; extrinsics: [3, 4]; intrinsics: [3, 3].
    Returns (rotated_image, rotated_extrinsics).
    """
    deg = jnp.pi / 180.0
    kp, ky, kr = jax.random.split(key, 3)
    pitch = jax.random.uniform(kp, (), minval=-1, maxval=1) * max_angle_pitch * deg
    yaw = jax.random.uniform(ky, (), minval=-1, maxval=1) * max_angle_yaw * deg
    roll = jax.random.uniform(kr, (), minval=-1, maxval=1) * max_angle_roll * deg
    R = euler_to_rotation_matrix(pitch, yaw, roll).astype(image.dtype)
    H = intrinsics @ R @ jnp.linalg.inv(intrinsics)
    rotated = warp_perspective(image, H)
    rotated_extrinsics = jnp.concatenate([R @ extrinsics[:, :3], R @ extrinsics[:, 3:]], axis=1)
    return rotated, rotated_extrinsics
