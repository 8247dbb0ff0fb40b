"""Geometry codec / epipolar / warp tests (reference training/utils.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from vivid_tpu.geometry import (MEAN, STD, compose_K, decompose_K,
                                compose_geometry, decompose_geometry,
                                resize_geometry, expand_extrinsics,
                                get_epipolar_dist, get_epipolar_attn,
                                warp_image, get_warped_features)
from vivid_tpu.geometry.codec import relative_pose
from vivid_tpu.geometry.warp import (bilinear_sample, warp_perspective,
                                     random_camera_rotation)


def _random_pose(key):
    # Small random rotation + translation, resembling RealEstate10K stats.
    k1, k2 = jax.random.split(key)
    aa = jax.random.normal(k1, (3,)) * 0.05
    angle = jnp.linalg.norm(aa) + 1e-8
    axis = aa / angle
    K = jnp.array([[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]], [-axis[1], axis[0], 0]])
    R = jnp.eye(3) + jnp.sin(angle) * K + (1 - jnp.cos(angle)) * (K @ K)
    t = jax.random.normal(k2, (3,)) * 0.3
    return jnp.concatenate([R, t[:, None]], axis=1)  # [3, 4]


def _random_K(key):
    f = 50 + jax.random.uniform(key, (2,)) * 20
    return jnp.asarray([f[0], f[1], 32.0, 32.0])


def test_constants_shape():
    assert MEAN.shape == (20,) and STD.shape == (20,)
    assert np.all(STD[[14, 15, 18, 19]] == 0)  # cx, cy slots are constant


def test_K_round_trip():
    vec = jnp.asarray([55.0, 60.0, 32.0, 32.0])
    K = decompose_K(vec)
    assert K.shape == (3, 3)
    np.testing.assert_allclose(compose_K(K), vec, rtol=1e-6)
    np.testing.assert_allclose(K[2, 2], 1.0)


def test_geometry_round_trip():
    key = jax.random.PRNGKey(0)
    pose = _random_pose(key)
    src_K = _random_K(jax.random.PRNGKey(1))
    tgt_K = _random_K(jax.random.PRNGKey(2))
    geo = compose_geometry(pose, src_K, tgt_K, imsize=64)
    assert geo.shape == (20,)
    pose2, srcK2, tgtK2 = decompose_geometry(geo, imsize=64)
    np.testing.assert_allclose(pose2, pose, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(compose_K(srcK2), src_K, rtol=1e-4)
    np.testing.assert_allclose(compose_K(tgtK2), tgt_K, rtol=1e-4)


def test_geometry_zero_std_slots_encode_zero():
    pose = _random_pose(jax.random.PRNGKey(3))
    geo = compose_geometry(pose, _random_K(jax.random.PRNGKey(4)),
                           _random_K(jax.random.PRNGKey(5)), imsize=64)
    np.testing.assert_allclose(np.asarray(geo)[[14, 15, 18, 19]], np.zeros(4))


def test_resize_geometry_consistency():
    pose = _random_pose(jax.random.PRNGKey(6))
    src_K = _random_K(jax.random.PRNGKey(7))
    tgt_K = _random_K(jax.random.PRNGKey(8))
    geo64 = compose_geometry(pose, src_K, tgt_K, imsize=64)
    geo256 = resize_geometry(geo64, 64, 256)
    # Decoding at 256 should give 4x-scaled focal lengths and principal point.
    _, srcK256, _ = decompose_geometry(geo256, imsize=256)
    np.testing.assert_allclose(compose_K(srcK256)[:2], src_K[:2] * 4, rtol=1e-3)
    # Round trip back to 64.
    back = resize_geometry(geo256, 256, 64)
    np.testing.assert_allclose(back, geo64, rtol=1e-3, atol=1e-4)


def test_expand_extrinsics():
    pose = _random_pose(jax.random.PRNGKey(9))
    full = expand_extrinsics(pose)
    assert full.shape == (4, 4)
    np.testing.assert_allclose(full[3], np.array([0, 0, 0, 1]))


def test_relative_pose_identity():
    c2w = expand_extrinsics(_random_pose(jax.random.PRNGKey(10)))
    rel = relative_pose(c2w, c2w)
    np.testing.assert_allclose(rel, np.eye(4), atol=1e-4)


def test_epipolar_dist_shape_and_zero_on_line():
    pose = _random_pose(jax.random.PRNGKey(11))
    geo = compose_geometry(pose, _random_K(jax.random.PRNGKey(12)),
                           _random_K(jax.random.PRNGKey(13)), imsize=64)[None]
    d = get_epipolar_dist(geo, imsize=64, patch_size=8)
    assert d.shape == (1, 64, 64)
    assert bool(jnp.all(jnp.isfinite(d)))
    assert float(d.min()) >= 0


def test_epipolar_attn_zero_mixing_gives_half():
    dist = jnp.ones((1, 16, 16))
    mixing = jnp.zeros((4, 2))
    w = get_epipolar_attn(dist, mixing, patch_size=1)
    assert w.shape == (1, 2, 16, 16)
    # mixing=0, bias=0 -> 0 * sigmoid(...) + 0 = 0.
    np.testing.assert_allclose(w, np.zeros_like(w), atol=1e-7)


def test_warp_image_identity_pose():
    b, h, w = 1, 8, 8
    ii, jj = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    coords = jnp.stack([jj, ii], -1)[None] + 0.5
    identity = jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], 1)
    K = jnp.asarray([8.0, 8.0, 4.0, 4.0])
    geo = compose_geometry(identity, K, K, imsize=h)[None]
    depth = jnp.ones((b, h, w, 1))
    warped = warp_image(depth, geo, coords)
    np.testing.assert_allclose(warped, coords, rtol=1e-3, atol=1e-3)


def test_get_warped_features_shapes():
    from vivid_tpu.nn.mp import mp_fourier_init, mp_fourier_apply
    from functools import partial
    fparams = mp_fourier_init(jax.random.PRNGKey(0), 128)
    embed = partial(mp_fourier_apply, fparams)
    depth = jnp.ones((2, 16, 16, 1))
    pose = _random_pose(jax.random.PRNGKey(14))
    geo = jnp.stack([compose_geometry(pose, _random_K(jax.random.PRNGKey(15)),
                                      _random_K(jax.random.PRNGKey(16)), imsize=16)] * 2)
    feats, warped = get_warped_features(depth, geo, embed)
    assert feats.shape == (2, 16, 16, 128)
    assert warped.shape == (2, 16, 16, 128)


def test_bilinear_sample_exact_at_pixels():
    img = jnp.arange(16.0).reshape(4, 4, 1)
    coords = jnp.asarray([[1.0, 2.0]])  # x=1, y=2 -> img[2, 1]
    out = bilinear_sample(img, coords)
    np.testing.assert_allclose(out[0, 0], img[2, 1])


def test_warp_perspective_identity():
    img = jax.random.uniform(jax.random.PRNGKey(0), (8, 8, 3))
    out = warp_perspective(img, jnp.eye(3))
    np.testing.assert_allclose(out, img, rtol=1e-4, atol=1e-5)


def test_random_camera_rotation_shapes():
    img = jax.random.uniform(jax.random.PRNGKey(0), (16, 16, 3))
    ext = jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], 1)
    K = jnp.asarray([[10.0, 0, 8.0], [0, 10.0, 8.0], [0, 0, 1.0]])
    rot_img, rot_ext = random_camera_rotation(jax.random.PRNGKey(1), img, ext, K,
                                              max_angle_yaw=10.0)
    assert rot_img.shape == img.shape
    assert rot_ext.shape == (3, 4)
    # Rotation must keep the extrinsics orthonormal.
    RtR = rot_ext[:, :3].T @ rot_ext[:, :3]
    np.testing.assert_allclose(RtR, np.eye(3), atol=1e-4)
