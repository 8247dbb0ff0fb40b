"""Epipolar geometry for attention biasing.

Parity surface: training/utils.py:151-186 (`get_epipolar_dist`) and the
upstream epipolar attention weighting (experiments/code/training/models.py:24-31,
`get_epipolar_attn`) which the live reference declares but never applies —
here it is implemented and wired behind the `epipolar_attention_bias` flag.

Distance map: for each target-patch ray projected into the source view, the
point-to-epipolar-line distance || (a-p) - ((a-p)·n) n || over the source
patch grid. Returns [B, S_src, S_tgt].
"""

import jax
import jax.numpy as jnp

from vivid_tpu.geometry.codec import decompose_geometry


def get_epipolar_dist(geometry, imsize, patch_size, key=None):
    """Epipolar distance between the two views' patch grids.

    geometry: [B, 20] normalized codec vectors. Returns [B, S, S] with
    S = (imsize // patch_size) ** 2. For degenerate (zero-translation) poses a
    minimal synthetic translation is injected so epipolar lines exist
    (reference utils.py:163-164); `key` drives that randomization
    (deterministic default).
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    tgt2src, src_K, tgt_K = decompose_geometry(geometry[:, None], imsize=imsize)
    batch = tgt2src.shape[0]

    t_xy = tgt2src[..., :2, 3]
    t_z = tgt2src[..., 2, 3]
    k_xy, k_z = jax.random.split(key)
    t_xy = jnp.where(t_xy != 0, t_xy, 1e-5 * jax.random.normal(k_xy, t_xy.shape, t_xy.dtype))
    rand_sign = 2.0 * jax.random.randint(k_z, t_z.shape, 0, 2).astype(t_z.dtype) - 1.0
    t_z = jnp.where(jnp.abs(t_z) > 1e-5, t_z,
                    1e-1 * jnp.sqrt(jnp.sum(t_xy ** 2, -1)) * rand_sign)
    tgt2src = tgt2src.at[..., :2, 3].set(t_xy).at[..., 2, 3].set(t_z)

    # Patch-center pixel grid, homogeneous.
    coords = jnp.arange(0, imsize, patch_size, dtype=geometry.dtype) + 0.5 * patch_size
    vv, uu = jnp.meshgrid(coords, coords, indexing="ij")
    grid_uvd = jnp.stack([uu, vv, jnp.ones_like(uu)], axis=-1)          # [h, w, 3]
    # [B, h, w, 3]; the K matrices below are [B, 1, 3, 3] so matmul batch
    # dims broadcast as (B, h) x (B, 1) like the reference's torch layout.
    xyz = jnp.broadcast_to(grid_uvd[None], (batch,) + grid_uvd.shape)

    inv_tgt_K = jnp.linalg.inv(tgt_K)
    xyz1 = jnp.concatenate(
        [xyz @ jnp.swapaxes(inv_tgt_K, -1, -2), jnp.ones_like(xyz[..., :1])], axis=-1)
    tgt_xyz = (xyz1 @ jnp.swapaxes(tgt2src, -1, -2))[..., :3] @ jnp.swapaxes(src_K, -1, -2)
    tgt_xyz = tgt_xyz / tgt_xyz[..., 2:3]
    tgt_o = tgt2src[..., :3, 3][..., None, :] @ jnp.swapaxes(src_K, -1, -2)
    tgt_o = tgt_o / tgt_o[..., 2:3]

    a = (xyz - tgt_o).reshape(batch, -1, 1, 3)[..., :2]
    b = (tgt_xyz - tgt_o).reshape(batch, 1, -1, 3)[..., :2]
    b = b / jnp.sqrt(jnp.sum(b ** 2, -1, keepdims=True))
    d = jnp.sqrt(jnp.sum((a - jnp.sum(a * b, -1, keepdims=True) * b) ** 2, -1))
    return jnp.swapaxes(d, -1, -2)


def get_epipolar_attn(epipolar_dist, epipolar_mixing, patch_size=1):
    """Per-head additive attention-logit bias from epipolar distances.

    epipolar_dist: [B, S_k, S_q]; epipolar_mixing: [4, num_heads] learned
    (mixing, log-temperature, cutoff-offset, bias). Returns [B, H, S_k, S_q].
    Formula: mixing * sigmoid(temperature * (cutoff - dist)) + bias — the
    upstream mechanism (experiments/code/training/models.py:24-31).
    """
    d = epipolar_dist[:, None]                                           # [B, 1, Sk, Sq]
    mixing = epipolar_mixing[0].reshape(1, -1, 1, 1)
    temperature = jnp.exp(epipolar_mixing[1]).reshape(1, -1, 1, 1)
    cutoff = patch_size / jnp.sqrt(2.0) + epipolar_mixing[2].reshape(1, -1, 1, 1)
    bias = (epipolar_mixing[3].reshape(1, -1, 1, 1)
            if epipolar_mixing.shape[0] > 3 else 0.0)
    return mixing * jax.nn.sigmoid(temperature * (cutoff - d)) + bias
