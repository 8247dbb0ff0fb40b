"""Single-image co-training: synthesize view pairs from single images.

Parity surface: datautils.py SingleImages (:147-182) + random_camera_rotation
(:49-75), with the reference's latent bugs fixed (SURVEY.md §2.10.2 — the
class as written cannot run; this is the intended behavior). A fake "pair" is
built by applying two random camera *rotations* (pure homography warps, no
translation) to one image; the trainer mixes a fraction of such rows into
each batch (--single-image-mix, training_loop.py:230-234).

Warps run through the jax homography sampler (geometry/warp.py); everything
else is host-side numpy so it can live in the loader threads.
"""

import os
import random
from glob import glob
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from vivid_tpu.geometry.codec import compose_geometry_np
from vivid_tpu.native.fast_image import load_rgb
from vivid_tpu.geometry.warp import random_camera_rotation
from vivid_tpu.data.collate import resize_image


def _expand(pose):
    return np.concatenate([pose, np.array([[0, 0, 0, 1]], pose.dtype)], 0)


class SingleImages:
    """Iterable over single image files, producing collate-compatible rows."""

    def __init__(self, path: str, imsize: int = 64, sr_size: Optional[int] = None,
                 num_sources: int = 2, seed: int = 0, **kwargs):
        self.paths = sorted(glob(os.path.join(path, "**", "*.png"), recursive=True)
                            + glob(os.path.join(path, "**", "*.jpg"), recursive=True))
        if not self.paths:
            raise IOError(f"No images under {path!r}")
        self.imsize = imsize
        self.sr_size = sr_size
        self.num_sources = num_sources
        self.rng = random.Random(seed)
        self.key = jax.random.PRNGKey(seed)
        self._key_idx = 0

    def __len__(self):
        return len(self.paths)

    def _rotated_view(self, key_idx, image_f32, K, max_pitch, max_yaw, max_roll):
        ext = np.concatenate([np.eye(3), np.zeros((3, 1))], 1).astype(np.float32)
        img, ext2 = random_camera_rotation(
            jax.random.fold_in(self.key, key_idx), jnp.asarray(image_f32),
            jnp.asarray(ext), jnp.asarray(K), max_angle_pitch=max_pitch,
            max_angle_yaw=max_yaw, max_angle_roll=max_roll)
        return np.asarray(img), np.asarray(ext2)

    def sample_plan(self, scene=None) -> list:
        """All RNG draws for one row WITHOUT touching pixels (the collate
        plan/materialize contract — lets a deterministic-resume loader
        fast-forward the sampling stream at draw cost, no decode/warp)."""
        path = self.rng.choice(self.paths)
        # Two magnitude regimes like the reference (datautils.py:173-180).
        angles = (8.3, 8.3, 3.5) if self.rng.random() < 0.5 else (5.5, 5.5, 0.0)
        key0 = self._key_idx
        self._key_idx += self.num_sources + 1
        return [(path, angles, key0)]

    def materialize(self, scene, plan: list) -> list:
        return [self._planned_row(*p) for p in plan]

    def row(self) -> dict:
        return self._planned_row(*self.sample_plan()[0])

    def _planned_row(self, path, angles, key0) -> dict:
        """One synthetic multi-view row matching the collate schema."""
        img = load_rgb(path).astype(np.float32)
        h, w = img.shape[:2]
        f = 0.6
        K = np.array([[w * f, 0, w * 0.5], [0, h * f, h * 0.5], [0, 0, 1.0]],
                     np.float32)
        views, exts = [], []
        for i in range(self.num_sources + 1):  # n sources + 1 target
            v, e = self._rotated_view(key0 + 1 + i, img, K, *angles)
            views.append(v)
            exts.append(e)

        crop = min(h, w)
        def prep(v, size):
            top, left = (h - crop) // 2, (w - crop) // 2
            return resize_image(np.clip(v[top:top + crop, left:left + crop],
                                        0, 255).astype(np.uint8), size)

        def K_for(size):
            Kc = K.copy()
            Kc[:2, 2] -= np.array([(w - crop) // 2, (h - crop) // 2])
            Kc[:2] *= size / crop
            return np.array([Kc[0, 0], Kc[1, 1], Kc[0, 2], Kc[1, 2]], np.float32)

        tgt_ext = exts[-1]

        def geo(src_ext, size):
            rel = (_expand(src_ext) @ np.linalg.inv(_expand(tgt_ext)))[:3]
            return compose_geometry_np(rel, K_for(size), K_for(size), imsize=size)

        row = {
            "src_image": np.stack([prep(v, self.imsize) for v in views[:-1]]),
            "tgt_image": prep(views[-1], self.imsize),
            "geometry": np.stack([geo(e, self.imsize) for e in exts[:-1]]
                                 ).astype(np.float32),
        }
        if self.num_sources == 1:
            pass  # shapes already [1, ...] via stack of one
        if self.sr_size is not None:
            row["sr_src_image"] = np.stack([prep(v, self.sr_size) for v in views[:-1]])
            row["sr_tgt_image"] = prep(views[-1], self.sr_size)
            row["sr_geometry"] = np.stack([geo(e, self.sr_size) for e in exts[:-1]]
                                          ).astype(np.float32)
        return row

    def rows_from_scene(self, scene=None) -> list:
        """Collate-protocol adapter: ignores `scene`, emits one synthetic row."""
        return [self.row()]

    def __iter__(self):
        while True:
            yield None  # scenes are synthesized, the iterator is just a pump
