"""RealEstate10K file-based dataset.

Parity surface: datautils.py:27-144 — per-sequence camera .txt files
(timestamp, normalized intrinsics, 3x4 w2c pose per line) next to PNG frame
dirs; samples 2 frames per item (uniform, or distance-constrained
range_selection 'mid' = 30-60 / 'long' = 60-120 frames apart), center-crops
and resizes to imsize + sr multiple, adjusts intrinsics for the crop/resize,
and emits the geometry codec vector for both resolutions.

Host-side numpy/PIL (input pipeline); outputs match the collate row schema
so the same BatchLoader drives training and evaluation.
"""

import os
import random
from glob import glob
from typing import Optional

import numpy as np
import PIL.Image

from vivid_tpu.core.registry import register
from vivid_tpu.geometry.codec import compose_geometry_np
from vivid_tpu.native.fast_image import load_rgb

RANGE_SELECTIONS = {"mid": (30, 60), "long": (60, 120)}


def parse_line(line: str, width: int = 640, height: int = 360):
    """One camera line -> (timestamp, K [3,3], pose [3,4]). Intrinsics in the
    file are resolution-normalized (datautils.py:27-37)."""
    items = line.split(" ")
    timestamp = items[0]
    fx, fy, cx, cy = map(float, items[1:5])
    K = np.array([[width * fx, 0, width * cx],
                  [0, height * fy, height * cy],
                  [0, 0, 1]], np.float64)
    pose = np.array(list(map(float, items[7:])), np.float64).reshape(3, 4)
    return timestamp, K, pose


def transform_coordinates(K, new_size, center_crop_size, old_width=640, old_height=360):
    """Adjust intrinsics for center crop + resize (datautils.py:40-46)."""
    K = K.copy()
    corner = np.array([(old_width - center_crop_size) // 2,
                       (old_height - center_crop_size) // 2], np.float64)
    K[:2, 2] -= corner
    K[:2] = new_size * K[:2] / center_crop_size
    return K


def expand_extrinsics_np(pose):
    return np.concatenate([pose, np.array([[0, 0, 0, 1]], pose.dtype)], 0)


def _center_crop_resize(img: np.ndarray, crop: int, size: int) -> np.ndarray:
    h, w = img.shape[:2]
    top, left = (h - crop) // 2, (w - crop) // 2
    img = img[top:top + crop, left:left + crop]
    pil = PIL.Image.fromarray(img.astype(np.uint8), "RGB")
    return np.asarray(pil.resize((size, size), PIL.Image.Resampling.BILINEAR),
                      dtype=np.float32)


def nvs_transforms(src_image, src_K, src_pose, tgt_image, tgt_K, tgt_pose,
                   imsize, srsize):
    """Produce the {src_image, tgt_image, geometry, sr_*} record
    (datautils.py:82-100). Poses are world-to-camera as in the source files;
    relative extrinsics = src_w2c @ inv(tgt_w2c)."""
    old_h, old_w = src_image.shape[:2]
    crop = min(old_h, old_w)
    out = {}
    for size, prefix in ((imsize, ""), (srsize, "sr_")):
        sK = transform_coordinates(src_K, size, crop, old_w, old_h)
        tK = transform_coordinates(tgt_K, size, crop, old_w, old_h)
        rel = (expand_extrinsics_np(src_pose) @
               np.linalg.inv(expand_extrinsics_np(tgt_pose)))[:3]
        geo = compose_geometry_np(
            rel, np.array([sK[0, 0], sK[1, 1], sK[0, 2], sK[1, 2]], np.float32),
            np.array([tK[0, 0], tK[1, 1], tK[0, 2], tK[1, 2]], np.float32),
            imsize=size)
        out[prefix + "src_image"] = _center_crop_resize(src_image, crop, size)
        out[prefix + "tgt_image"] = _center_crop_resize(tgt_image, crop, size)
        out[prefix + "geometry"] = geo.astype(np.float32)
    return out


@register("vivid_tpu.data.re10k.RealEstate10K")
class RealEstate10K:
    def __init__(self, split="train", imsize=64, data_root="data", sr_mult=4,
                 range_selection: Optional[str] = None, seed: int = 0, **kwargs):
        self.split = split
        self.imsize = imsize
        self.srsize = imsize * sr_mult
        self.num_channels = 3
        self.data_root = data_root
        self.range_selection = range_selection
        self.rng = random.Random(seed)
        sequence_dir = os.path.join(data_root, "RealEstate10K", split)
        self.sequence_paths = sorted(glob(os.path.join(sequence_dir, "*.txt")))
        self.sequence_paths = [
            p for p in self.sequence_paths
            if os.path.isdir(os.path.join(data_root, split,
                                          os.path.basename(p)[:-len(".txt")]))]
        if range_selection is not None:
            s, _ = RANGE_SELECTIONS[range_selection]
            self.sequence_paths = [
                p for p in self.sequence_paths
                if len(open(p).read().splitlines()) > (s + 1)]
        if not self.sequence_paths:
            raise IOError(f"No RealEstate10K sequences under {data_root!r} ({split})")

    def __len__(self):
        return len(self.sequence_paths)

    def _sample_indices(self, n: int):
        if self.range_selection is None:
            if n == 1:
                return 0, 0
            return tuple(self.rng.sample(range(n), 2))
        s, e = RANGE_SELECTIONS[self.range_selection]
        i1 = self.rng.randrange(n)
        candidates = [j for j in range(n)
                      if s <= abs(j - i1) < e]
        if not candidates:
            return tuple(self.rng.sample(range(n), 2))
        return i1, self.rng.choice(candidates)

    def __getitem__(self, index: int) -> dict:
        seq_path = self.sequence_paths[index]
        seq = os.path.basename(seq_path)[:-len(".txt")]
        lines = open(seq_path).read().splitlines()[1:]
        i1, i2 = self._sample_indices(len(lines))
        src_ts, src_K, src_pose = parse_line(lines[i1])
        tgt_ts, tgt_K, tgt_pose = parse_line(lines[i2])
        frame_dir = os.path.join(self.data_root, self.split, seq)
        src_image = load_rgb(os.path.join(frame_dir, src_ts + ".png"))
        tgt_image = load_rgb(os.path.join(frame_dir, tgt_ts + ".png"))
        return nvs_transforms(src_image, src_K, src_pose, tgt_image, tgt_K,
                              tgt_pose, self.imsize, self.srsize)

    def __iter__(self):
        while True:
            yield self[self.rng.randrange(len(self))]
