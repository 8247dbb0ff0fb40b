"""View-pair collation into fixed-shape pair-axis batches.

Parity surface: training/custom_litdata_loader.py VanillaCollate (:11-65) and
DualSourceCollate (:70-176), re-shaped for this framework's explicit source
axis and for XLA's static-shape requirement:

  * vanilla       — 2 random views/scene: src [B,1,h,w,3], tgt [B,h,w,3],
                    geometry [B,1,20].
  * dual-source   — 3 random views/scene (2 sources + 1 shared target):
                    src [B,2,...], geometry [B,2,20].
  * interpolation — 2 endpoint sources + `num_targets` in-between targets,
                    `num_targets` rows per scene (:77-121).

Batches are always exactly `batch_size` rows: scenes that fail validation are
skipped and the loader keeps drawing (the reference returns ragged/None
batches instead — a dynamic shape XLA cannot compile).

Images are resized to `imsize` with PIL bilinear+antialias (the torchvision
`antialias=True` analogue) and scaled to [0, 255] float32. When `sr_size` is
set, sr_src_image / sr_tgt_image / sr_geometry fields are also emitted for
the SR cascade (restoring the reference's RealEstate10K-era SR fields that
the LitData collates dropped — SURVEY.md §2.10).
"""

import queue
import random as _random
import threading
from typing import Iterator, Optional

import numpy as np
import PIL.Image

from vivid_tpu.geometry.codec import compose_geometry_np


def resize_image(img: np.ndarray, size: int) -> np.ndarray:
    """[H, W, 3] any-range float/uint8 -> [size, size, 3] float32, [0,255].
    Integer downscales take a pure-numpy box-filter fast path (the loader is
    host-bound on small-core machines); everything else goes through PIL
    bilinear (the torchvision antialias analogue)."""
    arr = np.asarray(img)
    if arr.dtype != np.uint8:
        scale = 255.0 if arr.max() < 2.0 else 1.0
        arr = np.clip(arr * scale, 0, 255).astype(np.uint8)
    h, w = arr.shape[:2]
    if h == w and h != size and h % size == 0:
        f = h // size
        from vivid_tpu.native.fast_image import (fast_resize_available,
                                                 resize_box_u8)
        if fast_resize_available():
            return resize_box_u8(arr, f)
        return arr.reshape(size, f, size, f, 3).mean(axis=(1, 3), dtype=np.float32)
    if h != size or w != size:
        from vivid_tpu.native.fast_image import (fast_resize_available,
                                                 resize_bilinear_u8)
        if fast_resize_available():
            return resize_bilinear_u8(arr, size)
        pil = PIL.Image.fromarray(arr, "RGB")
        arr = np.asarray(pil.resize((size, size), PIL.Image.Resampling.BILINEAR))
    return arr.astype(np.float32)


def _pair_geometry(scene, src_idx, tgt_idx, imsize):
    src_c2w = np.asarray(scene["c2w"][src_idx], np.float64)
    tgt_c2w = np.asarray(scene["c2w"][tgt_idx], np.float64)
    tgt2src = (np.linalg.inv(tgt_c2w) @ src_c2w)[:3, :]
    return compose_geometry_np(tgt2src, scene["fxfycxcy"][src_idx],
                               scene["fxfycxcy"][tgt_idx], imsize=imsize)


class VanillaCollate:
    """One (source, target) pair per scene.

    `sample_plan` makes every RNG draw for a scene WITHOUT touching pixels;
    `rows_from_scene` materializes the planned rows. The split lets a
    deterministic-resume loader fast-forward the sampling stream (replaying
    draws) at index-draw cost instead of image-decode cost."""

    num_sources = 1
    rows_per_scene = 1
    nimg_mult = 1  # nimg accounting per batch row (training_loop.py:583-586)

    def __init__(self, imsize: int = 64, sr_size: Optional[int] = None, seed: int = 0):
        self.imsize = imsize
        self.sr_size = sr_size
        self.rng = _random.Random(seed)

    def sample_plan(self, scene) -> list:
        """View-index tuples for this scene; advances the RNG exactly as
        rows_from_scene would."""
        n = scene["image"].shape[0]
        if n < 2:
            return []
        i1, i2 = self.rng.sample(range(n), 2)
        return [(i1, i2)]

    def _row(self, scene, i1, i2):
        row = {
            "src_image": resize_image(scene["image"][i1], self.imsize)[None],
            "tgt_image": resize_image(scene["image"][i2], self.imsize),
            "geometry": _pair_geometry(scene, i1, i2, self.imsize)[None].astype(np.float32),
        }
        if self.sr_size is not None:
            row["sr_src_image"] = resize_image(scene["image"][i1], self.sr_size)[None]
            row["sr_tgt_image"] = resize_image(scene["image"][i2], self.sr_size)
            row["sr_geometry"] = _pair_geometry(scene, i1, i2, self.sr_size)[None].astype(np.float32)
        return row

    def materialize(self, scene, plan: list) -> list:
        return [self._row(scene, *p) for p in plan]

    def rows_from_scene(self, scene) -> list:
        return self.materialize(scene, self.sample_plan(scene))


class DualSourceCollate:
    """Two sources sharing one target per scene; optional interpolation mode
    (two endpoint sources, several in-between targets)."""

    num_sources = 2
    nimg_mult = 6  # reference accounting quirk: +batch*6 per step in dual mode

    def __init__(self, imsize: int = 64, sr_size: Optional[int] = None,
                 interpolation: bool = False, num_targets: int = 6,
                 min_frame_dist: int = 25, max_frame_dist: int = 100, seed: int = 0):
        self.imsize = imsize
        self.sr_size = sr_size
        self.interpolation = interpolation
        self.num_targets = num_targets
        self.min_frame_dist = min_frame_dist
        self.max_frame_dist = max_frame_dist
        self.rng = _random.Random(seed)

    @property
    def rows_per_scene(self):
        return self.num_targets if self.interpolation else 1

    def _row(self, scene, s1, s2, t):
        row = {
            "src_image": np.stack([resize_image(scene["image"][s1], self.imsize),
                                   resize_image(scene["image"][s2], self.imsize)]),
            "tgt_image": resize_image(scene["image"][t], self.imsize),
            "geometry": np.stack([_pair_geometry(scene, s1, t, self.imsize),
                                  _pair_geometry(scene, s2, t, self.imsize)]
                                 ).astype(np.float32),
        }
        if self.sr_size is not None:
            row["sr_src_image"] = np.stack(
                [resize_image(scene["image"][s1], self.sr_size),
                 resize_image(scene["image"][s2], self.sr_size)])
            row["sr_tgt_image"] = resize_image(scene["image"][t], self.sr_size)
            row["sr_geometry"] = np.stack(
                [_pair_geometry(scene, s1, t, self.sr_size),
                 _pair_geometry(scene, s2, t, self.sr_size)]).astype(np.float32)
        return row

    def sample_plan(self, scene) -> list:
        """(s1, s2, t) view-index tuples; advances the RNG exactly as
        rows_from_scene would (see VanillaCollate.sample_plan)."""
        n = scene["image"].shape[0]
        if self.interpolation:
            if n < 8:
                return []
            max_dist = min(n - 1, self.max_frame_dist)
            if max_dist <= self.min_frame_dist:
                return []
            dist = self.rng.randint(self.min_frame_dist, max_dist)
            s1 = self.rng.randint(0, n - dist - 1)
            s2 = s1 + dist
            if (s2 - s1 - 1) < self.num_targets:
                return []
            targets = self.rng.sample(range(s1 + 1, s2), self.num_targets)
            return [(s1, s2, t) for t in targets]
        if n < 3:
            return []
        s1, s2, t = self.rng.sample(range(n), 3)
        return [(s1, s2, t)]

    def materialize(self, scene, plan: list) -> list:
        return [self._row(scene, *p) for p in plan]

    def rows_from_scene(self, scene) -> list:
        return self.materialize(scene, self.sample_plan(scene))


class BatchLoader:
    """Background-thread batch assembler: draws scenes from an (infinite)
    iterator, collates rows, stacks exactly `batch_size` of them, and
    prefetches batches so host IO overlaps device compute — the torch
    DataLoader(num_workers, prefetch_factor) analogue without process forks
    (numpy decode releases the GIL for the heavy parts)."""

    def __init__(self, scene_iter: Iterator, collate, batch_size: int,
                 prefetch: int = 4, num_threads: int = None,
                 skip_rows: int = 0):
        import os
        if num_threads is None:
            num_threads = int(os.environ.get("VIVID_LOADER_THREADS",
                                             min(4, os.cpu_count() or 1) + 1))
        self.scene_iter = scene_iter
        self.collate = collate
        self.batch_size = batch_size
        self.queue = queue.Queue(maxsize=prefetch)
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._initial_rows = []
        if skip_rows:
            # Deterministic resume: replay the sampling stream (RNG draws
            # only — no pixel work) past the rows a previous run already
            # consumed. Row->batch order is only well-defined with a single
            # assembly thread; the deterministic pipeline always uses one.
            assert num_threads == 1, \
                "skip_rows needs a single-threaded (deterministic) loader"
            skipped = 0
            while skipped < skip_rows:
                scene = next(self.scene_iter)
                try:
                    plan = self.collate.sample_plan(scene)
                except Exception:
                    continue
                if skipped + len(plan) <= skip_rows:
                    skipped += len(plan)
                else:  # boundary mid-scene: keep the unconsumed tail rows
                    tail = plan[skip_rows - skipped:]
                    self._initial_rows = self.collate.materialize(scene, tail)
                    skipped = skip_rows
        self.threads = [threading.Thread(target=self._worker, daemon=True)
                        for _ in range(num_threads)]
        for t in self.threads:
            t.start()

    def _next_rows(self):
        with self._lock:
            try:
                scene = next(self.scene_iter)
            except StopIteration:
                return None
        try:
            return self.collate.rows_from_scene(scene)
        except Exception:
            return []

    def _worker(self):
        pending, self._initial_rows = self._initial_rows, []
        while not self._stop.is_set():
            rows = self._next_rows()
            n_valid = None
            if rows is None:  # finite iterator exhausted: pad the tail batch
                if pending:
                    # Static shapes for XLA — but mark the padding so eval
                    # consumers don't count duplicated rows as real samples.
                    n_valid = len(pending)
                    while len(pending) < self.batch_size:
                        pending.append(pending[-1])
                else:
                    self.queue.put(None)
                    return
            else:
                pending.extend(rows)
            while len(pending) >= self.batch_size:
                batch_rows = pending[:self.batch_size]
                pending = pending[self.batch_size:]
                batch = {k: np.stack([r[k] for r in batch_rows]) for k in batch_rows[0]}
                mask = np.ones(self.batch_size, bool)
                if n_valid is not None:
                    mask[n_valid:] = False
                batch["valid"] = mask
                self.queue.put(batch)  # daemon threads; close() drains to unblock

    def __iter__(self):
        return self

    def __next__(self):
        item = self.queue.get()
        if item is None:
            raise StopIteration
        return item

    def close(self):
        self._stop.set()
        try:
            while True:
                self.queue.get_nowait()
        except queue.Empty:
            pass
