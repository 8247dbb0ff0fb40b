"""RealEstate10K layout tests: a synthetic txt+png tree driven through the
scene adapter, collates, and the dataset factory."""

import os

import numpy as np
import PIL.Image
import pytest

from vivid_tpu.data.re10k import RealEstate10K, parse_line, transform_coordinates
from vivid_tpu.data.re10k_scenes import RealEstate10KScenes, open_scene_dataset
from vivid_tpu.data.collate import BatchLoader, DualSourceCollate, VanillaCollate


def _make_tree(root, split="train", num_seqs=2, num_frames=40, w=640, h=360):
    """Synthesize a RealEstate10K-layout dataset."""
    rng = np.random.RandomState(0)
    seq_dir = os.path.join(root, "RealEstate10K", split)
    os.makedirs(seq_dir, exist_ok=True)
    for s in range(num_seqs):
        seq = f"seq{s:03d}"
        frame_dir = os.path.join(root, split, seq)
        os.makedirs(frame_dir, exist_ok=True)
        lines = ["https://example.com/video"]
        for f in range(num_frames):
            ts = str(1000 + f)
            # timestamp fx fy cx cy zero zero + 12 pose numbers (w2c 3x4)
            angle = 0.01 * f
            c, si = np.cos(angle), np.sin(angle)
            pose = [c, 0, si, 0.05 * f, 0, 1, 0, 0.01 * f, -si, 0, c, 0.02 * f]
            lines.append(" ".join(
                [ts, "0.9", "1.6", "0.5", "0.5", "0", "0"]
                + [f"{v:.6f}" for v in pose]))
            img = rng.randint(0, 255, (h, w, 3), np.uint8)
            PIL.Image.fromarray(img, "RGB").save(
                os.path.join(frame_dir, ts + ".png"))
        with open(os.path.join(seq_dir, seq + ".txt"), "w") as fh:
            fh.write("\n".join(lines))
    return root


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    return _make_tree(str(tmp_path_factory.mktemp("re10k")), num_frames=24)


def test_parse_line_shapes():
    line = ("100 0.9 1.6 0.5 0.5 0 0 " + " ".join(["0.1"] * 12))
    ts, K, pose = parse_line(line)
    assert ts == "100"
    assert K.shape == (3, 3) and pose.shape == (3, 4)
    np.testing.assert_allclose(K[0, 0], 640 * 0.9)
    np.testing.assert_allclose(K[1, 2], 360 * 0.5)


def test_transform_coordinates_crop_resize():
    K = np.array([[576.0, 0, 320.0], [0, 576.0, 180.0], [0, 0, 1]])
    K2 = transform_coordinates(K, new_size=64, center_crop_size=360)
    np.testing.assert_allclose(K2[0, 0], 576 * 64 / 360)
    # principal point centered after crop+resize
    np.testing.assert_allclose(K2[0, 2], (320 - 140) * 64 / 360)


def test_re10k_scenes_stream(tree):
    ds = RealEstate10KScenes(tree, split="train", views_per_scene=6)
    scene = next(iter(ds))
    v = scene["image"].shape[0]
    assert 2 <= v <= 6
    assert scene["image"].shape[1:] == (360, 360, 3)  # center-cropped square
    assert scene["c2w"].shape == (v, 4, 4)
    assert scene["fxfycxcy"].shape == (v, 4)
    # 64-px intrinsics convention (fx ~ 0.9*640*64/360 ~ 102).
    assert 50 < scene["fxfycxcy"][0, 0] < 150


def test_re10k_through_dual_source_collate(tree):
    ds = RealEstate10KScenes(tree, split="train", views_per_scene=6)
    loader = BatchLoader(iter(ds), DualSourceCollate(imsize=64), batch_size=2,
                         prefetch=1, num_threads=1)
    batch = next(loader)
    assert batch["src_image"].shape == (2, 2, 64, 64, 3)
    assert np.isfinite(batch["geometry"]).all()
    loader.close()


def test_re10k_range_selection(tree):
    ds = RealEstate10KScenes(tree, split="train", views_per_scene=4,
                             range_selection="mid", seed=3)
    # 24 frames: mid = 30-60 apart is infeasible -> falls back to plain
    # sampling rather than crashing.
    scene = next(iter(ds))
    assert scene["image"].shape[0] >= 2


def test_factory_dispatch(tree, tmp_path):
    ds = open_scene_dataset(tree, split="train")
    assert isinstance(ds, RealEstate10KScenes)
    from vivid_tpu.data.scenes import make_synthetic_dataset, SceneDataset
    npz = make_synthetic_dataset(str(tmp_path / "npz"), num_scenes=2)
    ds2 = open_scene_dataset(npz, split="train")
    assert isinstance(ds2, SceneDataset)


def test_re10k_item_dataset(tree):
    ds = RealEstate10K(split="train", imsize=64, data_root=tree)
    assert len(ds) == 2
    item = ds[0]
    assert item["src_image"].shape == (64, 64, 3)
    assert item["sr_src_image"].shape == (256, 256, 3)
    assert item["geometry"].shape == (20,)
    assert np.isfinite(item["geometry"]).all()


def test_probe_dims_matches_decode(tree):
    from vivid_tpu.native.fast_image import load_rgb, probe_dims
    frame_dir = os.path.join(tree, "train", "seq000")
    path = os.path.join(frame_dir, sorted(os.listdir(frame_dir))[0])
    h, w = probe_dims(path)
    assert (h, w) == load_rgb(path).shape[:2] == (360, 640)


def test_lazy_frames_decode_on_demand(tree):
    ds = RealEstate10KScenes(tree, split="train", views_per_scene=6)
    scene = next(iter(ds))
    imgs = scene["image"]
    from vivid_tpu.data.re10k_scenes import LazyFrames
    assert isinstance(imgs, LazyFrames)
    assert imgs._cache == {}          # header probe only, nothing decoded
    one = imgs[1]
    assert one.shape == (360, 360, 3) and one.dtype == np.uint8
    assert list(imgs._cache) == [1]   # only the touched frame decoded
    dense = np.asarray(imgs)          # __array__ decodes the rest
    assert dense.shape == imgs.shape
    np.testing.assert_array_equal(dense[1], one)
