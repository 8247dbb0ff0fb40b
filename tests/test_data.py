"""Data pipeline tests: scene storage, collates, loaders, pixel codec."""

import numpy as np
import pytest

from vivid_tpu.data import (BatchLoader, DualSourceCollate, SceneDataset,
                            StandardRGBEncoder, VanillaCollate)
from vivid_tpu.data.scenes import make_synthetic_dataset, synthesize_scene


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    path = tmp_path_factory.mktemp("scenes")
    return make_synthetic_dataset(str(path), num_scenes=6, num_views=8, imsize=64)


def test_scene_dataset_iterates(dataset_dir):
    ds = SceneDataset(dataset_dir, seed=0)
    assert len(ds) == 6
    it = iter(ds)
    for _ in range(8):  # > len: infinite iteration reshuffles
        scene = next(it)
        assert scene["image"].shape == (8, 64, 64, 3)
        assert scene["c2w"].shape == (8, 4, 4)
        assert scene["fxfycxcy"].shape == (8, 4)


def test_scene_dataset_process_sharding(dataset_dir):
    ds0 = SceneDataset(dataset_dir, seed=0, shuffle=False, process_index=0, process_count=2)
    ds1 = SceneDataset(dataset_dir, seed=0, shuffle=False, process_index=1, process_count=2)
    # Within one epoch the two shards must be disjoint.
    imgs0 = [next(iter(ds0))["image"][0, 0, 0, 0] for _ in range(1)]
    assert len(ds0.files) == len(ds1.files)


def test_vanilla_collate_shapes():
    rng = np.random.RandomState(0)
    scene = synthesize_scene(rng)
    rows = VanillaCollate(imsize=64).rows_from_scene(scene)
    assert len(rows) == 1
    row = rows[0]
    assert row["src_image"].shape == (1, 64, 64, 3)
    assert row["tgt_image"].shape == (64, 64, 3)
    assert row["geometry"].shape == (1, 20)
    assert 2.0 < row["src_image"].max() <= 255.0  # [0,255] range contract


def test_dual_source_collate_shapes():
    rng = np.random.RandomState(0)
    scene = synthesize_scene(rng)
    rows = DualSourceCollate(imsize=64).rows_from_scene(scene)
    assert len(rows) == 1
    row = rows[0]
    assert row["src_image"].shape == (2, 64, 64, 3)
    assert row["geometry"].shape == (2, 20)
    assert np.isfinite(row["geometry"]).all()


def test_dual_source_sr_fields():
    rng = np.random.RandomState(0)
    scene = synthesize_scene(rng, imsize=64)
    rows = DualSourceCollate(imsize=64, sr_size=128).rows_from_scene(scene)
    row = rows[0]
    assert row["sr_src_image"].shape == (2, 128, 128, 3)
    assert row["sr_tgt_image"].shape == (128, 128, 3)
    assert row["sr_geometry"].shape == (2, 20)


def test_dual_source_interpolation_mode():
    rng = np.random.RandomState(0)
    scene = synthesize_scene(rng, num_views=40)
    collate = DualSourceCollate(imsize=64, interpolation=True, num_targets=6,
                                min_frame_dist=10, max_frame_dist=30)
    rows = collate.rows_from_scene(scene)
    assert len(rows) == 6
    # All 6 rows share the same endpoint source pair.
    for r in rows:
        np.testing.assert_array_equal(r["src_image"], rows[0]["src_image"])


def test_collate_skips_small_scenes():
    rng = np.random.RandomState(0)
    scene = synthesize_scene(rng, num_views=2)
    assert DualSourceCollate().rows_from_scene(scene) == []
    assert len(VanillaCollate().rows_from_scene(scene)) == 1


def test_batch_loader_static_shapes(dataset_dir):
    ds = SceneDataset(dataset_dir, seed=1)
    loader = BatchLoader(iter(ds), DualSourceCollate(imsize=64), batch_size=4,
                         prefetch=2, num_threads=2)
    for _ in range(3):
        batch = next(loader)
        assert batch["src_image"].shape == (4, 2, 64, 64, 3)
        assert batch["tgt_image"].shape == (4, 64, 64, 3)
        assert batch["geometry"].shape == (4, 2, 20)
        assert batch["valid"].all()
    loader.close()


def test_batch_loader_tail_padding_masked():
    """A finite iterator's padded tail batch keeps static shapes but flags
    the duplicated rows, so eval consumers can drop them."""

    class OneRow:
        def rows_from_scene(self, scene):
            return [{"x": np.full((2,), scene, np.float32)}]

    loader = BatchLoader(iter(range(5)), OneRow(), batch_size=4,
                         prefetch=1, num_threads=1)
    first = next(loader)
    assert first["x"].shape == (4, 2) and first["valid"].all()
    tail = next(loader)
    assert tail["x"].shape == (4, 2)
    assert tail["valid"].tolist() == [True, False, False, False]
    import pytest
    with pytest.raises(StopIteration):
        next(loader)
    loader.close()


def test_rgb_encoder_round_trip():
    enc = StandardRGBEncoder()
    x = np.random.RandomState(0).randint(0, 256, (2, 8, 8, 3)).astype(np.float32)
    lat = enc.encode_latents(x)
    assert float(np.abs(np.asarray(lat)).max()) <= 1.0
    back = np.asarray(enc.decode(lat))
    assert back.dtype == np.uint8
    # decode(encode(x)) reproduces pixels within rounding.
    assert np.abs(back.astype(np.float32) - x).max() <= 1.0


def test_geometry_matches_jax_codec():
    from vivid_tpu.geometry.codec import compose_geometry, compose_geometry_np
    rng = np.random.RandomState(0)
    pose = np.eye(3, 4) + rng.randn(3, 4) * 0.05
    src_K = np.array([57.0, 58.0, 32.0, 32.0], np.float32)
    tgt_K = np.array([56.0, 57.5, 32.0, 32.0], np.float32)
    a = compose_geometry_np(pose, src_K, tgt_K, imsize=64)
    b = np.asarray(compose_geometry(pose.astype(np.float32), src_K, tgt_K, imsize=64))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_per_view_scene_layout_roundtrip(tmp_path):
    """save_scene's per-view layout loads lazily (LazyViews) and matches the
    legacy monolithic layout exactly; collates consume both identically."""
    from vivid_tpu.data.scenes import LazyViews, load_scene, save_scene
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (8, 64, 64, 3), np.uint8)
    c2w = np.stack([np.eye(4, dtype=np.float32)] * 8)
    k = rng.rand(8, 4).astype(np.float32)
    new = str(tmp_path / "new.npz")
    old = str(tmp_path / "old.npz")
    save_scene(new, img, c2w, k)                    # per-view default
    save_scene(old, img, c2w, k, per_view=False)    # legacy
    sc_new, sc_old = load_scene(new), load_scene(old)
    assert isinstance(sc_new["image"], LazyViews)
    assert isinstance(sc_old["image"], np.ndarray)
    assert sc_new["image"].shape == sc_old["image"].shape == img.shape
    assert np.array_equal(np.asarray(sc_new["image"]), img)
    assert np.array_equal(sc_new["image"][5], img[5])
    # ndarray-contract edges: negative indices, slices, tuple indexing.
    assert np.array_equal(sc_new["image"][-1], img[-1])
    assert np.array_equal(sc_new["image"][2:5], img[2:5])
    assert np.array_equal(sc_new["image"][3, 10:20, 5], img[3, 10:20, 5])
    with pytest.raises(IndexError):
        sc_new["image"][8]
    # Same collate RNG -> identical rows from either layout.
    r_new = DualSourceCollate(imsize=32, seed=7).rows_from_scene(sc_new)
    r_old = DualSourceCollate(imsize=32, seed=7).rows_from_scene(sc_old)
    for a, b in zip(r_new, r_old):
        for key in a:
            assert np.array_equal(a[key], b[key]), key


def test_batch_loader_skip_rows_resumes_stream(dataset_dir):
    """Deterministic resume: a fresh single-threaded loader with skip_rows=N
    produces exactly the batches a continuous loader produces after N rows."""
    def mk(skip):
        ds = SceneDataset(dataset_dir, seed=3)
        return BatchLoader(iter(ds), DualSourceCollate(imsize=32, seed=3),
                           batch_size=4, num_threads=1, skip_rows=skip)

    full = mk(0)
    want = [next(full) for _ in range(5)][2:]  # batches 3..5 = rows 8..20
    full.close()
    resumed = mk(8)
    got = [next(resumed) for _ in range(3)]
    resumed.close()
    for a, b in zip(want, got):
        for key in a:
            assert np.array_equal(a[key], b[key]), key


def test_batch_loader_skip_rows_interpolation_midscene(dataset_dir):
    """skip_rows landing mid-scene (interpolation mode yields several rows
    per scene) keeps the unconsumed tail rows."""
    def mk(skip):
        ds = SceneDataset(dataset_dir, seed=5)
        collate = DualSourceCollate(imsize=32, seed=5, interpolation=True,
                                    num_targets=3, min_frame_dist=2,
                                    max_frame_dist=6)
        return BatchLoader(iter(ds), collate, batch_size=2, num_threads=1,
                           skip_rows=skip)

    full = mk(0)
    want = [next(full) for _ in range(4)][2:]  # rows 4.. (skip=4 is mid-scene)
    full.close()
    resumed = mk(4)
    got = [next(resumed) for _ in range(2)]
    resumed.close()
    for a, b in zip(want, got):
        for key in a:
            assert np.array_equal(a[key], b[key]), key
