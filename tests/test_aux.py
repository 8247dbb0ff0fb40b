"""Aux subsystem tests: single-image mix, consistency checks, summary/FLOPs
tools, kernel dispatch, depth utilities, stats collector, checkpoint IO."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import PIL.Image
import pytest

from vivid_tpu.core import stats as stats_mod
from vivid_tpu.core.checkpoint import CheckpointIO, latest_checkpoint
from vivid_tpu.core.consistency import (assert_finite, check_param_consistency,
                                        tree_fingerprint)
from vivid_tpu.core.summary import count_params, flops_analysis, param_table
from vivid_tpu.kernels.attention import fused_attention, reference_attention


def test_stats_collector_mean_std():
    s = stats_mod.Stats()
    c = stats_mod.Collector(s)
    s.report("a", [1.0, 2.0, 3.0])
    s.report("a", [4.0])
    s.report("b", float("nan"))  # non-finite treated as missing
    c.update()
    d = c.as_dict()
    assert d["a"].num == 4
    np.testing.assert_allclose(d["a"].mean, 2.5)
    assert d["b"].num == 0
    # Interval semantics: drained after as_dict.
    c.update()
    assert "a" not in c.as_dict()


def test_checkpoint_io_round_trip(tmp_path):
    state = {"x": np.arange(4.0), "nested": {"y": np.ones(2)}}
    io = CheckpointIO(state=state)
    p = str(tmp_path / "training-state-0000005.pt")
    io.save(p)
    assert latest_checkpoint(str(tmp_path)) == p
    target = {"x": None, "nested": None}
    io2 = CheckpointIO(state=target)
    io2.load(p)
    np.testing.assert_array_equal(target["x"], state["x"])


def test_tree_fingerprint_sensitivity():
    a = {"w": jnp.ones(4)}
    b = {"w": jnp.ones(4)}
    c = {"w": jnp.ones(4).at[0].set(2.0)}
    assert tree_fingerprint(a) == tree_fingerprint(b)
    assert tree_fingerprint(a) != tree_fingerprint(c)
    assert check_param_consistency(a)


def test_assert_finite():
    assert_finite({"w": jnp.ones(3)})
    with pytest.raises(FloatingPointError):
        assert_finite({"w": jnp.asarray([1.0, float("nan")])})


def test_param_table_and_count():
    params = {"unet": {"conv": {"w": jnp.ones((3, 3, 4, 8))}},
              "gain": jnp.zeros(())}
    table = param_table(params)
    assert "unet/conv" in table and "Total" in table
    assert count_params(params) == 3 * 3 * 4 * 8 + 1


def test_flops_analysis_matmul():
    a = jnp.ones((64, 64))
    cost = flops_analysis(lambda x: x @ x, a)
    assert cost.get("flops", 0) >= 2 * 64 ** 3 * 0.9


def test_fused_attention_cpu_falls_back():
    # [B, H, S, D] — the kernel's native layout.
    q = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 256, 32))
    k = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 768, 32))
    v = jax.random.normal(jax.random.PRNGKey(2), (1, 2, 768, 32))
    out = fused_attention(q, k, v)
    ref = reference_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_single_images_rows(tmp_path):
    from vivid_tpu.data.single_images import SingleImages
    img_dir = tmp_path / "imgs"
    os.makedirs(img_dir)
    rng = np.random.RandomState(0)
    for i in range(2):
        PIL.Image.fromarray(rng.randint(0, 255, (96, 128, 3), np.uint8),
                            "RGB").save(img_dir / f"im{i}.png")
    ds = SingleImages(str(img_dir), imsize=32, num_sources=2, seed=0)
    row = ds.row()
    assert row["src_image"].shape == (2, 32, 32, 3)
    assert row["tgt_image"].shape == (32, 32, 3)
    assert row["geometry"].shape == (2, 20)
    assert np.isfinite(row["geometry"]).all()
    # Rotation-only pairs: translation slots of the decoded pose ~ 0.
    from vivid_tpu.geometry.codec import decompose_geometry
    pose, _, _ = decompose_geometry(jnp.asarray(row["geometry"][0]), imsize=32)
    assert float(jnp.abs(pose[:, 3]).max()) < 1e-3


def test_single_images_in_batch_loader(tmp_path):
    from vivid_tpu.data.collate import BatchLoader
    from vivid_tpu.data.single_images import SingleImages
    img_dir = tmp_path / "imgs"
    os.makedirs(img_dir)
    PIL.Image.fromarray(np.zeros((64, 64, 3), np.uint8), "RGB").save(
        img_dir / "a.png")
    ds = SingleImages(str(img_dir), imsize=32, num_sources=2)
    loader = BatchLoader(iter(ds), ds, batch_size=2, prefetch=1, num_threads=1)
    batch = next(loader)
    assert batch["src_image"].shape == (2, 2, 32, 32, 3)
    loader.close()


def test_depth_utilities():
    from vivid_tpu.geometry.depth import add_depth, get_depth, resolve_depth_model
    fake_depth = lambda x: jnp.ones(x.shape[:3]) * 2.0
    img = jnp.ones((2, 32, 32, 3)) * 128
    d = get_depth(fake_depth, img, (16, 16))
    assert d.shape == (2, 16, 16, 1)
    src = jnp.zeros((2, 16, 16, 3))
    out = add_depth(fake_depth, img, src, inv_norm=True)
    assert out.shape == (2, 16, 16, 4)
    assert resolve_depth_model(None) is None
    assert resolve_depth_model(fake_depth) is fake_depth
    # Named sizes resolve to the JAX DepthAnythingV2 loader, which errors
    # only on the missing external weight file (test_depth_anything.py
    # covers the loaded path).
    with pytest.raises(FileNotFoundError):
        resolve_depth_model("large")
