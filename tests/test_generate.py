"""Generation pipeline tests (tiny, CPU): snapshot -> generate -> PNGs, with
vanilla / guided / SR-cascade variants, and the metrics gen path."""

import os

import jax
import numpy as np
import pytest

from vivid_tpu.data.scenes import make_synthetic_dataset
from vivid_tpu.generate import generate_images_nvs
from vivid_tpu.nn.precond import PrecondConfig, precond_init
from vivid_tpu.train.snapshots import save_snapshot

TINY = dict(model_channels=16, channel_mult=(1, 2), num_blocks=1,
            attn_resolutions=(8,), channels_per_head=8, use_bf16=False,
            remat=False)


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    root = tmp_path_factory.mktemp("gen")
    data = make_synthetic_dataset(str(root / "scenes"), num_scenes=4,
                                  num_views=6, imsize=32)
    cfg = PrecondConfig(img_resolution=16, num_sources=2, **TINY)
    params = precond_init(jax.random.PRNGKey(0), cfg)
    snap = str(root / "network-snapshot-0000001-0.050.pkl")
    save_snapshot(snap, params, cfg)
    gcfg = PrecondConfig(img_resolution=16, num_sources=2, uncond=True, **TINY)
    gsnap = str(root / "network-snapshot-uncond-0.050.pkl")
    save_snapshot(gsnap, precond_init(jax.random.PRNGKey(1), gcfg), gcfg)
    return dict(root=str(root), data=data, snap=snap, gsnap=gsnap)


def test_generate_writes_triplets(env):
    outdir = os.path.join(env["root"], "out")
    it = generate_images_nvs(net=env["snap"], outdir=outdir, seeds=range(0, 3),
                             max_batch_size=4, datakwargs={"path": env["data"]},
                             num_steps=2, verbose=False)
    batches = list(it)
    assert sum(1 for b in batches if b.images is not None) >= 1
    files = sorted(os.listdir(outdir))
    for seed in range(3):
        for prefix in ("src", "tgt", "sample"):
            assert f"{prefix}_{seed:06d}.png" in files
    b = next(b for b in batches if b.images is not None)
    assert b.images.dtype == np.uint8
    assert b.images.shape[1:] == (16, 16, 3)


def test_generate_seed_determinism(env):
    """Same seed -> identical sample regardless of batch composition."""
    def run(seeds):
        it = generate_images_nvs(net=env["snap"], seeds=seeds, max_batch_size=4,
                                 datakwargs={"path": env["data"]}, num_steps=2,
                                 verbose=False)
        return [b for b in it if b.images is not None]
    a = run(range(5, 7))[0]
    b = run(range(5, 6))[0]
    # Noise for seed 5 identical in both runs; conditioning differs per draw,
    # so compare the noise contract only through rngs (images differ by data).
    from vivid_tpu.core.rngs import seeded_normal
    na = seeded_normal([5, 6], (16, 16, 3))
    nb = seeded_normal([5], (16, 16, 3))
    np.testing.assert_array_equal(np.asarray(na[0]), np.asarray(nb[0]))


def test_generate_tensor_parallel_matches(env):
    """--tp 2: tensor-parallel sampling over the 'model' axis must reproduce
    the data-parallel images (same seeds, same snapshot)."""
    def run(tp):
        it = generate_images_nvs(net=env["snap"], seeds=range(3, 7),
                                 max_batch_size=4,
                                 datakwargs={"path": env["data"]}, num_steps=2,
                                 verbose=False, tp=tp)
        return next(b for b in it if b.images is not None).images
    base = run(0)
    tp2 = run(2)
    diff = np.abs(base.astype(np.int16) - tp2.astype(np.int16))
    assert diff.max() <= 1, f"tp=2 images diverge (max diff {diff.max()})"


def test_generate_with_guidance(env):
    it = generate_images_nvs(net=env["snap"], gnet=env["gsnap"], guidance=1.5,
                             seeds=range(0, 2), max_batch_size=2,
                             datakwargs={"path": env["data"]}, num_steps=2,
                             verbose=False)
    b = [b for b in it if b.images is not None][0]
    assert b.images.shape == (2, 16, 16, 3)


def test_generate_sr_cascade(env):
    sr_cfg = PrecondConfig(img_resolution=32, num_sources=2, super_res=True,
                           noisy_sr=0.25, **TINY)
    sr_snap = os.path.join(env["root"], "sr-snapshot.pkl")
    save_snapshot(sr_snap, precond_init(jax.random.PRNGKey(2), sr_cfg), sr_cfg)
    # Base model at 16 + SR to 32.
    base_cfg = PrecondConfig(img_resolution=16, num_sources=2, **TINY)
    it = generate_images_nvs(net=env["snap"], sr_model=sr_snap,
                             seeds=range(0, 2), max_batch_size=2,
                             datakwargs={"path": env["data"]}, num_steps=2,
                             verbose=False)
    b = [b for b in it if b.images is not None][0]
    assert b.images.shape == (2, 32, 32, 3)   # cascade output at SR res
    assert b.tgt.shape[1] == 32               # sr_ fields used for src/tgt


def test_generate_sr_cascade_vanilla_sr(env):
    """Dual-source base + SINGLE-source SR — the shipped vivid-sr shape
    (experiments/log.txt:720-792 is vanilla). The dual collate emits 2-source
    SR conditioning; generate must slice it down to the SR model's own
    num_sources (label width 40 -> 20) instead of crashing in emb_label."""
    sr_cfg = PrecondConfig(img_resolution=32, num_sources=1, super_res=True,
                           source_label_dim=20, target_label_dim=20,
                           noisy_sr=0.25, **TINY)
    sr_snap = os.path.join(env["root"], "sr-vanilla-snapshot.pkl")
    save_snapshot(sr_snap, precond_init(jax.random.PRNGKey(4), sr_cfg), sr_cfg)
    it = generate_images_nvs(net=env["snap"], sr_model=sr_snap,
                             seeds=range(0, 2), max_batch_size=2,
                             datakwargs={"path": env["data"]}, num_steps=2,
                             verbose=False)
    b = [b for b in it if b.images is not None][0]
    assert b.images.shape == (2, 32, 32, 3)


def test_generate_vanilla_mode(env):
    cfg = PrecondConfig(img_resolution=16, num_sources=1,
                        source_label_dim=20, target_label_dim=20, **TINY)
    snap = os.path.join(env["root"], "vanilla-snapshot.pkl")
    save_snapshot(snap, precond_init(jax.random.PRNGKey(3), cfg), cfg)
    it = generate_images_nvs(net=snap, seeds=range(0, 2), max_batch_size=2,
                             vanilla_mode=True,
                             datakwargs={"path": env["data"]}, num_steps=2,
                             verbose=False)
    b = [b for b in it if b.images is not None][0]
    assert b.images.shape == (2, 16, 16, 3)


def test_metrics_gen_path_with_stub(env):
    from vivid_tpu.metrics.api import get_metrics
    from vivid_tpu.core.easydict import EasyDict
    results = get_metrics(net=env["snap"], num_images=4, max_batch_size=4,
                          metrics=["stub_fid", "psnr"],
                          datakwargs={"path": env["data"]}, num_steps=2)
    assert set(results) == {"stub_fid", "psnr"}
    assert np.isfinite(results["stub_fid"])
    assert np.isfinite(results["psnr"])


def test_generate_with_depth_model(env):
    import jax.numpy as jnp
    from vivid_tpu.nn.precond import PrecondConfig, precond_init
    cfg = PrecondConfig(img_resolution=16, num_sources=2, depth_input=True, **TINY)
    snap = os.path.join(env["root"], "depth-snapshot.pkl")
    save_snapshot(snap, precond_init(jax.random.PRNGKey(5), cfg), cfg)
    fake_depth = lambda x: jnp.ones(x.shape[:3], jnp.float32) * 2.0
    it = generate_images_nvs(net=snap, seeds=range(0, 2), max_batch_size=2,
                             depth_model=fake_depth,
                             datakwargs={"path": env["data"]}, num_steps=2,
                             verbose=False)
    b = [b for b in it if b.images is not None][0]
    assert b.images.shape == (2, 16, 16, 3)
