"""Pallas kernels inside multi-shard shard_map — executed, not argued.

The pod-safety claim is that DP serving (generate._build_sampler runs the
whole sampler per-shard inside jax.shard_map) and TP attention
(kernels.attention.fused_attention dispatches per-head-shard) keep the
Pallas kernels on the fast path on real multi-chip meshes. The real chip in
this environment is a 1-device mesh, so these tests force the kernel paths
ON via VIVID_PALLAS_INTERPRET=1 (Pallas interpret mode off-TPU) and execute
them with >1 shards on the virtual 8-device CPU mesh, asserting equality
with the replicated XLA path. Mirrors the reference's 8-rank serving
protocol (generate_images.py:199-200 + torchrun DDP)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vivid_tpu.core.sharding import act_sharding, make_mesh


@pytest.fixture
def interpret_kernels(monkeypatch):
    monkeypatch.setenv("VIVID_PALLAS_INTERPRET", "1")


def _mesh_1d(n):
    return Mesh(np.asarray(jax.devices()[:n]), axis_names=("data",))


def test_packed_self_kernel_inside_shard_map(interpret_kernels):
    """flash_fused_packed (interpret) under a 4-shard data shard_map equals
    the replicated XLA composite."""
    from vivid_tpu.kernels.attention import (_xla_self_attention_from_packed,
                                             self_attention_from_packed)
    mesh = _mesh_1d(4)
    B, S, H, D = 4, 64, 2, 32
    qkv = jax.random.normal(jax.random.PRNGKey(0), (B, S, 3 * H * D),
                            jnp.float32)

    fn = jax.jit(jax.shard_map(
        lambda x: self_attention_from_packed(x, H, zero_sink=128),
        mesh=mesh, in_specs=P("data"), out_specs=P("data"),
        check_vma=False))
    got = np.asarray(fn(jax.device_put(qkv, NamedSharding(mesh, P("data")))))
    want = np.asarray(_xla_self_attention_from_packed(qkv, H, 128, 1e-4))
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=0)


def test_packed_xattn_kernel_inside_shard_map(interpret_kernels):
    """flash_fused_packed_xattn with an epipolar-style bias under a 2-shard
    shard_map equals the replicated XLA composite."""
    from vivid_tpu.kernels.attention import (_xla_xattn_from_packed,
                                             xattn_from_packed)
    mesh = _mesh_1d(2)
    B, S, Sf, H, D = 2, 64, 64, 2, 32
    key = jax.random.PRNGKey(1)
    qkv = jax.random.normal(key, (B, S, 3 * H * D), jnp.float32)
    feats = tuple(jax.random.normal(jax.random.fold_in(key, i + 1),
                                    (B, Sf, 2 * H * D), jnp.float32)
                  for i in range(2))
    biases = tuple(0.4 * jax.random.normal(jax.random.fold_in(key, 10 + i),
                                           (B, H, S, Sf), jnp.float32)
                   for i in range(2))

    fn = jax.jit(jax.shard_map(
        lambda x, f0, f1, b0, b1: xattn_from_packed(x, (f0, f1), H,
                                                    biases=(b0, b1)),
        mesh=mesh, in_specs=P("data"), out_specs=P("data"),
        check_vma=False))
    sh = NamedSharding(mesh, P("data"))
    args = [jax.device_put(a, sh) for a in (qkv, *feats, *biases)]
    got = np.asarray(fn(*args))
    want = np.asarray(_xla_xattn_from_packed(qkv, feats, biases, H, 1e-4))
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=0)


def test_tp_per_head_shard_dispatch_runs_pallas(interpret_kernels,
                                                monkeypatch):
    """fused_attention under act_sharding(tp=...): the per-head-shard
    shard_map dispatch must execute the Pallas kernel (interpret) on each of
    the 2 head shards and match the replicated einsum reference."""
    import vivid_tpu.kernels.flash as flash_mod
    from vivid_tpu.kernels.attention import fused_attention, reference_attention

    calls = []
    orig = flash_mod.flash_fused
    monkeypatch.setattr(flash_mod, "flash_fused",
                        lambda *a, **k: calls.append(k) or orig(*a, **k))

    mesh = make_mesh(n_data=2, n_model=2)
    B, H, S, D = 2, 2, 256, 32
    key = jax.random.PRNGKey(2)
    q = jax.random.normal(key, (B, H, S, D), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(key, 1), (B, H, S, D), jnp.float32)
    v = jax.random.normal(jax.random.fold_in(key, 2), (B, H, S, D), jnp.float32)

    with act_sharding(mesh, tp="model"):
        got = np.asarray(fused_attention(q, k, v))
    want = np.asarray(reference_attention(q, k, v))
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=0)
    assert calls and all(kw.get("interpret") for kw in calls), \
        "Pallas kernel did not run inside the TP shard_map dispatch"


@pytest.mark.slow
def test_dp_serving_sampler_runs_packed_kernels(interpret_kernels,
                                                monkeypatch, tmp_path):
    """End-to-end DP serving: generate._build_sampler's 8-shard shard_map
    executes the packed Pallas kernels (interpret) inside each shard and
    reproduces the XLA-fallback images (both runs shard_map'd; the only
    difference is kernel vs composite inside the shard)."""
    import vivid_tpu.kernels.flash as flash_mod
    from vivid_tpu.data.scenes import make_synthetic_dataset
    from vivid_tpu.generate import generate_images_nvs
    from vivid_tpu.nn.precond import PrecondConfig, precond_init
    from vivid_tpu.train.snapshots import save_snapshot

    data = make_synthetic_dataset(str(tmp_path / "scenes"), num_scenes=4,
                                  num_views=6, imsize=32)
    cfg = PrecondConfig(img_resolution=16, num_sources=2, model_channels=16,
                        channel_mult=(1, 2), num_blocks=1,
                        attn_resolutions=(8,), channels_per_head=8,
                        use_bf16=False, remat=False)
    snap = str(tmp_path / "network-snapshot-0000001-0.050.pkl")
    save_snapshot(snap, precond_init(jax.random.PRNGKey(0), cfg), cfg)

    calls = []
    for name in ("flash_fused_packed", "flash_fused_packed_xattn"):
        orig = getattr(flash_mod, name)
        monkeypatch.setattr(
            flash_mod, name,
            lambda *a, _orig=orig, **kw: calls.append(kw) or _orig(*a, **kw))

    def run():
        it = generate_images_nvs(net=snap, seeds=range(0, 8),
                                 max_batch_size=8,
                                 datakwargs={"path": data}, num_steps=2,
                                 verbose=False)
        return next(b for b in it if b.images is not None).images

    got = run()                                   # packed interpret kernels
    assert calls and all(kw.get("interpret") for kw in calls), \
        "packed kernels did not engage inside the DP serving shard_map"
    n_packed = len(calls)
    calls.clear()

    monkeypatch.setenv("VIVID_PALLAS_INTERPRET", "")
    want = run()                                  # XLA fallback path
    assert not calls
    assert n_packed >= 2
    diff = np.abs(got.astype(np.int16) - want.astype(np.int16))
    assert diff.max() <= 1, f"kernel/composite images diverge ({diff.max()})"


def test_nomax_packed_kernel_inside_shard_map(interpret_kernels,
                                              monkeypatch):
    """flash_nomax_packed (VIVID_NOMAX_PACKED=1 forward schedule) under a
    2-shard data shard_map, reached THROUGH the packed dispatch, equals the
    replicated XLA composite — if the pipelined schedule ever becomes the
    serving default, the DP shard_map serving path must keep it live."""
    import vivid_tpu.kernels.flash as flash_mod
    from vivid_tpu.kernels.attention import (_xla_xattn_from_packed,
                                             xattn_from_packed)
    monkeypatch.setenv("VIVID_NOMAX_PACKED", "1")
    calls = []
    orig = flash_mod.flash_nomax_packed
    monkeypatch.setattr(flash_mod, "flash_nomax_packed",
                        lambda *a, **k: calls.append(k) or orig(*a, **k))
    mesh = _mesh_1d(2)
    B, S, Sf, H, D = 2, 128, 128, 4, 32   # gate-valid: d=32 needs H%4==0
    key = jax.random.PRNGKey(7)
    qkv = jax.random.normal(key, (B, S, 3 * H * D), jnp.float32)
    feats = tuple(jax.random.normal(jax.random.fold_in(key, i + 1),
                                    (B, Sf, 2 * H * D), jnp.float32)
                  for i in range(2))
    fn = jax.jit(jax.shard_map(
        lambda x, f0, f1: xattn_from_packed(x, (f0, f1), H),
        mesh=mesh, in_specs=P("data"), out_specs=P("data"),
        check_vma=False))
    sh = NamedSharding(mesh, P("data"))
    args = [jax.device_put(a, sh) for a in (qkv, *feats)]
    got = np.asarray(fn(*args))
    assert calls and all(kw.get("interpret") for kw in calls), \
        "flash_nomax_packed did not engage inside the shard_map dispatch"
    want = np.asarray(_xla_xattn_from_packed(qkv, feats, (), H, 1e-4))
    np.testing.assert_allclose(got, want, atol=2e-2, rtol=2e-2)


def test_nomax_kernel_inside_shard_map(interpret_kernels):
    """flash_nomax (the big-S SR serving kernel) under a 2-shard data
    shard_map equals the replicated einsum reference — on real pods the TP
    per-head-shard dispatch routes big-S unbiased shapes to this kernel
    inside shard_map, so its vma propagation must hold like the packed
    kernels'."""
    from vivid_tpu.kernels.attention import reference_attention
    from vivid_tpu.kernels.flash import flash_nomax
    from vivid_tpu.nn.mp import normalize
    mesh = _mesh_1d(2)
    B, H, S, Sk, D = 2, 2, 256, 512, 32
    key = jax.random.PRNGKey(5)
    q = normalize(jax.random.normal(key, (B, H, S, D), jnp.float32), axis=-1)
    k = normalize(jax.random.normal(jax.random.fold_in(key, 1),
                                    (B, H, Sk, D), jnp.float32), axis=-1)
    v = jax.random.normal(jax.random.fold_in(key, 2), (B, H, Sk, D),
                          jnp.float32)
    fn = jax.jit(jax.shard_map(
        lambda q_, k_, v_: flash_nomax(q_, k_, v_, block_q=128, block_k=256,
                                       interpret=True),
        mesh=mesh, in_specs=P("data"), out_specs=P("data"),
        check_vma=False))
    sh = NamedSharding(mesh, P("data"))
    got = np.asarray(fn(jax.device_put(q, sh), jax.device_put(k, sh),
                        jax.device_put(v, sh)))
    want = np.asarray(reference_attention(q, k, v))
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=0)
