"""Golden tests for the torch snapshot EXPORT path (compat.torch_export).

Exports a vivid_tpu model as a reference-format persistence pickle, then
proves both consumers work: the reference's own load path (pickle.load ->
data['ema'] -> torch forward, generate_images.py:168-171) and this
framework's importer (compat.torch_pickle.load_reference_pickle) — i.e. a
full TPU-train -> GPU-serve interop round trip.
"""

import os
import pickle

import numpy as np
import pytest

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "training")),
    reason="reference tree not mounted")

TINY = dict(model_channels=16, channel_mult=(1, 2), num_blocks=1,
            attn_resolutions=(8,), channels_per_head=8)


def _tiny():
    import jax
    from vivid_tpu.nn.precond import PrecondConfig, precond_init
    cfg = PrecondConfig(img_resolution=16, num_sources=2, use_bf16=False,
                        remat=False, **TINY)
    params = precond_init(jax.random.PRNGKey(3), cfg)
    return params, cfg


def _psnr(a, b):
    mse = float(np.mean((a - b) ** 2))
    span = float(a.max() - a.min()) or 1.0
    return 10 * np.log10(span ** 2 / max(mse, 1e-20))


def test_export_round_trips_through_own_loader(tmp_path):
    """export -> load_reference_pickle must reproduce params and config."""
    import jax
    from vivid_tpu.compat.torch_export import export_reference_pickle
    from vivid_tpu.compat.torch_pickle import load_reference_pickle

    params, cfg = _tiny()
    path = str(tmp_path / "network-snapshot-export.pkl")
    export_reference_pickle(path, params, cfg, reference_root=REFERENCE,
                            dataset_kwargs={"path": "/data/x"}, fp16=False)
    back = load_reference_pickle(path)

    assert back.cfg.model_channels == cfg.model_channels
    assert back.cfg.channel_mult == cfg.channel_mult
    assert back.cfg.num_sources == cfg.num_sources
    assert back.dataset_kwargs == {"path": "/data/x"}

    flat_a = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_b = jax.tree_util.tree_flatten_with_path(back.params)[0]
    assert [p for p, _ in flat_a] == [p for p, _ in flat_b]
    for (pa, va), (_, vb) in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(va), np.asarray(vb), atol=0,
                                   err_msg=jax.tree_util.keystr(pa))


def test_exported_pickle_runs_in_reference_stack(tmp_path):
    """The reference's own consumption path: plain pickle.load, take 'ema',
    run the torch forward — must match our precond_apply on the same weights
    (PSNR > 40 dB, the BASELINE parity gate, here exact-weights so ~fp32)."""
    import torch
    import jax.numpy as jnp
    from vivid_tpu.compat.torch_export import export_reference_pickle
    from vivid_tpu.nn.precond import precond_apply

    params, cfg = _tiny()
    path = str(tmp_path / "network-snapshot-export.pkl")
    export_reference_pickle(path, params, cfg, reference_root=REFERENCE,
                            fp16=False)

    # Exactly what generate_images.py:168-171 does (reference importable
    # because export just used it; its persistence hook reconstructs 'ema').
    with open(path, "rb") as f:
        data = pickle.load(f)
    net = data["ema"]
    # Full reference snapshot dict (training_loop.py:489): the encoder/loss
    # objects are embedded persistent instances.
    assert type(data["encoder"]).__name__ == "StandardRGBEncoder"
    assert type(data["loss_fn"]).__name__ == "NVLoss"

    rng = np.random.RandomState(0)
    B = 2
    src_pairs = rng.randn(B, 2, 3, 16, 16).astype(np.float32)
    dst = rng.randn(B, 3, 16, 16).astype(np.float32)
    sigma = np.exp(rng.randn(B).astype(np.float32) * 0.5)
    geometry = (rng.randn(B, 2, 20) * 0.3).astype(np.float32)

    src_t = torch.tensor(src_pairs.reshape(B * 2, 3, 16, 16))
    dst_t = torch.tensor(np.repeat(dst, 2, axis=0))
    sigma_t = torch.tensor(np.repeat(sigma, 2, axis=0))
    geo_t = torch.tensor(geometry.reshape(B * 2, 20))
    with torch.no_grad():
        d_ref = net(src_t, dst_t, sigma_t, geo_t).numpy()

    d_jax = precond_apply(
        params, cfg,
        jnp.asarray(src_pairs.transpose(0, 1, 3, 4, 2)),
        jnp.asarray(dst.transpose(0, 2, 3, 1)),
        jnp.asarray(sigma), jnp.asarray(geometry), force_fp32=True)
    d_jax = np.asarray(d_jax).transpose(0, 3, 1, 2)

    psnr = _psnr(d_ref, d_jax)
    assert psnr > 40, f"exported-net forward PSNR {psnr:.1f} dB"


def test_export_fp16_matches_reference_snapshot_dtype(tmp_path):
    """Reference snapshots store the EMA net in fp16
    (training_loop.py:491); the default export does too."""
    import torch
    from vivid_tpu.compat.torch_export import export_reference_pickle

    params, cfg = _tiny()
    path = str(tmp_path / "snap-fp16.pkl")
    export_reference_pickle(path, params, cfg, reference_root=REFERENCE)
    with open(path, "rb") as f:
        net = pickle.load(f)["ema"]
    dtypes = {p.dtype for p in net.parameters()}
    assert dtypes == {torch.float16}


def test_reference_made_pickle_loads_standalone(tmp_path):
    """A pickle written by the REFERENCE's own persistence layer must load
    through our reader with NO reference packages importable — the deployed
    scenario (user has only vivid_tpu + a downloaded vivid-*.pkl).

    This exercises the auto-stubbing exec path end-to-end on the real
    models.py source: its relative import (models.py:22), its torch_utils /
    training.utils absolute imports, and init_kwargs recovery from the
    persistence wrapper's recorded state."""
    import sys
    import torch
    from vivid_tpu.compat.torch_export import import_reference
    from vivid_tpu.compat import torch_pickle
    from vivid_tpu.compat.torch_pickle import load_reference_pickle

    models = import_reference(REFERENCE)
    # import_reference must not leave its dep stubs behind: a fake `wandb`
    # (etc.) in sys.modules would shadow a real later import for the rest
    # of the process (e.g. the trainer's import-gated wandb logging).
    for leftover in ("wandb", "kornia", "litdata", "fvcore"):
        mod = sys.modules.get(leftover)
        assert mod is None or "compat stub" not in str(
            getattr(mod, "__file__", "")), leftover
    torch.manual_seed(0)
    net = models.NVPrecond(img_resolution=16, img_channels=3,
                           source_label_dim=20, target_label_dim=40,
                           use_fp16=False, **TINY).eval()
    path = str(tmp_path / "genuine-ref-snapshot.pkl")
    with open(path, "wb") as f:
        pickle.dump({"ema": net, "dataset_kwargs": {}}, f)
    want = {k: v.detach().numpy() for k, v in net.named_parameters()}

    # Hide every reference package and the checkout itself, and force a
    # fresh exec (the cache may hold a module from an earlier loader call).
    hidden = {n: sys.modules.pop(n) for n in list(sys.modules)
              if n.split(".")[0] in ("torch_utils", "training", "dnnlib")}
    saved_path = list(sys.path)
    sys.path = [p for p in sys.path if p != REFERENCE]
    saved_cache = dict(torch_pickle._SRC_MODULE_CACHE)
    torch_pickle._SRC_MODULE_CACHE.clear()
    try:
        back = load_reference_pickle(path)
    finally:
        torch_pickle._SRC_MODULE_CACHE.update(saved_cache)
        sys.path = saved_path
        sys.modules.update(hidden)

    assert back.cfg.model_channels == TINY["model_channels"]
    assert back.cfg.num_sources == 2
    got = {}

    def walk(node, prefix):
        for k, v in node.items():
            if isinstance(v, dict):
                walk(v, prefix + k.replace("/", ".") + ".")
            else:
                got[prefix + k] = np.asarray(v)

    walk(back.params, "")
    # Spot-check one conv round-trips exactly (HWIO back to OIHW view).
    w = got["unet.out_conv.w"]
    np.testing.assert_allclose(w.transpose(3, 2, 0, 1),
                               want["unet.out_conv.weight"], atol=0)
    n_buffers = len(list(net.named_buffers()))
    assert len(got) == len(want) + n_buffers


def test_export_cli_converts_snapshot(tmp_path):
    """python -m vivid_tpu.compat.torch_export: our snapshot format in,
    reference-format pickle out, loadable by load_snapshot's compat route."""
    from click.testing import CliRunner
    from vivid_tpu.compat.torch_export import cmdline
    from vivid_tpu.train.snapshots import load_snapshot, save_snapshot

    params, cfg = _tiny()
    snap = str(tmp_path / "network-snapshot-0000001-0.050.pkl")
    save_snapshot(snap, params, cfg, half=False)
    out = str(tmp_path / "torch-snapshot.pkl")
    r = CliRunner().invoke(cmdline, [snap, out, "--fp32",
                                     f"--reference-root={REFERENCE}"])
    assert r.exit_code == 0, r.output
    back = load_snapshot(out)  # auto-detects the torch format
    assert back.cfg.model_channels == cfg.model_channels
    import jax
    for (pa, va), (_, vb) in zip(jax.tree_util.tree_flatten_with_path(params)[0],
                                 jax.tree_util.tree_flatten_with_path(back.params)[0]):
        np.testing.assert_allclose(np.asarray(va), np.asarray(vb), atol=0,
                                   err_msg=jax.tree_util.keystr(pa))


def test_tree_to_torch_state_inverts_map(tmp_path):
    """tree_to_torch_state is the exact inverse of map_torch_state."""
    import jax
    from vivid_tpu.compat.torch_export import tree_to_torch_state
    from vivid_tpu.compat.torch_pickle import map_torch_state

    params, _ = _tiny()
    state = tree_to_torch_state(params)
    tree = map_torch_state(state, {})
    flat_a = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_b = jax.tree_util.tree_flatten_with_path(tree)[0]
    assert [p for p, _ in flat_a] == [p for p, _ in flat_b]
    for (pa, va), (_, vb) in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb),
                                      err_msg=jax.tree_util.keystr(pa))


def test_export_embeds_encoder_and_loss(tmp_path):
    """Snapshot pickles embed the reference's persistent encoder/loss
    objects (training_loop.py:489: EasyDict(encoder, dataset_kwargs,
    loss_fn, ema)); a reference-side consumer that reads loss_fn sees the
    genuine NVLoss with our training hyperparameters."""
    from vivid_tpu.compat.torch_export import export_reference_pickle
    from vivid_tpu.compat.torch_pickle import load_reference_module

    params, cfg = _tiny()
    path = str(tmp_path / "network-snapshot-aux.pkl")
    export_reference_pickle(path, params, cfg, reference_root=REFERENCE,
                            loss_kwargs={"P_mean": -0.8, "P_std": 1.6},
                            fp16=False)
    with open(path, "rb") as f:
        raw = f.read()
    # Load standalone through our unpickler (no reference on sys.path).
    import io
    from vivid_tpu.compat.torch_pickle import _ReferenceUnpickler
    d = _ReferenceUnpickler(io.BytesIO(raw)).load()
    assert type(d["encoder"]).__name__ == "StandardRGBEncoder"
    assert type(d["loss_fn"]).__name__ == "NVLoss"
    assert d["loss_fn"].P_mean == -0.8 and d["loss_fn"].P_std == 1.6
