"""Shared DINOv2 ViT backbone + JAX FD-DINOv2 detector: random-weight parity
against the HuggingFace Dinov2 implementation, pos-grid interpolation at
load, and the detector wiring."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vivid_tpu.nn.dinov2 import (ViTConfig, expected_vit_shapes,
                                 params_from_state_dict, vit_forward)

TINY = ViTConfig(embed_dim=32, depth=4, num_heads=2, patch_size=14)


def _t2j(v):
    return jnp.asarray(v.detach().cpu().numpy(), jnp.float32)


def _hf_backbone_tree(model, cfg, prefix=""):
    sd = dict(model.state_dict())
    lin = lambda n: {"w": _t2j(sd[f"{n}.weight"]).T, "b": _t2j(sd[f"{n}.bias"])}
    ln = lambda n: {"g": _t2j(sd[f"{n}.weight"]), "b": _t2j(sd[f"{n}.bias"])}
    blocks = []
    for i in range(cfg.depth):
        pre = f"{prefix}encoder.layer.{i}"
        blocks.append({
            "norm1": ln(f"{pre}.norm1"),
            "q": lin(f"{pre}.attention.attention.query"),
            "k": lin(f"{pre}.attention.attention.key"),
            "v": lin(f"{pre}.attention.attention.value"),
            "proj": lin(f"{pre}.attention.output.dense"),
            "ls1": _t2j(sd[f"{pre}.layer_scale1.lambda1"]),
            "norm2": ln(f"{pre}.norm2"),
            "fc1": lin(f"{pre}.mlp.fc1"),
            "fc2": lin(f"{pre}.mlp.fc2"),
            "ls2": _t2j(sd[f"{pre}.layer_scale2.lambda1"]),
        })
    emb = f"{prefix}embeddings"
    return {
        "cls_token": _t2j(sd[f"{emb}.cls_token"]).reshape(1, -1),
        "pos_embed": _t2j(sd[f"{emb}.position_embeddings"])[0],
        "patch_embed": {
            "w": _t2j(sd[f"{emb}.patch_embeddings.projection.weight"]
                      ).transpose(2, 3, 1, 0),
            "b": _t2j(sd[f"{emb}.patch_embeddings.projection.bias"]),
        },
        "blocks": blocks,
        "norm": ln(f"{prefix}layernorm"),
    }


def test_vit_cls_matches_huggingface():
    torch = pytest.importorskip("torch")
    from transformers import Dinov2Config, Dinov2Model
    hf = Dinov2Model(Dinov2Config(
        hidden_size=32, num_hidden_layers=4, num_attention_heads=2,
        intermediate_size=128, image_size=70, patch_size=14,
        initializer_range=0.1))
    torch.manual_seed(0)
    hf.eval()
    tree = _hf_backbone_tree(hf, TINY)
    rng = np.random.RandomState(1)
    x = rng.randn(2, 70, 70, 3).astype(np.float32)
    cls, patch_mean = vit_forward(tree, TINY, jnp.asarray(x))
    with torch.no_grad():
        out = hf(torch.as_tensor(x).permute(0, 3, 1, 2))
    want_seq = out.last_hidden_state.numpy()
    np.testing.assert_allclose(np.asarray(cls), want_seq[:, 0], rtol=0,
                               atol=3e-5 * np.abs(want_seq).max())
    np.testing.assert_allclose(np.asarray(patch_mean),
                               want_seq[:, 1:].mean(1), rtol=0,
                               atol=3e-5 * np.abs(want_seq).max())


def test_params_from_state_dict_pos_interp():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(0)
    sd = {k: torch.as_tensor((rng.randn(*shape) * 0.05).astype(np.float32))
          for k, shape in expected_vit_shapes(TINY, num_tokens=26).items()}
    # 26 tokens = 5x5 grid + cls; interpolate to a 3x3 grid (42px input).
    params = params_from_state_dict(sd, TINY, pos_grid=3)
    assert params["pos_embed"].shape == (10, 32)
    x = rng.randn(1, 42, 42, 3).astype(np.float32)
    cls, _ = vit_forward(params, TINY, jnp.asarray(x))
    assert cls.shape == (1, 32) and np.isfinite(np.asarray(cls)).all()
    # Without pos_grid the 5x5 grid stays; 70px input then works directly.
    params5 = params_from_state_dict(sd, TINY)
    assert params5["pos_embed"].shape == (26, 32)


def test_jax_dinov2_detector_missing_weights(tmp_path, monkeypatch):
    from vivid_tpu.metrics.detectors import JaxDINOv2Detector
    monkeypatch.setenv("VIVID_DETECTOR_DIR", str(tmp_path))
    with pytest.raises(FileNotFoundError, match="dinov2_vitl14"):
        JaxDINOv2Detector()


@pytest.mark.skipif(
    __import__("vivid_tpu.metrics.dinov2_jax", fromlist=["find_checkpoint"])
    .find_checkpoint(__import__("os").environ.get(
        "VIVID_DETECTOR_DIR",
        __import__("os").path.expanduser("~/.cache/vivid_tpu"))) is None,
    reason="real DINOv2 weights not provisioned (needs egress)")
def test_jax_dinov2_matches_torch_hub():
    from vivid_tpu.metrics.detectors import DINOv2Detector, JaxDINOv2Detector
    jd = JaxDINOv2Detector()
    td = DINOv2Detector()
    rng = np.random.RandomState(2)
    imgs = rng.randint(0, 256, (2, 256, 256, 3), np.uint8)
    got, want = jd(imgs), td(imgs)
    np.testing.assert_allclose(got, want, rtol=0,
                               atol=1e-3 * np.abs(want).max())


@pytest.mark.parametrize("in_size", [64, 224, 256, 299])
def test_bicubic_aa_resize_matches_torch(in_size):
    """On-device antialiased bicubic resize (resize_jax) vs
    F.interpolate(..., mode='bicubic', antialias=True) — the reference's
    DINOv2 preprocessing kernel (calculate_metrics.py:56-84)."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    from vivid_tpu.metrics.resize_jax import resize_bicubic_aa
    rng = np.random.default_rng(in_size)
    x = rng.uniform(0, 255, (2, in_size, in_size, 3)).astype(np.float32)
    t = torch.as_tensor(x).permute(0, 3, 1, 2)
    want = F.interpolate(t, size=(224, 224), mode="bicubic",
                         antialias=True).permute(0, 2, 3, 1).numpy()
    got = np.asarray(resize_bicubic_aa(jnp.asarray(x), 224, 224))
    np.testing.assert_allclose(got, want, atol=1e-2)


def test_preprocess_jax_matches_torch():
    from vivid_tpu.metrics.dinov2_jax import preprocess_jax, preprocess_torch
    rng = np.random.default_rng(7)
    imgs = rng.integers(0, 256, (3, 64, 64, 3), dtype=np.uint8)
    got = np.asarray(preprocess_jax(jnp.asarray(imgs, jnp.float32)))
    want = preprocess_torch(imgs)
    np.testing.assert_allclose(got, want, atol=1e-4)


@pytest.mark.parametrize("in_size,out_size", [(256, 64), (64, 256), (64, 64),
                                              (224, 96), (96, 224)])
def test_bilinear_aa_resize_matches_torch(in_size, out_size):
    """resize_bilinear_aa vs F.interpolate(mode='bilinear', antialias=True)
    — the reference's SR conditioning resize kernel (torchvision resize,
    training_loop.py:89-93). Up- and downscale legs both pinned."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    from vivid_tpu.metrics.resize_jax import resize_bilinear_aa
    rng = np.random.default_rng(in_size + out_size)
    x = rng.uniform(-3, 3, (2, in_size, in_size, 3)).astype(np.float32)
    t = torch.as_tensor(x).permute(0, 3, 1, 2)
    want = F.interpolate(t, size=(out_size, out_size), mode="bilinear",
                         antialias=True).permute(0, 2, 3, 1).numpy()
    got = np.asarray(resize_bilinear_aa(jnp.asarray(x), out_size, out_size))
    np.testing.assert_allclose(got, want, atol=1e-4)  # f32 matmul vs torch f64 taps
