"""JAX DepthAnythingV2: numerics vs the HuggingFace implementation (random
weights), original-checkpoint key contract via a synthesized stub .pth, and
the named resolve_depth_model path (reference training/utils.py:232-243)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vivid_tpu.geometry.depth_anything import (DAV2Config, SIZES, dav2_apply,
                                               expected_state_dict_shapes,
                                               params_from_state_dict,
                                               resize_bilinear_ac)

TINY = DAV2Config(embed_dim=32, depth=4, num_heads=2, layer_idx=(0, 1, 2, 3),
                  features=16, out_channels=(8, 16, 32, 32), max_depth=20.0)


def _t2j(v):
    return jnp.asarray(v.detach().cpu().numpy(), jnp.float32)


def _hf_tree(model, cfg):
    """Map a HuggingFace DepthAnythingForDepthEstimation state into the
    functional param tree (independent of the original-.pth importer, so the
    two mappings cross-check each other's layout conventions)."""
    sd = dict(model.state_dict())
    conv = lambda n, bias=True: (
        {"w": _t2j(sd[f"{n}.weight"]).transpose(2, 3, 1, 0),
         **({"b": _t2j(sd[f"{n}.bias"])} if bias else {})})
    lin = lambda n: {"w": _t2j(sd[f"{n}.weight"]).T, "b": _t2j(sd[f"{n}.bias"])}
    ln = lambda n: {"g": _t2j(sd[f"{n}.weight"]), "b": _t2j(sd[f"{n}.bias"])}
    blocks = []
    for i in range(cfg.depth):
        pre = f"backbone.encoder.layer.{i}"
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
    tree = {
        "cls_token": _t2j(sd["backbone.embeddings.cls_token"]).reshape(1, -1),
        "pos_embed": _t2j(sd["backbone.embeddings.position_embeddings"])[0],
        "patch_embed": conv("backbone.embeddings.patch_embeddings.projection"),
        "blocks": blocks,
        "norm": ln("backbone.layernorm"),
        "projects": [conv(f"neck.reassemble_stage.layers.{i}.projection")
                     for i in range(4)],
        "resize0": {"w": _t2j(sd["neck.reassemble_stage.layers.0.resize.weight"]),
                    "b": _t2j(sd["neck.reassemble_stage.layers.0.resize.bias"])},
        "resize1": {"w": _t2j(sd["neck.reassemble_stage.layers.1.resize.weight"]),
                    "b": _t2j(sd["neck.reassemble_stage.layers.1.resize.bias"])},
        "resize3": conv("neck.reassemble_stage.layers.3.resize"),
        "layer_rn": [conv(f"neck.convs.{i}", bias=False) for i in range(4)],
        "fusion": [],
        "head": {"conv1": conv("head.conv1"), "conv2": conv("head.conv2"),
                 "conv3": conv("head.conv3")},
    }
    for j in range(4):
        pre = f"neck.fusion_stage.layers.{j}"
        tree["fusion"].append({
            "proj": conv(f"{pre}.projection"),
            "res1": {"conv1": conv(f"{pre}.residual_layer1.convolution1"),
                     "conv2": conv(f"{pre}.residual_layer1.convolution2")},
            "res2": {"conv1": conv(f"{pre}.residual_layer2.convolution1"),
                     "conv2": conv(f"{pre}.residual_layer2.convolution2")},
        })
    return tree


def test_resize_bilinear_align_corners_matches_torch():
    import torch
    import torch.nn.functional as F
    rng = np.random.RandomState(0)
    x = rng.randn(2, 5, 7, 3).astype(np.float32)
    got = np.asarray(resize_bilinear_ac(jnp.asarray(x), (11, 4)))
    want = F.interpolate(torch.as_tensor(x).permute(0, 3, 1, 2), size=(11, 4),
                         mode="bilinear", align_corners=True)
    want = want.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-5)


def test_dav2_matches_huggingface():
    """Full-model random-weight parity against the HF DepthAnything port
    (which is itself validated against the original repo)."""
    torch = pytest.importorskip("torch")
    from transformers import (DepthAnythingConfig,
                              DepthAnythingForDepthEstimation)
    hf_cfg = DepthAnythingConfig(
        backbone_config=dict(model_type="dinov2", hidden_size=32,
                             num_hidden_layers=4, num_attention_heads=2,
                             intermediate_size=128, image_size=70,
                             patch_size=14, out_indices=[1, 2, 3, 4],
                             apply_layernorm=True,
                             reshape_hidden_states=False),
        reassemble_hidden_size=32, fusion_hidden_size=16,
        neck_hidden_sizes=[8, 16, 32, 32],
        depth_estimation_type="metric", max_depth=20.0, patch_size=14,
        initializer_range=0.1)
    torch.manual_seed(0)
    model = DepthAnythingForDepthEstimation(hf_cfg).eval()
    tree = _hf_tree(model, TINY)

    rng = np.random.RandomState(1)
    x = rng.randn(2, 70, 70, 3).astype(np.float32)
    got = np.asarray(dav2_apply(tree, TINY, jnp.asarray(x)))
    with torch.no_grad():
        want = model(torch.as_tensor(x).permute(0, 3, 1, 2)).predicted_depth
    want = want.numpy()
    assert got.shape == want.shape == (2, 70, 70)
    np.testing.assert_allclose(got, want, rtol=0,
                               atol=3e-5 * max(np.abs(want).max(), 1.0))
    assert (got >= 0).all() and (got <= 20.0).all()


def _stub_state_dict(cfg, num_tokens, seed=0):
    rng = np.random.RandomState(seed)
    return {k: (rng.randn(*shape) * 0.05).astype(np.float32)
            for k, shape in expected_state_dict_shapes(cfg, num_tokens).items()}


def test_named_loader_stub_checkpoint(tmp_path, monkeypatch):
    """--depth-model small reaches the weight file, loads through the original
    key contract, and yields a working depth callable (stub weights, tiny
    config monkeypatched in to keep the CPU forward fast)."""
    torch = pytest.importorskip("torch")
    from vivid_tpu.geometry import depth_anything
    from vivid_tpu.geometry.depth import resolve_depth_model

    monkeypatch.setitem(depth_anything.SIZES, "small", TINY)
    sd = {k: torch.as_tensor(v)
          for k, v in _stub_state_dict(TINY, num_tokens=26).items()}
    path = tmp_path / "depth_anything_v2_metric_hypersim_vits.pth"
    torch.save(sd, str(path))

    model = resolve_depth_model("small", weights_dir=str(tmp_path))
    x = np.random.RandomState(2).randn(1, 70, 70, 3).astype(np.float32)
    depth = np.asarray(model(jnp.asarray(x)))
    assert depth.shape == (1, 70, 70)
    assert np.isfinite(depth).all()
    assert (depth >= 0).all() and (depth <= TINY.max_depth).all()


def test_named_loader_missing_weights_error(tmp_path):
    from vivid_tpu.geometry.depth import resolve_depth_model
    with pytest.raises(FileNotFoundError, match="vitb"):
        resolve_depth_model("base", weights_dir=str(tmp_path))
    with pytest.raises(ValueError, match="Unknown depth model"):
        resolve_depth_model("huge", weights_dir=str(tmp_path))
    assert resolve_depth_model(None) is None
    f = lambda x: x
    assert resolve_depth_model(f) is f
