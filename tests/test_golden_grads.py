"""Golden gradient parity: torch autograd through the reference NVPrecond vs
jax.grad through this framework, with compat-mapped weights and identical
inputs — validates the full backward/training-signal path."""

import os
import sys
import types

import numpy as np
import pytest

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "training")),
    reason="reference tree not mounted")


@pytest.fixture(scope="module")
def ref_models():
    for name in ["kornia", "kornia.geometry", "kornia.geometry.transform",
                 "kornia.geometry.conversions", "litdata",
                 "torchvision", "torchvision.transforms",
                 "torchvision.transforms.functional", "torchvision.utils"]:
        sys.modules.setdefault(name, types.ModuleType(name))
    sys.modules["kornia"].geometry = sys.modules["kornia.geometry"]
    sys.modules["kornia.geometry"].transform = sys.modules["kornia.geometry.transform"]
    sys.modules["kornia.geometry.transform"].resize = lambda *a, **k: None
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    from training import models
    return models


def test_gradient_golden_parity(ref_models):
    import torch
    import jax
    import jax.numpy as jnp
    from vivid_tpu.compat.torch_pickle import map_torch_state
    from vivid_tpu.nn.precond import PrecondConfig, precond_apply

    torch.manual_seed(0)
    net = ref_models.NVPrecond(
        img_resolution=16, img_channels=3, source_label_dim=20,
        target_label_dim=40, use_fp16=False, model_channels=16,
        channel_mult=[1, 2], num_blocks=1, attn_resolutions=[8],
        channels_per_head=8).train()
    tree = map_torch_state(
        {k: v.detach().numpy() for k, v in net.named_parameters()},
        {k: v.detach().numpy() for k, v in net.named_buffers()})
    params = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), tree)
    cfg = PrecondConfig(img_resolution=16, num_sources=2, use_bf16=False,
                        remat=False, model_channels=16, channel_mult=(1, 2),
                        num_blocks=1, attn_resolutions=(8,), channels_per_head=8)

    rng = np.random.RandomState(0)
    B = 2
    src = rng.randn(B, 2, 3, 16, 16).astype(np.float32)
    dst = rng.randn(B, 3, 16, 16).astype(np.float32)
    sigma = np.exp(rng.randn(B).astype(np.float32) * 0.5)
    geometry = (rng.randn(B, 2, 20) * 0.3).astype(np.float32)
    ct = rng.randn(B, 3, 16, 16).astype(np.float32)  # fixed cotangent

    # --- torch side: scalar loss = sum(D_x * ct), grads via autograd.
    src_t = torch.tensor(src.reshape(B * 2, 3, 16, 16))
    d_out = net(src_t, torch.tensor(np.repeat(dst, 2, 0)),
                torch.tensor(np.repeat(sigma, 2, 0)),
                torch.tensor(geometry.reshape(B * 2, 20)))
    loss_t = (d_out * torch.tensor(ct)).sum()
    loss_t.backward()
    torch_grads = {k: (p.grad.numpy() if p.grad is not None else None)
                   for k, p in net.named_parameters()}

    # --- jax side: same scalar through precond_apply.
    ct_j = jnp.asarray(ct.transpose(0, 2, 3, 1))

    def loss_fn(p):
        d = precond_apply(p, cfg, jnp.asarray(src.transpose(0, 1, 3, 4, 2)),
                          jnp.asarray(dst.transpose(0, 2, 3, 1)),
                          jnp.asarray(sigma), jnp.asarray(geometry),
                          force_fp32=True)
        return jnp.sum(d * ct_j)

    jax_grads = jax.grad(loss_fn)(params)
    mapped_jax = map_grads_to_torch_names(jax_grads)

    checked = 0
    worst = (0.0, None)
    for name, g_t in torch_grads.items():
        if g_t is None:
            continue
        g_j = mapped_jax.get(name)
        assert g_j is not None, f"missing jax grad for {name}"
        denom = max(float(np.abs(g_t).max()), 1e-6)
        rel = float(np.abs(g_j - g_t).max()) / denom
        if rel > worst[0]:
            worst = (rel, name)
        checked += 1
    assert checked > 50
    assert worst[0] < 1e-2, f"worst grad rel-diff {worst[0]:.2e} at {worst[1]}"


def map_grads_to_torch_names(tree):
    """Flatten the jax grad tree back into torch parameter names/layouts."""
    out = {}

    def walk(node, prefix):
        for k, v in node.items():
            name = k.replace("/", ".")
            if isinstance(v, dict):
                walk(v, prefix + name + ".")
            else:
                arr = np.asarray(v)
                if k == "w":
                    leaf = prefix[:-1] + ".weight"
                    if arr.ndim == 4:
                        arr = arr.transpose(3, 2, 0, 1)  # HWIO -> OIHW
                    elif arr.ndim == 2:
                        arr = arr.transpose(1, 0)
                    out[leaf] = arr
                else:
                    out[prefix + name] = arr

    walk(tree, "")
    return out
