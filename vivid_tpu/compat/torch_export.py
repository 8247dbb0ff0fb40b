"""Exporter: vivid_tpu param pytree -> reference-format torch snapshot.

The inverse of `compat.torch_pickle`: takes this framework's (params, cfg)
and writes a `network-snapshot-*.pkl` the REFERENCE consumes unmodified —
`pickle.load` + `data['ema'].to(device)` in its generate_images.py:168-171.
The pickle is produced by instantiating the reference's own
`training.models.NVPrecond` (its `@persistence.persistent_class` decorator
embeds the defining source into the pickle, torch_utils/persistence.py), so
the artifact is byte-format-identical to reference training snapshots and
portable to any machine with torch — the reference package is needed only at
EXPORT time, supplied via `reference_root`.

Use case: train on TPU with this framework, hand the EMA snapshot to an
existing reference/GPU serving deployment (or load it back through
`compat.torch_pickle.load_reference_pickle` — round-trip tested).

Weight grammar is the exact inverse of torch_pickle.map_torch_state:
  encoder/enc/64x64_block0/conv_res0/w -> encoder.enc.64x64_block0.conv_res0.weight
  HWIO -> OIHW for 4-d convs, [in,out] -> [out,in] for 2-d linears,
  gains/Fourier buffers pass through unchanged.
"""

import pickle
import sys
import types
from typing import Dict, Optional

import click
import numpy as np


# ---------------------------------------------------------------------------
# Importing the reference package (export-time only).

_REF_STUBS = [
    "kornia", "kornia.geometry", "kornia.geometry.transform",
    "kornia.geometry.conversions", "litdata",
    "torchvision", "torchvision.transforms",
    "torchvision.transforms.functional", "torchvision.utils",
    "wandb", "fvcore", "fvcore.nn",
]


def _install_stubs():
    """Attribute-tolerant stubs for the reference's unavailable heavy deps
    (kornia/litdata/torchvision/wandb/fvcore — none used by model/encoder/
    loss construction). Returns the names actually inserted so the caller
    can remove them again: leaving e.g. a fake `wandb` in sys.modules would
    shadow a real later `import wandb` for the rest of the process."""
    from vivid_tpu.compat.torch_pickle import _stub_module
    inserted = []
    for name in _REF_STUBS:
        if name not in sys.modules:
            sys.modules[name] = _stub_module(name)
            inserted.append(name)
    sys.modules["kornia"].geometry = sys.modules["kornia.geometry"]
    sys.modules["kornia.geometry"].transform = sys.modules["kornia.geometry.transform"]
    sys.modules["kornia.geometry.transform"].resize = lambda *a, **k: None
    return inserted


def import_reference(root: str, module: str = "training.models"):
    """Import a reference module from a checkout at `root`, stubbing its
    unavailable heavy deps only for the duration of the import (the imported
    module keeps its own references to any stubs it bound; sys.modules is
    restored so unrelated code sees genuine packages). Returns the module."""
    import importlib
    import os
    if not os.path.isdir(os.path.join(root, "training")):
        raise FileNotFoundError(
            f"reference checkout not found at {root!r} (need training/models.py); "
            "pass reference_root= pointing at a danielcodelavin/vivid checkout")
    inserted = _install_stubs()
    if root not in sys.path:
        sys.path.insert(0, root)
    try:
        return importlib.import_module(module)
    finally:
        for name in inserted:
            sys.modules.pop(name, None)


# ---------------------------------------------------------------------------
# Inverse name/layout mapping.

def tree_to_torch_state(params) -> Dict[str, np.ndarray]:
    """Flatten a vivid_tpu param pytree into reference torch state-dict names
    and layouts (inverse of torch_pickle.map_torch_state)."""
    out: Dict[str, np.ndarray] = {}

    def walk(node, prefix):
        for k, v in node.items():
            name = k.replace("/", ".")
            if isinstance(v, dict):
                walk(v, prefix + name + ".")
                continue
            arr = np.asarray(v, np.float32)
            if k == "w":
                if arr.ndim == 4:
                    arr = arr.transpose(3, 2, 0, 1)          # HWIO -> OIHW
                elif arr.ndim == 2:
                    arr = arr.transpose(1, 0)                # [in,out] -> [out,in]
                out[prefix + "weight"] = arr
            else:
                out[prefix + name] = arr

    walk(params, "")
    return out


def config_to_init_kwargs(cfg) -> dict:
    """PrecondConfig -> the reference NVPrecond's __init__ kwargs
    (models.py:590-606 signature; UNet/Block kwargs ride **unet_kwargs)."""
    return dict(
        img_resolution=cfg.img_resolution,
        img_channels=cfg.img_channels,
        source_label_dim=cfg.source_label_dim,
        target_label_dim=cfg.target_label_dim,
        use_fp16=bool(cfg.use_bf16),          # bf16 here <-> fp16 there
        sigma_data=cfg.sigma_data,
        logvar_channels=cfg.logvar_channels,
        super_res=cfg.super_res,
        no_time_enc=cfg.no_time_enc,
        depth_input=cfg.depth_input,
        warp_depth_coor=cfg.warp_depth_coor,
        uncond=cfg.uncond,
        noisy_sr=cfg.noisy_sr,
        model_channels=cfg.model_channels,
        channel_mult=list(cfg.channel_mult),
        channel_mult_noise=cfg.channel_mult_noise,
        channel_mult_emb=cfg.channel_mult_emb,
        num_blocks=cfg.num_blocks,
        attn_resolutions=list(cfg.attn_resolutions),
        extra_attn=cfg.extra_attn,
        epipolar_attention_bias=cfg.epipolar_attention_bias,
        channels_per_head=cfg.channels_per_head,
        dropout=cfg.dropout,
    )


def build_reference_net(params, cfg, reference_root: str):
    """Instantiate the reference NVPrecond for `cfg` and load our weights
    into it. Returns the torch module (fp32, eval mode, CPU)."""
    import torch
    models = import_reference(reference_root)
    net = models.NVPrecond(**config_to_init_kwargs(cfg))
    state = tree_to_torch_state(params)
    want = net.state_dict()
    missing = sorted(set(want) - set(state))
    extra = sorted(set(state) - set(want))
    if missing or extra:
        raise ValueError(
            f"param tree does not cover the reference net: missing "
            f"{missing[:8]}{'...' if len(missing) > 8 else ''}, "
            f"unexpected {extra[:8]}{'...' if len(extra) > 8 else ''}")
    for k, arr in state.items():
        if tuple(want[k].shape) != arr.shape:
            raise ValueError(f"shape mismatch at {k}: ours {arr.shape}, "
                             f"reference {tuple(want[k].shape)}")
    net.load_state_dict({k: torch.from_numpy(v.copy()) for k, v in state.items()})
    return net.eval().requires_grad_(False)


def build_reference_aux(cfg, reference_root: str,
                        loss_kwargs: Optional[dict] = None):
    """Instantiate the reference's own encoder and loss objects (both
    @persistent_class, so pickling them embeds their defining source like
    genuine reference snapshots do). Returns (encoder, loss_fn)."""
    encoders = import_reference(reference_root, "training.encoders")
    tl = import_reference(reference_root, "training.training_loop")
    encoder = encoders.StandardRGBEncoder()
    loss_cls = tl.SRNVLoss if cfg.super_res else tl.NVLoss
    kw = {k: v for k, v in dict(loss_kwargs or {}).items()
          if k in ("P_mean", "P_std", "sigma_data")}
    return encoder, loss_cls(**kw)


def export_reference_pickle(path: str, params, cfg, reference_root: str,
                            dataset_kwargs: Optional[dict] = None,
                            loss_kwargs: Optional[dict] = None,
                            fp16: bool = True, embed_aux: bool = True) -> str:
    """Write a reference-format snapshot pickle at `path`.

    Mirrors the reference's own snapshot writer (training_loop.py:489-494):
    dict(encoder=<StandardRGBEncoder>, dataset_kwargs=..., loss_fn=<NVLoss/
    SRNVLoss>, ema=<net>), with the EMA net stored fp16 (fp16=False keeps
    fp32 — larger but lossless; the round-trip tests use it). With
    embed_aux=False the encoder/loss_fn entries are None — still safe for
    the reference loader, which constructs StandardRGBEncoder when the entry
    is absent/None (generate_images.py:170-173) — but a reference-side
    consumer that reads loss_fn would miss it."""
    import torch
    net = build_reference_net(params, cfg, reference_root)
    if fp16:
        net = net.to(torch.float16)
    encoder = loss_fn = None
    if embed_aux:
        encoder, loss_fn = build_reference_aux(cfg, reference_root,
                                               loss_kwargs)
    data = dict(encoder=encoder, dataset_kwargs=dict(dataset_kwargs or {}),
                loss_fn=loss_fn, ema=net)
    with open(path, "wb") as f:
        pickle.dump(data, f)
    return path


@click.command(help="Convert a vivid_tpu training snapshot into a "
                    "reference-format torch pickle: "
                    "python -m vivid_tpu.compat.torch_export IN.pkl OUT.pkl")
@click.argument("snapshot", type=click.Path(exists=True, dir_okay=False))
@click.argument("out", type=click.Path(dir_okay=False))
@click.option("--reference-root", default="/root/reference",
              help="Path to a danielcodelavin/vivid checkout (needed at "
                   "export time only; the output pickle is standalone).",
              show_default=True)
@click.option("--fp16/--fp32", default=True, show_default=True,
              help="Store weights fp16 like reference snapshots.")
def cmdline(snapshot, out, reference_root, fp16):
    # Pure host-side conversion: don't initialize a TPU backend (the remote
    # tunnel adds minutes of startup for zero benefit here).
    import jax
    try:
        jax.config.update("jax_platforms", "cpu")
    except RuntimeError:
        pass  # backend already initialized by the calling process
    from vivid_tpu.train.snapshots import load_snapshot
    data = load_snapshot(snapshot)
    export_reference_pickle(out, data.params, data.cfg,
                            reference_root=reference_root,
                            dataset_kwargs=data.dataset_kwargs,
                            loss_kwargs=getattr(data, "loss_kwargs", None),
                            fp16=fp16)
    click.echo(f"Wrote reference-format snapshot: {out}")


if __name__ == "__main__":
    cmdline()
