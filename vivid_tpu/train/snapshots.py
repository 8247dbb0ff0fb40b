"""Inference snapshot artifacts.

Parity surface: the reference's `network-snapshot-*{-std}.pkl` files
(training_loop.py:485-496) — self-contained inference artifacts holding the
EMA weights plus everything needed to rebuild the model. The reference
embeds executable source via torch persistence; here a snapshot is a plain
pickle of numpy arrays + a dataclass config dict: portable, no code
execution on load (reading the reference's torch pickles is handled
separately by vivid_tpu.compat.torch_pickle).
"""

import dataclasses
import os
import pickle
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from vivid_tpu.core.easydict import EasyDict
from vivid_tpu.nn.precond import PrecondConfig

SNAPSHOT_FORMAT = "vivid_tpu.snapshot.v1"


def _to_numpy(tree, dtype=None):
    def conv(x):
        arr = np.asarray(jax.device_get(x))
        if dtype is not None and arr.dtype == np.float32:
            arr = arr.astype(dtype)
        return arr
    return jax.tree.map(conv, tree)


def save_snapshot(path: str, params, model_cfg: PrecondConfig,
                  encoder_name: str = "vivid_tpu.data.encoders.StandardRGBEncoder",
                  dataset_kwargs: Optional[dict] = None,
                  loss_kwargs: Optional[dict] = None,
                  half: bool = True):
    """Write an inference snapshot. Weights stored fp16 like the reference
    (training_loop.py:490) unless half=False."""
    data = dict(
        format=SNAPSHOT_FORMAT,
        ema=_to_numpy(params, np.float16 if half else None),
        model_cfg=dataclasses.asdict(model_cfg),
        encoder=encoder_name,
        dataset_kwargs=dict(dataset_kwargs or {}),
        loss_kwargs=dict(loss_kwargs or {}),
    )
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(data, f)
    os.replace(tmp, path)


def load_snapshot(path: str) -> EasyDict:
    """Load a snapshot -> EasyDict(params fp32 device arrays, cfg, encoder,
    dataset_kwargs, loss_kwargs). Torch-reference pickles are detected and
    routed through the compat importer."""
    with open(path, "rb") as f:
        head = f.read(2)
    if head != b"\x80\x04" and head[:1] != b"\x80":
        raise ValueError(f"{path!r} is not a pickle")
    try:
        with open(path, "rb") as f:
            data = pickle.load(f)
    except Exception:
        data = None
    if not (isinstance(data, dict) and data.get("format") == SNAPSHOT_FORMAT):
        from vivid_tpu.compat.torch_pickle import load_reference_pickle
        return load_reference_pickle(path)
    cfg_dict = dict(data["model_cfg"])
    for k in ("channel_mult", "attn_resolutions", "ema_stds"):
        if k in cfg_dict and isinstance(cfg_dict[k], list):
            cfg_dict[k] = tuple(cfg_dict[k])
    cfg = PrecondConfig(**cfg_dict)
    params = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), data["ema"])
    return EasyDict(params=params, cfg=cfg, encoder=data.get("encoder"),
                    dataset_kwargs=data.get("dataset_kwargs", {}),
                    loss_kwargs=data.get("loss_kwargs", {}))


def resolve_model(model, name: str = "network"):
    """Path/snapshot-dict passthrough resolver (training/utils.py:219-229
    analogue): str -> load_snapshot, EasyDict/None -> unchanged."""
    if isinstance(model, str):
        from vivid_tpu.core import dist
        dist.print0(f"Loading {name} from {model} ...")
        return load_snapshot(model)
    return model
