"""Config-by-name object construction.

The reference crosses every layer boundary through string class names resolved
at use-site (dnnlib/util.py:232-321). We keep that public surface (configs are
JSON-serializable), but back it with an explicit registry first and a guarded
module-path import as fallback — so configs remain portable across the rename
from the torch tree to this package.
"""

import importlib
import types
from typing import Any, Callable, Dict

_REGISTRY: Dict[str, Any] = {}

# Map reference-era class paths onto this package so that configs written for
# the PyTorch tree (training_options.json artifacts) resolve here unchanged.
_ALIASES = {
    "training.models.NVPrecond": "vivid_tpu.nn.precond.NVPrecond",
    "training.encoders.StandardRGBEncoder": "vivid_tpu.data.encoders.StandardRGBEncoder",
    "training.training_loop.NVLoss": "vivid_tpu.diffusion.loss.NVLoss",
    "training.training_loop.SRNVLoss": "vivid_tpu.diffusion.loss.SRNVLoss",
    "training.training_loop.learning_rate_schedule": "vivid_tpu.diffusion.lr.learning_rate_schedule",
    "training.phema.PowerFunctionEMA": "vivid_tpu.diffusion.phema.PowerFunctionEMA",
    "training.phema.TraditionalEMA": "vivid_tpu.diffusion.phema.TraditionalEMA",
    "datautils.RealEstate10K": "vivid_tpu.data.re10k.RealEstate10K",
}


def register(name: str = None):
    """Decorator: register a class/function under an explicit config name."""

    def deco(obj):
        _REGISTRY[name or f"{obj.__module__}.{obj.__qualname__}"] = obj
        return obj

    return deco


def get_obj_by_name(name: str) -> Any:
    if not isinstance(name, str):
        return name  # already an object
    name = _ALIASES.get(name, name)
    if name in _REGISTRY:
        return _REGISTRY[name]
    parts = name.split(".")
    for split in range(len(parts) - 1, 0, -1):
        module_name = ".".join(parts[:split])
        attr_path = parts[split:]
        try:
            module = importlib.import_module(module_name)
        except ImportError:
            continue
        obj: Any = module
        try:
            for attr in attr_path:
                obj = getattr(obj, attr)
        except AttributeError:
            continue
        return obj
    raise ImportError(f"Cannot resolve object by name: {name!r}")


def construct_class_by_name(*args, class_name: str = None, **kwargs) -> Any:
    return get_obj_by_name(class_name)(*args, **kwargs)


def call_func_by_name(*args, func_name: str = None, **kwargs) -> Any:
    fn = get_obj_by_name(func_name)
    assert callable(fn), f"{func_name!r} is not callable"
    return fn(*args, **kwargs)
