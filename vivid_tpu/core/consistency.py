"""Cross-process consistency and numeric-hygiene checks.

TPU-native analogues of the reference's divergence detectors (SURVEY.md §5.2):
  * check_param_consistency — misc.check_ddp_consistency (torch_utils/misc.py:
    188-199): every process hashes its replicated param tree; hashes are
    gathered and compared. Run after checkpoint saves.
  * assert_finite — force_finite/NaN-guard counterpart for debugging
    (jax.config jax_debug_nans is the interactive alternative).
"""

import hashlib

import numpy as np
import jax


def tree_fingerprint(tree) -> str:
    """Deterministic content hash of a param pytree (leaf order + bytes)."""
    h = hashlib.sha256()
    leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
    for path, leaf in leaves:
        h.update(jax.tree_util.keystr(path).encode())
        h.update(np.ascontiguousarray(jax.device_get(leaf)).tobytes())
    return h.hexdigest()


def check_param_consistency(tree, name: str = "params") -> bool:
    """True when all processes hold byte-identical replicas of `tree`.
    Raises on divergence (the reference raises on mismatched DDP params)."""
    fp = tree_fingerprint(tree)
    if jax.process_count() == 1:
        return True
    from jax.experimental import multihost_utils
    digest = np.frombuffer(bytes.fromhex(fp), np.uint8)
    gathered = np.asarray(multihost_utils.process_allgather(digest))
    if not (gathered == gathered[0]).all():
        raise RuntimeError(
            f"Cross-process divergence detected in {name!r}: "
            f"{[bytes(g).hex()[:12] for g in gathered]}")
    return True


def assert_finite(tree, name: str = "tree"):
    """Raise if any leaf contains NaN/Inf (host-side debug check)."""
    bad = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(jax.device_get(leaf))
        if not np.isfinite(arr).all():
            bad.append(jax.tree_util.keystr(path))
    if bad:
        raise FloatingPointError(f"Non-finite values in {name}: {bad[:10]}")
    return True
