"""Device mesh + sharding helpers.

The reference's one parallelism strategy is data parallelism over NCCL DDP
(SURVEY.md §2.9). Here the same strategy — plus headroom for tensor/sequence
sharding — is expressed as a jax.sharding.Mesh:

  * axis "data"  — batch sharding (DDP equivalent); gradients are reduced by
    XLA-inserted psums when the loss is computed from a batch-sharded input.
  * axis "model" — reserved for tensor/sequence sharding of the attention and
    conv channel axes at larger scales (1 by default; all shardings below are
    written against it so widening the axis is a mesh-shape change only).
"""

from contextlib import contextmanager

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int = None, n_model: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model <= len(devices), (
        f"mesh {n_data}x{n_model} needs {n_data * n_model} devices, have {len(devices)}")
    grid = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis sharded over the data axis, everything else replicated."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Place per-process batch arrays with the leading axis sharded on 'data'.
    Single-process: a plain device_put. Multi-process: each process holds its
    local slice of the global batch, assembled with
    make_array_from_process_local_data (device_put would wrongly assume every
    process sees the global array)."""
    sh = batch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
        tree)


def replicate(mesh: Mesh, tree):
    sh = replicated(mesh)
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
    from jax.experimental import multihost_utils
    return jax.tree.map(
        lambda x: multihost_utils.host_local_array_to_global_array(
            np.asarray(x), mesh, P()),
        tree)


@contextmanager
def use_mesh(mesh: Mesh):
    with mesh:
        yield mesh
