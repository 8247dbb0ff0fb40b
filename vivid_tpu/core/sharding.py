"""Device mesh + sharding helpers.

The reference's one parallelism strategy is data parallelism over NCCL DDP
(SURVEY.md §2.9). Here the mesh carries two axes and three strategies:

  * axis "data"  — batch sharding (DDP equivalent); gradients are reduced by
    XLA-inserted psums when the loss is computed from a batch-sharded input.
    `fsdp_shardings` additionally shards params/optimizer/EMA state over the
    same axis (ZeRO-3 style): XLA all-gathers weights at use and
    reduce-scatters gradients, cutting per-device state memory by the axis
    size.
  * axis "model" — tensor/sequence sharding of activations. `act_sharding`
    is a trace-time context: while active, the U-Net blocks pin attention
    heads (tensor parallel) and/or image rows (sequence/spatial parallel)
    to this axis via with_sharding_constraint, and GSPMD partitions the
    convs/einsums and inserts the collectives.
"""

from contextlib import contextmanager
from dataclasses import dataclass
from typing import Optional

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


# ---------------------------------------------------------------------------
# Activation sharding (tensor / sequence parallelism over the 'model' axis).

@dataclass(frozen=True)
class ActShardSpec:
    mesh: Mesh
    data: Optional[str] = "data"   # batch axis of activations
    tp: Optional[str] = None       # tensor parallel: attention heads + conv channels
    sp: Optional[str] = None       # sequence/spatial parallel: image rows


_ACT_SPEC = [None]


@contextmanager
def act_sharding(mesh: Mesh, data: Optional[str] = "data",
                 tp: Optional[str] = None, sp: Optional[str] = None):
    """Enable activation-sharding constraints inside the U-Net blocks.

    TRACE-TIME context: the constraints are baked in when a jitted function
    is first traced, which happens at its first CALL — build AND first-call
    jitted functions inside this context (a jit traced outside it will not
    pick the constraints up, and one traced inside keeps them forever).

    tp shards attention heads and conv channels over the named mesh axis
    (per-device FLOPs drop by the axis size; GSPMD inserts the psums for the
    channel contractions). sp shards image rows (GSPMD handles conv halo
    exchange). Dims that are not divisible by the axis size are silently
    left unsharded, so tiny levels degrade gracefully.
    """
    _ACT_SPEC.append(ActShardSpec(mesh, data, tp, sp))
    try:
        yield
    finally:
        _ACT_SPEC.pop()


def _usable(spec: ActShardSpec, name: Optional[str], dim: int) -> Optional[str]:
    if name is None:
        return None
    size = dict(zip(spec.mesh.axis_names, spec.mesh.devices.shape)).get(name, 1)
    if size <= 1 or dim % size != 0:
        return None
    return name


def act_spec_active() -> bool:
    """True while an act_sharding context is live (trace time). Kernels use
    this to fall back to GSPMD-partitionable XLA paths (packed-layout Pallas
    calls can't be partitioned over the channel/head axes)."""
    return _ACT_SPEC[-1] is not None


def tp_heads_axes(q):
    """(mesh, data_axis, tp_axis) when the active act_sharding context shards
    the head axis of [B, heads, S, D] attention inputs; None otherwise.
    Kernels dispatch on this: the Pallas flash custom call is not
    GSPMD-partitionable over heads, so fused_attention runs the kernel
    per-shard under shard_map on these axes (attention is independent per
    (batch, head) — no collectives). data_axis is None when the batch dim
    doesn't divide over the data axis."""
    spec = _ACT_SPEC[-1]
    if spec is None or _usable(spec, spec.tp, q.shape[1]) is None:
        return None
    return spec.mesh, _usable(spec, spec.data, q.shape[0]), spec.tp


def constrain(x, kind: str):
    """Pin an activation's sharding if an act_sharding context is active.

    kind='conv' : [B, H, W, C] -> P(data, sp, None, tp)
    kind='heads': [B, heads, S, D] -> P(data, tp, None, None)

    No-op outside a context, for non-rank-4 tensors, and when neither tp nor
    sp applies (pinning only the batch axis would just restate what GSPMD
    propagates from the sharded inputs)."""
    spec = _ACT_SPEC[-1]
    if spec is None or x.ndim != 4:
        return x
    if kind == "conv":
        parts = (_usable(spec, spec.data, x.shape[0]),
                 _usable(spec, spec.sp, x.shape[1]), None,
                 _usable(spec, spec.tp, x.shape[3]))
    elif kind == "heads":
        parts = (_usable(spec, spec.data, x.shape[0]),
                 _usable(spec, spec.tp, x.shape[1]), None, None)
    else:
        raise ValueError(f"unknown constraint kind {kind!r}")
    if all(p is None for p in parts[1:]):
        return x
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(spec.mesh, P(*parts)))


# ---------------------------------------------------------------------------
# FSDP / ZeRO-3: shard every train-state leaf over a mesh axis.

def fsdp_spec(shape, axis: str, size: int, min_size: int = 2 ** 13) -> P:
    """PartitionSpec sharding the largest axis-divisible dim of `shape` over
    `axis`; replicated for small or non-divisible leaves (scalars, gains,
    Fourier buffers)."""
    if int(np.prod(shape, initial=1)) < min_size:
        return P()
    cands = [(dim, i) for i, dim in enumerate(shape) if dim % size == 0 and dim >= size]
    if not cands:
        return P()
    _, i = max(cands)
    parts = [None] * len(shape)
    parts[i] = axis
    return P(*parts)


def fsdp_shardings(mesh: Mesh, tree, axis: str = "data", min_size: int = 2 ** 13):
    """Per-leaf NamedShardings for ZeRO-3-style state sharding. Apply the
    same tree to params, Adam moments and EMA trees so the whole train state
    shrinks by the axis size; XLA all-gathers weights where the forward needs
    them and reduce-scatters the gradients."""
    size = dict(zip(mesh.axis_names, mesh.devices.shape))[axis]
    return jax.tree.map(
        lambda x: NamedSharding(mesh, fsdp_spec(np.shape(x), axis, size, min_size)),
        tree)


def shard_tree(tree, shardings):
    """Place a host-side tree according to per-leaf shardings. Multi-process:
    every process holds the full value (params/optimizer state are built
    identically everywhere), so make_array_from_callback slices out the
    local shards."""
    if jax.process_count() == 1:
        return jax.tree.map(jax.device_put, tree, shardings)
    return jax.tree.map(
        lambda x, s: jax.make_array_from_callback(
            np.shape(x), s, lambda idx, _x=x: np.asarray(_x)[idx]),
        tree, shardings)


_UNSHARD_CACHE = {}


def unshard_tree(mesh: Mesh, tree):
    """Reshard a (possibly FSDP-sharded) tree to fully-replicated — a
    compiled all-gather, valid in multi-process runs — so hosts can read the
    leaves (snapshots, checkpoints, consistency checks). The compiled
    gather is cached per (mesh, tree structure) so periodic saves don't
    recompile."""
    leaves, treedef = jax.tree.flatten(tree)
    key = (mesh, treedef, tuple((x.shape, str(x.dtype)) for x in leaves))
    fn = _UNSHARD_CACHE.get(key)
    if fn is None:
        sh = [NamedSharding(mesh, P())] * len(leaves)
        fn = jax.jit(lambda ls: ls, out_shardings=sh)
        _UNSHARD_CACHE[key] = fn
    return jax.tree.unflatten(treedef, fn(leaves))
