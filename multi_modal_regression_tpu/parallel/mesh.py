"""Device mesh construction and sharding rules.

The reference is single-GPU (CUDA_VISIBLE_DEVICES binding,
learnGeodesicBDModel.py:47-48) with no distributed story. Here scaling is
SPMD-native: a 1-D `data` mesh over all local devices (ICI within a pod
slice), params replicated, the image batch sharded on its leading axis.
XLA inserts the gradient psum — there is no NCCL/MPI analog to manage.

The class-balanced batch layout (items x classes concatenated) is sharded
by whole items when possible so each device sees entire class-balanced
groups; any batch whose leading dim divides the mesh size works.
"""

from __future__ import annotations

from typing import Any, Mapping

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, axis_name: str = "data") -> Mesh:
    """A 1-D data-parallel mesh over the given (default: all) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) axis across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    """Fully replicated (params / scalars)."""
    return NamedSharding(mesh, P())


def shard_batch(batch: Mapping[str, Any], mesh: Mesh, axis_name: str = "data"):
    """Device-put a host batch dict with the leading axis sharded.

    Batches whose leading dim is not divisible by the mesh size (e.g. a tiny
    debug batch on an 8-way mesh) are replicated instead — correctness over
    speed for the odd case; real training batches divide by design.
    """
    n = mesh.shape[axis_name]
    sharded = batch_sharding(mesh, axis_name)
    replicated = replicated_sharding(mesh)

    def spec(v):
        return sharded if np.shape(v)[0] % n == 0 else replicated

    # one device_put for the whole dict (one dispatch, not one per key —
    # per-dispatch latency is milliseconds through a TPU tunnel), skipping
    # values already resident with the right sharding
    todo = {
        k: v
        for k, v in batch.items()
        if not (isinstance(v, jax.Array) and v.sharding == spec(v))
    }
    out = dict(batch)
    if todo:
        out.update(jax.device_put(todo, {k: spec(v) for k, v in todo.items()}))
    return out
