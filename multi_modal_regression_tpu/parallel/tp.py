"""Tensor-parallel sharding of the per-class head banks.

The bin/delta head banks are block-diagonal over classes — (H, in, out)
parameter stacks applied with one einsum (models.heads.MultiHeadMLP). They
are embarrassingly shardable on the head axis (SURVEY.md §2.4): on a
('data', 'model') mesh, each model-slice holds H/n_model heads, the shared
backbone features are replicated across the model axis, and XLA inserts
the (tiny: selected outputs only) collectives. The backbone itself stays
data-parallel — its weights are replicated, its batch sharded on 'data'.

Use: mesh = make_2d_mesh(n_data, n_model); state = shard_state(state, mesh).
The jitted train step then runs dp x tp with no code changes — sharding
propagates from the input shardings.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# param subtrees whose leading axis is a head/bank axis
HEAD_BANK_NAMES = ("bin_models", "res_models", "pose_models")


def make_2d_mesh(
    n_data: int, n_model: int, devices=None
) -> Mesh:
    """A ('data', 'model') mesh of n_data x n_model devices."""
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(devices, ("data", "model"))


def _head_leaf_spec(path: tuple, leaf, n_model: int) -> P:
    names = [getattr(p, "key", getattr(p, "name", None)) for p in path]
    in_bank = any(n in HEAD_BANK_NAMES for n in names if n)
    if (
        in_bank
        and np.ndim(leaf) >= 1
        and np.shape(leaf)[0] % n_model == 0
    ):
        # leading axis is the head axis for every leaf in a bank
        # (kernels (H, I, O), biases (H, O), BN scale/bias/stats (H, F));
        # banks whose head count doesn't divide the axis stay replicated
        return P("model", *([None] * (np.ndim(leaf) - 1)))
    return P()


def state_shardings(state: Any, mesh: Mesh):
    """NamedSharding tree for a TrainState: head banks split on 'model'
    (wherever they appear — params, optimizer moments, batch stats),
    everything else replicated."""
    if "model" not in mesh.axis_names:
        return jax.tree.map(lambda _: NamedSharding(mesh, P()), state)
    n_model = mesh.shape["model"]
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(
            mesh, _head_leaf_spec(path, leaf, n_model)
        ),
        state,
    )


def shard_state(state: Any, mesh: Mesh):
    """Device-put a TrainState with head-bank tensor parallelism."""
    return jax.device_put(state, state_shardings(state, mesh))


def shard_batch_2d(batch: dict, mesh: Mesh) -> dict:
    """Shard the batch on 'data', replicated across 'model' (one dispatch
    for the whole dict; already-resident arrays are passed through)."""
    n = mesh.shape["data"]

    def sharding(v):
        spec = P("data") if np.shape(v)[0] % n == 0 else P()
        return NamedSharding(mesh, spec)

    todo = {
        k: v
        for k, v in batch.items()
        if not (isinstance(v, jax.Array) and v.sharding == sharding(v))
    }
    out = dict(batch)
    if todo:
        out.update(
            jax.device_put(todo, {k: sharding(v) for k, v in todo.items()})
        )
    return out
