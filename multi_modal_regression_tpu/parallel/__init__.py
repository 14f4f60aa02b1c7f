"""Device-mesh / sharding helpers (SPMD via jit over a Mesh)."""

from multi_modal_regression_tpu.parallel.tp import (
    make_2d_mesh,
    shard_batch_2d,
    shard_state,
    state_shardings,
)
from multi_modal_regression_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
)

__all__ = [
    "make_2d_mesh",
    "shard_batch_2d",
    "shard_state",
    "state_shardings",
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
]
