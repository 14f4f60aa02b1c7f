"""Tiled pose-bin assignment kernel: argmin_k ||y_i - c_k||^2.

The dictionary lookup at the heart of every bin-delta target transform and
of kmeans dictionary learning (binDeltaGenerators.py:27, sklearn
kmeans.predict on host in the reference). For N poses against K atoms the
cross term is one (N, K) matmul on the MXU; this kernel tiles N so
arbitrarily large pose sets stream through VMEM in one pass, fusing the
distance computation with the argmin (no (N, K) distance matrix ever hits
HBM — the XLA fallback materializes it).

Pose dims are tiny (3 or 4), so the FLOPs are trivial; the win is the
single streaming pass for dictionary-learning-scale N (millions of render
poses, learnKmeansDictionary.py:30-37).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _kernel(y_ref, ct_ref, c2_ref, out_ref):
    y = y_ref[:]  # (tile, D)
    ct = ct_ref[:]  # (D, K) centers transposed
    c2 = c2_ref[:]  # (1, K) squared norms
    # ||y - c||^2 = |y|^2 - 2 y.c + |c|^2; |y|^2 is constant per row for
    # the argmin, so rank by |c|^2 - 2 y.c only
    cross = jnp.dot(y, ct, preferred_element_type=jnp.float32)  # (tile, K)
    d = c2 - 2.0 * cross
    out_ref[:] = jnp.argmin(d, axis=-1).astype(jnp.int32)[:, None]


@functools.partial(jax.jit, static_argnames=("row_tile",))
def _pallas_assign(y: jax.Array, centers: jax.Array, row_tile: int = 1024):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, d = y.shape
    k = centers.shape[0]
    ct = centers.T.astype(jnp.float32)  # (D, K)
    c2 = jnp.sum(centers * centers, axis=-1).astype(jnp.float32)[None, :]
    tile = min(row_tile, n)
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((n, 1), jnp.int32),
        grid=(pl.cdiv(n, tile),),
        in_specs=[
            pl.BlockSpec((tile, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(y.astype(jnp.float32), ct, c2)
    return out[:, 0]


def assign_bins_pallas(
    y: jax.Array, centers: jax.Array, use_pallas: bool | None = None
) -> jax.Array:
    """Rows of y (N, D) -> nearest-center indices (N,) int32."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if not use_pallas:
        from multi_modal_regression_tpu.data.targets import pairwise_sqeuclidean

        return jnp.argmin(pairwise_sqeuclidean(y, centers), axis=-1).astype(
            jnp.int32
        )
    return _pallas_assign(y, centers)
