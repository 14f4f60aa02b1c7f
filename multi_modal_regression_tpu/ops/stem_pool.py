"""Fused ResNet stem tail: BatchNorm-affine + ReLU + 3x3/2 max-pool.

The reference stem (featureModels.py via torchvision: conv7x7/2 -> BN ->
ReLU -> MaxPool3x3/2) leaves XLA with four HBM passes over the (B, 112,
112, 64) stem activation in forward and a select_and_scatter plus separate
BN/relu backward passes in reverse (xplane profile, BASELINE.md round 2).
These kernels do each direction in ONE pass over the stem tensor:

  forward:   p = maxpool3x3/2(relu(y * a + b))     (read y, write p)
  backward:  dy = route(g) * relu_mask * a          (read g+y, write dy)
             da, db accumulated on the fly

`a, b` are the folded BN affine (ops.fused_conv_bn.fold_bn); batch
statistics are computed by the caller with one XLA reduce over y (they are
needed before the affine, so that pass is irreducible).

Pooling is decomposed per axis: the H axis is an outer (untiled) dim, so
stride-2 3-windows reduce to a pair-max (free outer-dim reshape) plus one
rolled previous-odd-row max; the W axis is handled identically after an
in-VMEM transpose. Padding contributes zeros, which is exact here because
the pool input is post-ReLU (all values >= 0) and no 3x3 window is fully
padding. The backward routes gradients by value equality against the
recomputed pooled maxima with FIRST-MATCH tie-breaking along each axis
(matching select_and_scatter's scan order per axis); the only residual
deviation is a positive bf16 tie appearing in two different window
columns, where the factorized column-then-row order can pick a different
— equally valid — argmax than the row-major scan. Zero maxima route
nowhere because the ReLU mask multiplies afterwards.

Gradient checks against the XLA composite (lax.reduce_window +
autodiff select_and_scatter) are in tests/test_stem_pool.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

pl = None
pltpu = None


def _ensure_pallas():
    global pl, pltpu
    if pl is None:
        from jax.experimental import pallas as _pl
        from jax.experimental.pallas import tpu as _pltpu

        globals()["pl"] = _pl
        globals()["pltpu"] = _pltpu


def _shift_down(x):
    """x[:, i] <- x[:, i-1] along axis 1, zero-filling row 0 (Mosaic has no
    bf16 rotate on v5e; axis 1 is an outer dim so slice+concat is free)."""
    pad = jnp.zeros_like(x[:, :1])
    return jnp.concatenate([pad, x[:, :-1]], axis=1)


def _shift_up(x):
    """x[:, i] <- x[:, i+1] along axis 1, zero-filling the last row."""
    pad = jnp.zeros_like(x[:, :1])
    return jnp.concatenate([x[:, 1:], pad], axis=1)


def _pool_axis1(z):
    """(bt, 2N, W, C) -> (bt, N, W, C): stride-2 size-3 max over axis 1,
    zero-padded (valid for non-negative inputs)."""
    bt, h2, w, c = z.shape
    n = h2 // 2
    zv = z.reshape(bt, n, 2, w, c)
    pmax = jnp.maximum(zv[:, :, 0], zv[:, :, 1])  # rows 2i, 2i+1
    odd = zv[:, :, 1]                             # rows 2i+1
    prev = _shift_down(odd)                       # rows 2i-1 (0 at i=0)
    return jnp.maximum(pmax, prev), (zv, pmax, odd, prev)


def _pool_axis1_bwd(g, aux):
    """Gradient of _pool_axis1 by value equality (see module docstring)."""
    zv, pmax, odd, prev = aux
    out = jnp.maximum(pmax, prev)
    gf = g.astype(jnp.float32)
    # first-match tie-breaking in window order (row 2i-1, then 2i, then
    # 2i+1), matching select_and_scatter's scan order along this axis
    prev_wins = _eq(prev, out)
    g_prev = jnp.where(prev_wins, gf, 0.0)
    g_pmax = jnp.where(prev_wins, 0.0, jnp.where(_eq(pmax, out), gf, 0.0))
    # un-shift: position i of prev came from odd[i-1]
    g_odd_from_prev = _shift_up(g_prev)
    first_wins = _eq(zv[:, :, 0], pmax)
    g0 = jnp.where(first_wins, g_pmax, 0.0)
    g1 = jnp.where(first_wins, 0.0, g_pmax) + g_odd_from_prev
    gz = jnp.stack([g0, g1], axis=2)  # (bt, n, 2, w, c) f32
    bt, nn, _, w, c = gz.shape
    return gz.reshape(bt, 2 * nn, w, c)


def _eq(x, y):
    # v5e Mosaic has no bf16 comparison: compare in f32
    return x.astype(jnp.float32) == y.astype(jnp.float32)


def _fwd_kernel(y_ref, ab_ref, p_ref):
    y = y_ref[...]
    ab = ab_ref[...].astype(y.dtype)
    z = jnp.maximum(y * ab[0] + ab[1], jnp.zeros((), y.dtype))
    vert, _ = _pool_axis1(z)                      # (bt, H/2, W, C)
    vt = jnp.transpose(vert, (0, 2, 1, 3))        # (bt, W, H/2, C)
    hv, _ = _pool_axis1(vt)                       # (bt, W/2, H/2, C)
    p_ref[...] = jnp.transpose(hv, (0, 2, 1, 3))  # (bt, H/2, W/2, C)


def _bwd_kernel(g_ref, y_ref, ab_ref, dy_ref, dab_ref, dab_acc):
    i = pl.program_id(0)
    y = y_ref[...]
    ab = ab_ref[...]
    abv = ab.astype(y.dtype)
    z = jnp.maximum(y * abv[0] + abv[1], jnp.zeros((), y.dtype))
    vert, aux_v = _pool_axis1(z)
    vt = jnp.transpose(vert, (0, 2, 1, 3))
    hv, aux_h = _pool_axis1(vt)
    g = jnp.transpose(g_ref[...], (0, 2, 1, 3))   # to (bt, W/2, H/2, C)
    g_vt = _pool_axis1_bwd(g, aux_h)              # (bt, W, H/2, C) f32
    g_vert = jnp.transpose(g_vt, (0, 2, 1, 3)).astype(jnp.bfloat16)
    gz = _pool_axis1_bwd(g_vert, aux_v)           # (bt, H, W, C) f32
    # relu + affine backward (mask from the same bf16 affine as forward)
    pre = (y * abv[0] + abv[1]).astype(jnp.float32)
    gz = jnp.where(pre > 0.0, gz, 0.0)
    dy_ref[...] = (gz * ab[0]).astype(dy_ref.dtype)

    @pl.when(i == 0)
    def _():
        dab_acc[...] = jnp.zeros_like(dab_acc)

    dab_acc[0:1, :] += jnp.sum(
        gz * y.astype(jnp.float32), axis=(0, 1, 2)
    )[None]
    dab_acc[1:2, :] += jnp.sum(gz, axis=(0, 1, 2))[None]

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        dab_ref[...] = dab_acc[...]


def _pick_bt(bsz: int, tile_bytes: int, budget: int) -> int:
    """Largest batch tile whose working set stays within `budget` (the
    kernels hold ~12-16 tile-sized live values incl. f32 temps; v5e VMEM
    totals 128 MB)."""
    for bt in (8, 4, 2, 1):
        if bsz % bt == 0 and bt * tile_bytes * 16 <= budget:
            return bt
    return 1


@functools.partial(jax.jit, static_argnames=("interpret",))
def _stem_fwd(y, ab, interpret: bool = False):
    _ensure_pallas()
    bsz, h, w, c = y.shape
    bt = _pick_bt(bsz, h * w * c * 2, 60 * 2**20)
    return pl.pallas_call(
        _fwd_kernel,
        grid=(bsz // bt,),
        in_specs=[
            pl.BlockSpec((bt, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, h // 2, w // 2, c),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, h // 2, w // 2, c), y.dtype),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20
        ),
    )(y, ab)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _stem_bwd(g, y, ab, interpret: bool = False):
    _ensure_pallas()
    bsz, h, w, c = y.shape
    bt = _pick_bt(bsz, h * w * c * 2, 40 * 2**20)
    dy, dab = pl.pallas_call(
        _bwd_kernel,
        grid=(bsz // bt,),
        in_specs=[
            pl.BlockSpec((bt, h // 2, w // 2, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((bt, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bsz, h, w, c), y.dtype),
            jax.ShapeDtypeStruct((2, c), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((2, c), jnp.float32)],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20
        ),
    )(g, y, ab.astype(jnp.float32))
    return dy, dab


def _composite(y, a, b):
    """XLA reference: affine + relu + reduce_window max pool 3x3/2 pad 1."""
    z = jnp.maximum(
        y * a.astype(y.dtype) + b.astype(y.dtype), jnp.zeros((), y.dtype)
    )
    return jax.lax.reduce_window(
        z, -jnp.inf if z.dtype == jnp.float32 else jnp.array(
            -jnp.inf, z.dtype
        ),
        jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def stem_bn_relu_pool(y, a, b, impl: str = "pallas"):
    """maxpool3x3/2(relu(y * a + b)) with fused Pallas fwd/bwd.

    y (B, H, W, C) bf16 with even H, W; a, b (C,) f32. impl: 'pallas' |
    'interpret' | 'xla' (composite reference).
    """
    if impl == "xla":
        return _composite(y, a, b)
    ab = jnp.stack([a, b])
    return _stem_fwd(y, ab, interpret=impl == "interpret")


def _stem_p_fwd(y, a, b, impl):
    return stem_bn_relu_pool(y, a, b, impl), (y, a, b)


def _stem_p_bwd(impl, res, g):
    y, a, b = res
    if impl == "xla":
        _, vjp = jax.vjp(_composite, y, a, b)
        return vjp(g)
    ab = jnp.stack([a, b])
    dy, dab = _stem_bwd(g, y, ab, interpret=impl == "interpret")
    return dy, dab[0], dab[1]


stem_bn_relu_pool.defvjp(_stem_p_fwd, _stem_p_bwd)


def resolve_stem_impl(setting: str | None, compute_dtype: str) -> str | None:
    """Resolve the stem_pool setting ('auto' currently resolves to OFF).

    Measured on the v5e chip (BASELINE.md round 2): the fused stem kernel
    itself is one pass each way, but the custom-call boundary stops XLA
    from fusing the stem conv's backward with the BN/relu backward it
    previously absorbed, and the step ends up ~14% slower than the stock
    flax stem (1979 vs ~2300 img/s). Kept as a tested opt-in ('pallas',
    single chip) for a future whole-stem kernel that includes the conv."""
    del compute_dtype
    if setting in (None, "off", "none", "", "auto"):
        return None
    return setting
