"""Fused conv + BatchNorm Pallas kernels (opt-in; see BASELINE.md round 2).

The geodesic_bd train step is HBM-bandwidth-bound (the reference workload
is featureModels.py:11-41; the reference runs the convs through cuDNN with
separate BatchNorm kernels). These kernels fuse the BN statistic and
normalize passes into the convolutions' own input/output passes and each
runs AT its HBM roofline — but the full step measures SLOWER than stock
XLA, whose conv mega-fusions already fold the same work in while the
custom-call boundaries here stop XLA from fusing the remaining elementwise
glue. The path is therefore a tested OPT-IN (`fused_conv_bn='pallas'`,
single chip); config 'auto' resolves to off. Kept as validated
infrastructure + measurement methodology for future bytes-reduction work
(pixel packing, whole-block megakernels).

This module fuses, for the 1x1 convolutions of ResNet bottleneck blocks
(backbones.py BottleneckBlock conv1/conv3/downsample):

  forward:   xhat = relu(x * a + b)        (folded BN of the PREVIOUS conv,
                                            applied on the fly while reading)
             y    = xhat @ w               (MXU matmul, f32 accumulation)
             sums = [sum_m y, sum_m y^2]   (per-channel stats accumulated in
                                            the SAME pass that writes y)

so the batch-norm statistics of y cost zero extra HBM passes, and the
normalized input xhat is never materialized. Gradients flow through the
batch statistics exactly as in flax BatchNorm: mean/var are computed from
the returned sums OUTSIDE the kernel, so autodiff routes d(mean)/d(var)
back into the producing op's dy via the (sum, sumsq) cotangents.

The custom-VJP backward recomputes xhat from x (never stored) and runs the
two transposed matmuls; elementwise glue is left to XLA fusion.

All kernels take `interpret=` so the suite can validate numerics on the
CPU test mesh; on TPU the Mosaic path is used (probed like
ops/preprocess._probe_pallas).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def fold_bn(mean, var, scale, bias, eps: float = 1e-5):
    """(mean, var, scale, bias) -> (a, b) with bn(x) = x * a + b, f32."""
    a = scale.astype(jnp.float32) * jax.lax.rsqrt(var.astype(jnp.float32) + eps)
    b = bias.astype(jnp.float32) - mean.astype(jnp.float32) * a
    return a, b


def _grid_pos(grid2d: bool):
    """(linear step index, total steps) for 1-D or (batch, H-tile) grids."""
    if grid2d:
        i = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)
        total = pl.num_programs(0) * pl.num_programs(1)
    else:
        i = pl.program_id(0)
        total = pl.num_programs(0)
    return i, total


def _mm_kernel(x_ref, w_ref, ab_ref, y_ref, s_ref, acc_ref, *, relu,
               m_total, tm, grid2d=False):
    """One M-tile: prologue affine+relu, matmul, write y, accumulate stats.

    Blocks may be rank-2 (M-tiled flat views) or rank-4 (batch-tiled NHWC —
    used when H*W is not sublane-aligned so an HLO-level flatten would
    relayout); rank-4 tiles are flattened INSIDE VMEM. Stats are accumulated
    in a VMEM scratch (not the revisited output block) so the pipeline stays
    double-buffered; the (2, N) output is written once on the final grid
    step.
    """
    i, total = _grid_pos(grid2d)
    x = x_ref[...]
    if x.ndim == 4:
        x = x.reshape(-1, x.shape[-1])
    if ab_ref is not None:
        # bf16 affine+relu, matching flax BatchNorm's dtype-bf16 normalize
        ab = ab_ref[...].astype(x.dtype)
        x = x * ab[0:1, :] + ab[1:2, :]
        if relu:
            x = jnp.maximum(x, jnp.zeros((), x.dtype))
    y = jnp.dot(x, w_ref[...], preferred_element_type=jnp.float32)
    yb = y.astype(y_ref.dtype)
    y_ref[...] = yb.reshape(y_ref.shape)
    # stats from the ROUNDED y (what downstream sees), accumulated f32,
    # masking rows past m_total on the last partial tile
    yf = yb.astype(jnp.float32)
    if m_total % tm != 0:
        rows = jax.lax.broadcasted_iota(jnp.int32, yf.shape, 0) + i * tm
        yf = jnp.where(rows < m_total, yf, 0.0)

    @pl.when(i == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[0:1, :] += jnp.sum(yf, axis=0, keepdims=True)
    acc_ref[1:2, :] += jnp.sum(yf * yf, axis=0, keepdims=True)

    @pl.when(i == total - 1)
    def _():
        s_ref[...] = acc_ref[...]


# pallas imports are deferred so CPU-only deployments that never touch the
# fused path don't pay for them at module import
pl = None
pltpu = None


def _ensure_pallas():
    global pl, pltpu
    if pl is None:
        from jax.experimental import pallas as _pl
        from jax.experimental.pallas import tpu as _pltpu

        globals()["pl"] = _pl
        globals()["pltpu"] = _pltpu


def _pick_bt_th(bsz: int, h: int, fits_rows) -> tuple[int, int]:
    """Pick (batch tile, H tile) for a rank-4 grid: largest batch tile that
    fits with full H, else H sub-tiling (1x1 convs need no halo). Always
    returns a feasible tiling (th divides h; (1, smallest divisor) last)."""
    for bt in (32, 16, 8, 4, 2, 1):
        if bsz % bt == 0 and fits_rows(bt * h):
            return bt, h
    th = h
    best = 1
    for cand in range(h - 1, 0, -1):
        if h % cand == 0 and fits_rows(cand):
            th = cand
            break
        if h % cand == 0:
            best = cand
    else:
        th = best
    return 1, th


@functools.partial(
    jax.jit, static_argnames=("relu", "tm", "interpret", "out_dtype")
)
def _mm_stats(
    x2: jax.Array,
    w: jax.Array,
    ab: jax.Array | None,
    relu: bool = False,
    tm: int = 2048,
    interpret: bool = False,
    out_dtype: Any = jnp.bfloat16,
):
    """x (M, K) or (B, H, W, K) -> (y, sums (2, N) f32), one HBM pass each.

    Rank-4 inputs are batch-tiled (no HLO-level flatten, which would
    relayout when H*W is not sublane-aligned); rank-2 inputs are M-tiled.
    """
    _ensure_pallas()
    k = x2.shape[-1]
    n = w.shape[1]
    budget = 12 * 2**20

    def fits(rows):
        return (
            2 * (rows * (k + n) * 2) + k * n * 2 + rows * n * 4
            + rows * k * 2
        ) <= budget

    kernel_fn = _mm_kernel if ab is not None else _mm_kernel_plain
    args = [x2, w.astype(jnp.bfloat16)]
    if x2.ndim == 4:
        bsz, h, wd, _ = x2.shape
        bt, th = _pick_bt_th(bsz, h, lambda r: fits(r * wd))
        rows = bt * th * wd
        grid = (bsz // bt, h // th)
        kernel = functools.partial(
            kernel_fn, relu=relu, m_total=rows, tm=rows, grid2d=True
        )
        in_specs = [
            pl.BlockSpec((bt, th, wd, k), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        y_spec = pl.BlockSpec((bt, th, wd, n), lambda i, j: (i, j, 0, 0),
                              memory_space=pltpu.VMEM)
        y_shape = jax.ShapeDtypeStruct((bsz, h, wd, n), out_dtype)
    else:
        m = x2.shape[0]
        while tm > 256 and not fits(tm):
            tm //= 2
        tm = min(tm, m)
        grid = (_cdiv(m, tm),)
        kernel = functools.partial(kernel_fn, relu=relu, m_total=m, tm=tm)
        in_specs = [
            pl.BlockSpec((tm, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ]
        y_spec = pl.BlockSpec((tm, n), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)
        y_shape = jax.ShapeDtypeStruct((m, n), out_dtype)
    zmap = (lambda i, j: (0, 0)) if len(grid) == 2 else (lambda i: (0, 0))
    if ab is not None:
        in_specs.append(
            pl.BlockSpec((2, k), zmap, memory_space=pltpu.VMEM)
        )
        args.append(ab)
    y, s = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            y_spec,
            pl.BlockSpec((2, n), zmap, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            y_shape,
            jax.ShapeDtypeStruct((2, n), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((2, n), jnp.float32)],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20
        ),
    )(*args)
    return y, s


def _mm_kernel_plain(x_ref, w_ref, y_ref, s_ref, acc_ref, *, relu, m_total,
                     tm, grid2d=False):
    del relu
    _mm_kernel(x_ref, w_ref, None, y_ref, s_ref, acc_ref, relu=False,
               m_total=m_total, tm=tm, grid2d=grid2d)


def _mm_reference(x2, w, ab, relu):
    """XLA fallback / numerical reference for the fused forward.

    Accepts (M, K) or (B, H, W, K); the contraction is over the last axis
    either way and stats reduce over all leading axes."""
    x = x2
    if ab is not None:
        abc = ab.astype(x.dtype)
        x = x * abc[0].reshape((1,) * (x.ndim - 1) + (-1,)) + abc[1].reshape(
            (1,) * (x.ndim - 1) + (-1,)
        )
        if relu:
            x = jnp.maximum(x, jnp.zeros((), x.dtype))
    y = jnp.dot(
        x, w.astype(x.dtype), preferred_element_type=jnp.float32
    ).astype(jnp.bfloat16)
    yf = y.astype(jnp.float32)
    lead = tuple(range(y.ndim - 1))
    s = jnp.stack([jnp.sum(yf, axis=lead), jnp.sum(yf * yf, axis=lead)])
    return y, s


def _mm_bwd_kernel(
    gy_ref, y_ref, x_ref, wt_ref, gs_ref, ab_ref,
    dx_ref, dw_ref, dab_ref, dw_acc, dab_acc, *, relu, m_total, tm,
    grid2d=False,
):
    """One M-tile of the fused backward: dx written, dw/da/db accumulated.

    gy_eff = gy + gs0 + 2*y*gs1 (the stats-output cotangents), then
    dxhat = gy_eff @ w^T, prologue backward (relu mask + affine), and
    dw += xhat^T @ gy_eff — all in the same pass over gy/y/x.
    """
    i, total = _grid_pos(grid2d)
    gy = gy_ref[...]
    yv = y_ref[...]
    x = x_ref[...]
    if gy.ndim == 4:
        gy = gy.reshape(-1, gy.shape[-1])
        yv = yv.reshape(-1, yv.shape[-1])
        x = x.reshape(-1, x.shape[-1])
    gs = gs_ref[...]
    gy_eff = (
        gy.astype(jnp.float32)
        + gs[0:1, :]
        + 2.0 * yv.astype(jnp.float32) * gs[1:2, :]
    )
    if m_total % tm != 0:
        rows = jax.lax.broadcasted_iota(jnp.int32, gy_eff.shape, 0) + i * tm
        gy_eff = jnp.where(rows < m_total, gy_eff, 0.0)
    gy_eff = gy_eff.astype(jnp.bfloat16)
    dxh = jnp.dot(gy_eff, wt_ref[...], preferred_element_type=jnp.float32)

    @pl.when(i == 0)
    def _():
        dw_acc[...] = jnp.zeros_like(dw_acc)
        if dab_acc is not None:
            dab_acc[...] = jnp.zeros_like(dab_acc)

    if ab_ref is not None:
        # recompute the bf16 prologue exactly as the forward kernel did so
        # the relu mask is bit-identical to the forward activation pattern
        abc = ab_ref[...].astype(x.dtype)
        z = x * abc[0:1, :] + abc[1:2, :]
        if relu:
            xh = jnp.maximum(z, jnp.zeros((), z.dtype))
            # compare in f32: v5e Mosaic has no bf16 comparison
            dz = jnp.where(z.astype(jnp.float32) > 0.0, dxh, 0.0)
        else:
            xh = z
            dz = dxh
        dx_ref[...] = (dz * ab_ref[0:1, :]).astype(dx_ref.dtype).reshape(
            dx_ref.shape
        )
        dab_acc[0:1, :] += jnp.sum(dz * x.astype(jnp.float32), axis=0,
                                   keepdims=True)
        dab_acc[1:2, :] += jnp.sum(dz, axis=0, keepdims=True)
        lhs = xh
    else:
        dx_ref[...] = dxh.astype(dx_ref.dtype).reshape(dx_ref.shape)
        lhs = x
    # dw += xhat^T @ gy_eff, contracting the tile's M rows on the MXU
    dw_acc[...] += jax.lax.dot_general(
        lhs, gy_eff, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(i == total - 1)
    def _():
        dw_ref[...] = dw_acc[...]
        if dab_acc is not None:
            dab_ref[...] = dab_acc[...]


def _mm_bwd_kernel_plain(
    gy_ref, y_ref, x_ref, wt_ref, gs_ref,
    dx_ref, dw_ref, dw_acc, *, relu, m_total, tm, grid2d=False,
):
    del relu
    _mm_bwd_kernel(
        gy_ref, y_ref, x_ref, wt_ref, gs_ref, None,
        dx_ref, dw_ref, None, dw_acc, None,
        relu=False, m_total=m_total, tm=tm, grid2d=grid2d,
    )


def _mm_bwd_fits(tm: int, k: int, n: int) -> bool:
    # double-buffered gy/y/x/dx bf16 tiles + wt + f32 dw accumulator + f32
    # kernel temporaries (gy_eff, dxh, z). The 8 MB budget leaves ~2x
    # headroom against Mosaic's scoped-stack accounting (measured overshoot
    # ~1.5x on small-channel tiles).
    return (
        2 * (tm * (2 * n + 2 * k) * 2)
        + n * k * 2
        + k * n * 4
        + tm * (n + 2 * k) * 4
    ) <= 8 * 2**20


def _mm_bwd_tile(m: int, k: int, n: int) -> int | None:
    """Largest M tile for the fused backward that fits VMEM; None = use the
    XLA composite instead (big-K*N late-stage convs whose f32 dw accumulator
    plus transposed weights alone approach the 16 MB scoped limit)."""
    tm = 1024
    while tm >= 256:
        if _mm_bwd_fits(tm, k, n):
            return min(tm, m)
        tm //= 2
    return None


@functools.partial(jax.jit, static_argnames=("relu", "tm", "interpret"))
def _mm_stats_bwd(
    gy, y, x2, w, gs, ab,
    relu: bool = False,
    tm: int = 1024,
    interpret: bool = False,
):
    """Fused backward pass. Returns (dx, dw, dab|None)."""
    _ensure_pallas()
    k = x2.shape[-1]
    n = w.shape[1]
    wt = w.astype(jnp.bfloat16).T
    kernel_fn = _mm_bwd_kernel if ab is not None else _mm_bwd_kernel_plain
    if x2.ndim == 4:
        bsz, h, wd, _ = x2.shape
        bt, th = _pick_bt_th(
            bsz, h, lambda r: _mm_bwd_fits(r * wd, k, n)
        )
        rows = bt * th * wd
        grid = (bsz // bt, h // th)
        kernel = functools.partial(kernel_fn, relu=relu, m_total=rows,
                                   tm=rows, grid2d=True)
        in_specs = [
            pl.BlockSpec((bt, th, wd, n), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, th, wd, n), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, th, wd, k), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, k), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, n), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        dx_spec = pl.BlockSpec((bt, th, wd, k), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM)
        dx_shape = jax.ShapeDtypeStruct((bsz, h, wd, k), x2.dtype)
    else:
        m = x2.shape[0]
        tm = _mm_bwd_tile(m, k, n) or 256
        grid = (_cdiv(m, tm),)
        kernel = functools.partial(kernel_fn, relu=relu, m_total=m, tm=tm)
        in_specs = [
            pl.BlockSpec((tm, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ]
        dx_spec = pl.BlockSpec((tm, k), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)
        dx_shape = jax.ShapeDtypeStruct((m, k), x2.dtype)
    args = [gy, y, x2, wt, gs]
    zmap = (lambda i, j: (0, 0)) if len(grid) == 2 else (lambda i: (0, 0))
    out_specs = [
        dx_spec,
        pl.BlockSpec((k, n), zmap, memory_space=pltpu.VMEM),
    ]
    out_shape = [
        dx_shape,
        jax.ShapeDtypeStruct((k, n), jnp.float32),
    ]
    scratch = [pltpu.VMEM((k, n), jnp.float32)]
    if ab is not None:
        in_specs.append(
            pl.BlockSpec((2, k), zmap, memory_space=pltpu.VMEM)
        )
        args.append(ab.astype(jnp.float32))
        out_specs.append(
            pl.BlockSpec((2, k), zmap, memory_space=pltpu.VMEM)
        )
        out_shape.append(jax.ShapeDtypeStruct((2, k), jnp.float32))
        scratch.append(pltpu.VMEM((2, k), jnp.float32))
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20
        ),
    )(*args)
    if ab is not None:
        dx, dw, dab = outs
        return dx, dw, dab
    dx, dw = outs
    return dx, dw, None


# ---------------------------------------------------------------------------
# custom-VJP wrappers
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def linear_bn_stats(x2, a, b, w, relu: bool = True, impl: str = "pallas"):
    """relu(x*a+b) @ w with per-channel (sum, sumsq) of the output.

    x2 (M, K) bf16; a, b (K,) f32 folded BN affine of x's producer; w (K, N)
    f32 params. Returns (y (M, N) bf16, sums (2, N) f32). Differentiable in
    x2, a, b, w — including the stats outputs, so downstream normalization
    by mean/var derived from `sums` backpropagates into y exactly like
    flax.linen.BatchNorm's batch-statistics path.
    """
    ab = jnp.stack([a, b])
    if impl == "pallas":
        return _mm_stats(x2, w, ab, relu=relu)
    if impl == "interpret":
        return _mm_stats(x2, w, ab, relu=relu, interpret=True)
    return _mm_reference(x2, w, ab, relu)


def _linear_bn_stats_fwd(x2, a, b, w, relu, impl):
    y, s = linear_bn_stats(x2, a, b, w, relu, impl)
    return (y, s), (x2, a, b, w, y)


def _linear_bn_stats_bwd(relu, impl, res, cots):
    x2, a, b, w, y = res
    gy, gs = cots
    k, n = x2.shape[-1], w.shape[1]
    if impl in ("pallas", "interpret") and (
        _mm_bwd_fits(x2.shape[2], k, n)  # even a 1-row H tile must fit
        if x2.ndim == 4
        else bool(_mm_bwd_tile(x2.shape[0], k, n))
    ):
        ab = jnp.stack([a, b])
        dx, dw, dab = _mm_stats_bwd(
            gy, y, x2, w, gs, ab, relu=relu, interpret=impl == "interpret"
        )
        return dx, dab[0], dab[1], dw
    shape4 = x2.shape if x2.ndim == 4 else None
    if shape4 is not None:
        x2 = x2.reshape(-1, k)
        gy = gy.reshape(-1, n)
        y = y.reshape(-1, n)
    yf = y.astype(jnp.float32)
    gy_eff = (
        gy.astype(jnp.float32) + gs[0:1, :] + 2.0 * yf * gs[1:2, :]
    ).astype(jnp.bfloat16)
    wb = w.astype(jnp.bfloat16)
    # dxhat = gy_eff @ w^T  (M, K)
    dxh = jnp.dot(gy_eff, wb.T, preferred_element_type=jnp.float32)
    # recompute the bf16 prologue (same dtype as the forward pass) so the
    # relu mask matches the forward activation pattern exactly
    z = x2 * a[None, :].astype(x2.dtype) + b[None, :].astype(x2.dtype)
    xh = jnp.maximum(z, jnp.zeros((), z.dtype)) if relu else z
    # dw = xhat^T @ gy_eff  (K, N) f32
    dw = jnp.dot(xh.T, gy_eff, preferred_element_type=jnp.float32)
    dz = dxh * (z > jnp.zeros((), z.dtype)) if relu else dxh
    da = jnp.sum(dz * x2.astype(jnp.float32), axis=0)
    db = jnp.sum(dz, axis=0)
    dx = (dz * a[None, :]).astype(x2.dtype)
    if shape4 is not None:
        dx = dx.reshape(shape4)
    return dx, da, db, dw


linear_bn_stats.defvjp(_linear_bn_stats_fwd, _linear_bn_stats_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def linear_stats(x2, w, impl: str = "pallas"):
    """x @ w with per-channel (sum, sumsq) of the output (no prologue)."""
    if impl == "pallas":
        return _mm_stats(x2, w, None)
    if impl == "interpret":
        return _mm_stats(x2, w, None, interpret=True)
    return _mm_reference(x2, w, None, False)


def _linear_stats_fwd(x2, w, impl):
    y, s = linear_stats(x2, w, impl)
    return (y, s), (x2, w, y)


def _linear_stats_bwd(impl, res, cots):
    x2, w, y = res
    gy, gs = cots
    k, n = x2.shape[-1], w.shape[1]
    if impl in ("pallas", "interpret") and (
        _mm_bwd_fits(x2.shape[2], k, n)  # even a 1-row H tile must fit
        if x2.ndim == 4
        else bool(_mm_bwd_tile(x2.shape[0], k, n))
    ):
        dx, dw, _ = _mm_stats_bwd(
            gy, y, x2, w, gs, None, relu=False,
            interpret=impl == "interpret",
        )
        return dx, dw
    shape4 = x2.shape if x2.ndim == 4 else None
    if shape4 is not None:
        x2 = x2.reshape(-1, k)
        gy = gy.reshape(-1, n)
        y = y.reshape(-1, n)
    yf = y.astype(jnp.float32)
    gy_eff = (
        gy.astype(jnp.float32) + gs[0:1, :] + 2.0 * yf * gs[1:2, :]
    ).astype(jnp.bfloat16)
    wb = w.astype(jnp.bfloat16)
    dx = jnp.dot(gy_eff, wb.T, preferred_element_type=jnp.float32).astype(
        x2.dtype
    )
    dw = jnp.dot(x2.T, gy_eff, preferred_element_type=jnp.float32)
    if shape4 is not None:
        dx = dx.reshape(shape4)
    return dx, dw


linear_stats.defvjp(_linear_stats_fwd, _linear_stats_bwd)


# ---------------------------------------------------------------------------
# fused 3x3 (stride-1) convolution
# ---------------------------------------------------------------------------
#
# Each grid step processes `bt` whole images: the (optionally normalized)
# input is written into a zero-bordered VMEM buffer, W-shifted copies are
# concatenated along the channel (lane) axis, and the 3x3 conv becomes three
# MXU matmuls over (bt*H*W, 3C) patches — exact conv FLOPs, one HBM read of
# x and one write of y, with the BN-stats epilogue shared with the 1x1 path.



def _roll_w(zb, shift: int):
    """Roll the W (dim-2) axis left by `shift` (wrap values land past the
    valid region and are sliced away by callers)."""
    try:
        return pltpu.roll(zb, -shift, 2)
    except Exception:  # interpret mode: fall back to the jnp roll
        return jnp.roll(zb, -shift, 2)


def _w_patches(zb, wd: int):
    """(bt, h+2, wd+2, c) zero-bordered -> (bt, h+2, wd, 3c) W-shift patches.

    Mosaic cannot concatenate slices with different second-minor offsets
    ("result/input offset mismatch on non-concat dimension"), so the W
    shifts are realized as full-width rolls (all offset 0) concatenated on
    the lane axis, sliced afterwards. Rolled wrap-around values land only at
    W >= wd, which the final slice discards.
    """
    return jnp.concatenate(
        [zb, _roll_w(zb, 1), _roll_w(zb, 2)], axis=-1
    )[:, :, 0:wd, :]


def _c3_kernel(
    x_ref, wf_ref, ab_ref, y_ref, s_ref, zbuf, acc_ref,
    *, relu, bt, h, wd, c, cout, m_total,
):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        zbuf[...] = jnp.zeros_like(zbuf)  # borders stay zero afterwards
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[...]
    if ab_ref is not None:
        abv = ab_ref[...].astype(x.dtype)
        x = x * abv[0] + abv[1]
        if relu:
            x = jnp.maximum(x, jnp.zeros((), x.dtype))
    zbuf[:, 1 : h + 1, 1 : wd + 1, :] = x
    zb = zbuf[...]
    patches = _w_patches(zb, wd)  # (bt, h+2, wd, 3c)
    acc = jnp.zeros((bt * h * wd, cout), jnp.float32)
    for dy in range(3):
        lhs = patches[:, dy : dy + h].reshape(bt * h * wd, 3 * c)
        acc = acc + jnp.dot(
            lhs, wf_ref[dy], preferred_element_type=jnp.float32
        )
    yb = acc.astype(y_ref.dtype)
    y_ref[...] = yb.reshape(bt, h, wd, cout)
    # stats from the ROUNDED output (what downstream sees) — matching
    # _mm_kernel, _c3_reference, and the backward's use of the rounded y_ref
    # in the stats cotangent
    yf = yb.astype(jnp.float32)
    acc_ref[0:1, :] += jnp.sum(yf, axis=0, keepdims=True)
    acc_ref[1:2, :] += jnp.sum(yf * yf, axis=0, keepdims=True)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        s_ref[...] = acc_ref[...]


def _c3_bwd_kernel(
    gy_ref, y_ref, x_ref, wflip_ref, gs_ref, ab_ref,
    dx_ref, dw_ref, dab_ref, gbuf, dw_acc, dab_acc,
    *, relu, bt, h, wd, c, cout,
):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        gbuf[...] = jnp.zeros_like(gbuf)
        dw_acc[...] = jnp.zeros_like(dw_acc)
        if dab_acc is not None:
            dab_acc[...] = jnp.zeros_like(dab_acc)

    gs = gs_ref[...]
    gy_eff = (
        gy_ref[...].astype(jnp.float32)
        + gs[0, :]
        + 2.0 * y_ref[...].astype(jnp.float32) * gs[1, :]
    ).astype(jnp.bfloat16)
    gbuf[:, 1 : h + 1, 1 : wd + 1, :] = gy_eff
    gb = gbuf[...]
    # W shifts as rolled copies (no 3*cout patches concat buffer: the c3
    # backward sits within ~100 KB of the 16 MB scoped-VMEM limit at
    # layer1 size, so the dots consume the rolls directly)
    rolled = (gb, _roll_w(gb, 1), _roll_w(gb, 2))
    dxh = jnp.zeros((bt * h * wd, c), jnp.float32)
    for dy in range(3):
        for v in range(3):
            lhs = rolled[v][:, dy : dy + h, 0:wd, :].reshape(
                bt * h * wd, cout
            )
            dxh = dxh + jnp.dot(
                lhs, wflip_ref[dy, v * cout : (v + 1) * cout, :],
                preferred_element_type=jnp.float32,
            )
    x = x_ref[...]
    x2 = x.reshape(bt * h * wd, c)
    if ab_ref is not None:
        abv = ab_ref[...].astype(x.dtype)
        z = x2 * abv[0:1, :] + abv[1:2, :]
        if relu:
            xh = jnp.maximum(z, jnp.zeros((), z.dtype))
            dz = jnp.where(z.astype(jnp.float32) > 0.0, dxh, 0.0)
        else:
            xh = z
            dz = dxh
        dx_ref[...] = (dz * ab_ref[0:1, :]).astype(dx_ref.dtype).reshape(
            bt, h, wd, c
        )
        dab_acc[0:1, :] += jnp.sum(dz * x2.astype(jnp.float32), axis=0,
                                   keepdims=True)
        dab_acc[1:2, :] += jnp.sum(dz, axis=0, keepdims=True)
        xh2 = xh
    else:
        dx_ref[...] = dxh.astype(dx_ref.dtype).reshape(bt, h, wd, c)
        xh2 = x.reshape(bt * h * wd, c)
    # dw via correlation of the UNPADDED xh with the rolled gy buffers:
    # dw[u,v,c,o] = sum_m xh[m,c] * gy_pad[m+2-u, n+2-v, o]
    # -> acc[u'][c, v'*cout+o] with (u', v') = (2-u, 2-v); remapped to
    # HWIO outside the kernel.
    for up in range(3):
        for v in range(3):
            rhs = rolled[v][:, up : up + h, 0:wd, :].reshape(
                bt * h * wd, cout
            )
            dw_acc[up, :, v * cout : (v + 1) * cout] += jax.lax.dot_general(
                xh2, rhs, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        dw_ref[...] = dw_acc[...]
        if dab_acc is not None:
            dab_ref[...] = dab_acc[...]


def _c3_bwd_kernel_plain(
    gy_ref, y_ref, x_ref, wflip_ref, gs_ref,
    dx_ref, dw_ref, gbuf, dw_acc,
    *, relu, bt, h, wd, c, cout,
):
    del relu
    _c3_bwd_kernel(
        gy_ref, y_ref, x_ref, wflip_ref, gs_ref, None,
        dx_ref, dw_ref, None, gbuf, dw_acc, None,
        relu=False, bt=bt, h=h, wd=wd, c=c, cout=cout,
    )


def _c3_pick_bt(bsz, h, wd, c, cout, bwd: bool) -> int | None:
    """Largest batch tile whose VMEM footprint fits; None = doesn't fit."""
    for bt in (16, 8, 4, 2, 1):
        if bsz % bt:
            continue
        tile = bt * (h + 2) * (wd + 2) * c * 2
        patches = bt * (h + 2) * wd * 3 * c * 2
        io = 2 * bt * h * wd * (c + cout) * 2
        acc = bt * h * wd * cout * 4
        wsz = 9 * c * cout * 2
        total = tile + patches + io + acc + wsz
        if bwd:
            gtile = bt * (h + 2) * (wd + 2) * cout * 2
            gpatches = bt * (h + 2) * wd * 3 * cout * 2
            rolls = 2 * gtile  # _w_patches materializes two rolled copies
            dw = 9 * c * cout * 4
            dxh = bt * h * wd * c * 4
            extra = bt * h * wd * (2 * c) * 4  # dz / xh f32 temporaries
            total += gtile + gpatches + rolls + dw + dxh + extra
        else:
            total += 2 * bt * (h + 2) * (wd + 2) * c * 2  # fwd roll copies
        if total <= 10 * 2**20:
            return bt
    return None


@functools.partial(jax.jit, static_argnames=("relu", "bt", "interpret"))
def _c3_fwd(x, wf, ab, relu: bool, bt: int, interpret: bool = False):
    _ensure_pallas()
    bsz, h, wd, c = x.shape
    cout = wf.shape[-1]
    grid = (bsz // bt,)
    kernel = functools.partial(
        _c3_kernel, relu=relu, bt=bt, h=h, wd=wd, c=c, cout=cout,
        m_total=bsz * h * wd,
    )
    in_specs = [
        pl.BlockSpec((bt, h, wd, c), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((3, 3 * c, cout), lambda i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    # ab is always provided (the public wrapper stacks identity affines
    # for the no-prologue case)
    args = [x, wf]
    in_specs.append(
        pl.BlockSpec((2, c), lambda i: (0, 0), memory_space=pltpu.VMEM)
    )
    args.append(ab)
    body = kernel
    y, s = pl.pallas_call(
        body,
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((bt, h, wd, cout), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bsz, h, wd, cout), jnp.bfloat16),
            jax.ShapeDtypeStruct((2, cout), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((bt, h + 2, wd + 2, c), jnp.bfloat16),
            pltpu.VMEM((2, cout), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20
        ),
    )(*args)
    return y, s


@functools.partial(jax.jit, static_argnames=("relu", "bt", "interpret"))
def _c3_bwd(gy, y, x, wflip, gs, ab, relu: bool, bt: int,
            interpret: bool = False):
    _ensure_pallas()
    bsz, h, wd, c = x.shape
    cout = gy.shape[-1]
    grid = (bsz // bt,)
    kernel = functools.partial(
        _c3_bwd_kernel if ab is not None else _c3_bwd_kernel_plain,
        relu=relu, bt=bt, h=h, wd=wd, c=c, cout=cout,
    )
    in_specs = [
        pl.BlockSpec((bt, h, wd, cout), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bt, h, wd, cout), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bt, h, wd, c), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((3, 3 * cout, c), lambda i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((2, cout), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    args = [gy, y, x, wflip, gs]
    out_specs = [
        pl.BlockSpec((bt, h, wd, c), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((3, c, 3 * cout), lambda i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((bsz, h, wd, c), x.dtype),
        jax.ShapeDtypeStruct((3, c, 3 * cout), jnp.float32),
    ]
    scratch = [
        pltpu.VMEM((bt, h + 2, wd + 2, cout), jnp.bfloat16),
        pltpu.VMEM((3, c, 3 * cout), jnp.float32),
    ]
    if ab is not None:
        in_specs.append(
            pl.BlockSpec((2, c), lambda i: (0, 0), memory_space=pltpu.VMEM)
        )
        args.append(ab.astype(jnp.float32))
        out_specs.append(
            pl.BlockSpec((2, c), lambda i: (0, 0), memory_space=pltpu.VMEM)
        )
        out_shape.append(jax.ShapeDtypeStruct((2, c), jnp.float32))
        scratch.append(pltpu.VMEM((2, c), jnp.float32))
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20
        ),
    )(*args)
    if ab is not None:
        return outs
    dx, dwf = outs
    return dx, dwf, None


def _c3_reference(x, w, ab, relu):
    """XLA composite: prologue + lax 3x3 conv + stats (fallback/reference)."""
    if ab is not None:
        abc = ab.astype(x.dtype)
        x = x * abc[0][None, None, None, :] + abc[1][None, None, None, :]
        if relu:
            x = jnp.maximum(x, jnp.zeros((), x.dtype))
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ).astype(jnp.bfloat16)
    yf = y.astype(jnp.float32)
    s = jnp.stack(
        [jnp.sum(yf, axis=(0, 1, 2)), jnp.sum(yf * yf, axis=(0, 1, 2))]
    )
    return y, s


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def conv3x3_bn_stats_p(x, a, b, w, relu: bool, impl: str, bt: int):
    """3x3 stride-1 pad-1 conv with fused input-BN prologue + stats epilogue.

    x (B, H, W, C); a, b (C,) folded BN affine (pass zeros/ones via the
    public wrapper when there is no prologue); w (3, 3, C, Cout).
    """
    ab = jnp.stack([a, b])
    if impl in ("pallas", "interpret"):
        wf = w.astype(jnp.bfloat16).reshape(3, 3 * w.shape[2], w.shape[3])
        return _c3_fwd(x, wf, ab, relu, bt, interpret=impl == "interpret")
    return _c3_reference(x, w, ab, relu)


def _c3_p_fwd(x, a, b, w, relu, impl, bt):
    y, s = conv3x3_bn_stats_p(x, a, b, w, relu, impl, bt)
    return (y, s), (x, a, b, w, y)


def _c3_p_bwd(relu, impl, bt, res, cots):
    x, a, b, w, y = res
    gy, gs = cots
    c, cout = w.shape[2], w.shape[3]
    ab = jnp.stack([a, b])
    if impl in ("pallas", "interpret"):
        wflip = (
            w[::-1, ::-1].transpose(0, 1, 3, 2)
            .astype(jnp.bfloat16)
            .reshape(3, 3 * cout, c)
        )
        dx, dwf, dab = _c3_bwd(
            gy, y, x, wflip, gs, ab, relu, bt,
            interpret=impl == "interpret",
        )
        # kernel accumulates acc[2-u, c, (2-v)*cout+o]; remap to HWIO
        dw = dwf.reshape(3, c, 3, cout)[::-1, :, ::-1, :].transpose(
            0, 2, 1, 3
        )
        if dab is None:
            dab = jnp.zeros((2, c), jnp.float32)
        return dx, dab[0], dab[1], dw
    # XLA composite backward: plain autodiff of the reference composite
    del ab
    _, vjp = jax.vjp(
        lambda x_, a_, b_, w_: _c3_reference(
            x_, w_, jnp.stack([a_, b_]), relu
        ),
        x, a, b, w,
    )
    return vjp((gy, gs))


conv3x3_bn_stats_p.defvjp(_c3_p_fwd, _c3_p_bwd)


def conv3x3_bn_stats(x, w, ab=None, *, relu: bool = True, impl: str = "pallas"):
    """Public wrapper: picks a batch tile, falls back to the XLA composite
    when the kernel would not fit VMEM (large-C late stages). Returns
    (y (B,H,W,Cout), sums (2,Cout))."""
    bsz, h, wd, c = x.shape
    cout = w.shape[-1]
    eff = impl
    bt = 1
    if impl in ("pallas", "interpret"):
        bt_fwd = _c3_pick_bt(bsz, h, wd, c, cout, bwd=False)
        bt_bwd = _c3_pick_bt(bsz, h, wd, c, cout, bwd=True)
        if bt_fwd is None or bt_bwd is None:
            eff = "xla"
        else:
            bt = min(bt_fwd, bt_bwd)
    if ab is None:
        a = jnp.ones((c,), jnp.float32)
        b = jnp.zeros((c,), jnp.float32)
        return conv3x3_bn_stats_p(x, a, b, w, False, eff, bt)
    return conv3x3_bn_stats_p(x, ab[0], ab[1], w, relu, eff, bt)


# ---------------------------------------------------------------------------
# conv-level helpers (NHWC)
# ---------------------------------------------------------------------------


def conv1x1_bn_stats(
    x, w, ab=None, *, stride: int = 1, relu: bool = True, impl: str = "pallas"
):
    """1x1 conv over NHWC with fused input-BN prologue and stats epilogue.

    x (B, H, W, Cin); w (1, 1, Cin, Cout) or (Cin, Cout); ab None or the
    fold_bn() affine of x's producer. Returns (y (B, H', W', Cout), sums).
    """
    if w.ndim == 4:
        w = w[0, 0]
    if stride != 1:
        x = x[:, ::stride, ::stride, :]
    # x stays rank-4 end to end: an HLO-level flatten would relayout (copy)
    # whenever H*W is not sublane-aligned (e.g. 14x14, 28x28 stages)
    if ab is None:
        y, s = linear_stats(x, w, impl)
    else:
        y, s = linear_bn_stats(x, ab[0], ab[1], w, relu, impl)
    return y, s


def stats_to_moments(s, count: int):
    """(2, N) sums -> (mean, var) with flax's biased-variance convention."""
    mean = s[0] / count
    var = s[1] / count - mean * mean
    return mean, jnp.maximum(var, 0.0)


def resolve_impl(setting: str | None, compute_dtype: str) -> str | None:
    """Resolve a config's fused_conv_bn setting to an impl (or None = off).

    'auto' enables the Pallas path only on a TPU backend with bfloat16
    compute, verified by actually running a probe kernel (the axon tunnel
    registers as 'tpu' but capabilities are probed, not name-matched —
    see ops.preprocess._probe_pallas / BASELINE.md round 2).
    """
    if setting in (None, "off", "none", ""):
        return None
    if setting != "auto":
        return setting
    # 'auto' currently resolves to OFF: on v5e the Pallas kernels each run
    # at their own HBM roofline (BASELINE.md round 2), but the decomposition
    # does not move fewer total bytes than XLA's conv fusions, which already
    # fold the BN statistic/normalize passes into the convolutions at near-
    # peak bandwidth. The fused path remains available by passing 'pallas'
    # explicitly (single chip only: pallas_call has no SPMD partition rule).
    return None
