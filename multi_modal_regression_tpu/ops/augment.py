"""On-device image resize + flip (the fused preprocessing fast path).

The reference resizes and flips on host CPU per image (PIL in DataLoader
workers, transforms.Resize — dataGenerators.py:22,40). The TPU-native form:
a separable bilinear resize is a FIXED sparse matrix per axis, so resizing
a whole batch is two dense einsums that tile onto the MXU:

    out[b, o, p, c] = Wr[o, h] * x[b, h, w, c] * Wc[p, w]

The weight matrices follow PIL's convention (half-pixel centers; triangle
filter with support scaled by the ratio when downscaling = PIL's
antialiased BILINEAR), so the device path reproduces the host loader's
pixels. Horizontal flips are a per-sample jnp.where on the reversed width
axis — the flip half of setupDataFlipped's offline augmentation
(setupDataFlipped_pascal3d.m:117-121), available at train time without
doubling the dataset.

`device_preprocess` chains resize -> flip -> (x/255 - mean)/std into the
compiled step (use via ExperimentConfig.device_resize_from).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=32)
def _resize_matrix(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) PIL-BILINEAR weights (antialiased when downscaling).

    Mirrors PIL's precompute_coeffs: triangle filter of half-width
    filterscale = max(1, n_in/n_out), window clipped to the image (taps
    outside are EXCLUDED, not clamped) and renormalized over in-range taps.
    """
    scale = n_in / n_out
    fs = max(1.0, scale)
    support = 1.0 * fs  # bilinear filter support * filterscale
    W = np.zeros((n_out, n_in), np.float64)
    for o in range(n_out):
        center = (o + 0.5) * scale
        lo = max(0, int(center - support + 0.5))
        hi = min(n_in, int(center + support + 0.5))
        for i in range(lo, hi):
            W[o, i] = max(0.0, 1.0 - abs((i + 0.5 - center) / fs))
    W /= W.sum(axis=1, keepdims=True)
    return W.astype(np.float32)


def resize_images(x: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """Bilinear-resize (B, H, W, C) -> (B, out_h, out_w, C) via two einsums
    (float32 accumulation on the MXU); input may be uint8 or float."""
    b, h, w, c = x.shape
    xf = x.astype(jnp.float32)
    Wr = jnp.asarray(_resize_matrix(h, out_h))
    Wc = jnp.asarray(_resize_matrix(w, out_w))
    y = jnp.einsum("oh,bhwc->bowc", Wr, xf, preferred_element_type=jnp.float32)
    return jnp.einsum("pw,bowc->bopc", Wc, y, preferred_element_type=jnp.float32)


def flip_images(x: jax.Array, flip: jax.Array) -> jax.Array:
    """Horizontally flip samples where flip (B,) bool is True."""
    return jnp.where(flip[:, None, None, None], x[:, :, ::-1, :], x)


def flip_pose_euler(euler: jax.Array, flip: jax.Array) -> jax.Array:
    """The flip's pose counterpart: (az, el, ct) -> (-az, el, -ct)
    (setupDataFlipped_pascal3d.m:121)."""
    sign = jnp.where(flip, -1.0, 1.0)[:, None]
    return euler * jnp.concatenate(
        [sign, jnp.ones_like(sign), sign], axis=-1
    )


def device_preprocess(
    x_uint8: jax.Array,
    out_size: int | None = None,
    flip: jax.Array | None = None,
    dtype=jnp.float32,
) -> jax.Array:
    """resize (optional) -> flip (optional) -> normalize, all on device.

    Normalization reuses data.loader.normalize_images (one formula to
    maintain); it accepts the float 0..255 values the resize produces.
    """
    from multi_modal_regression_tpu.data.loader import normalize_images

    x = x_uint8
    if out_size is not None and x.shape[1:3] != (out_size, out_size):
        x = resize_images(x.astype(jnp.float32), out_size, out_size)
    if flip is not None:
        x = flip_images(x, flip)
    return normalize_images(x, dtype=dtype)
