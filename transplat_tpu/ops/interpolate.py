"""Bilinear sampling / resizing with torch-compatible conventions.

The reference model mixes several interpolation conventions; we reproduce each
exactly so converted weights stay numerically faithful:
  * grid_sample(align_corners=False, padding_mode="zeros") — deformable attn
  * F.interpolate(mode="bilinear", align_corners=True)      — feature resizing
  * F.interpolate(mode="nearest")                            — UNet upsampling
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _gather_2d(values: jnp.ndarray, iy: jnp.ndarray, ix: jnp.ndarray) -> jnp.ndarray:
    """values: (H, W, C); iy/ix: (...,) int32 -> (..., C) with zero padding."""
    h, w, _ = values.shape
    inb = (iy >= 0) & (iy < h) & (ix >= 0) & (ix < w)
    iy_c = jnp.clip(iy, 0, h - 1)
    ix_c = jnp.clip(ix, 0, w - 1)
    flat = values.reshape(h * w, -1)
    out = flat[iy_c * w + ix_c]
    return jnp.where(inb[..., None], out, 0.0)


def grid_sample(
    values: jnp.ndarray,
    loc01: jnp.ndarray,
    align_corners: bool = False,
) -> jnp.ndarray:
    """Bilinear sample with torch grid_sample zero-padding semantics.

    values: (H, W, C); loc01: (..., 2) in [0, 1] (x, y) — equivalent to torch
    grid coordinates 2*loc01 - 1. Returns (..., C).
    """
    h, w, _ = values.shape
    if align_corners:
        px = loc01[..., 0] * (w - 1)
        py = loc01[..., 1] * (h - 1)
    else:
        px = loc01[..., 0] * w - 0.5
        py = loc01[..., 1] * h - 0.5
    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    wx = px - x0
    wy = py - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    v00 = _gather_2d(values, y0i, x0i)
    v01 = _gather_2d(values, y0i, x0i + 1)
    v10 = _gather_2d(values, y0i + 1, x0i)
    v11 = _gather_2d(values, y0i + 1, x0i + 1)

    wx = wx[..., None]
    wy = wy[..., None]
    return (
        v00 * (1 - wx) * (1 - wy)
        + v01 * wx * (1 - wy)
        + v10 * (1 - wx) * wy
        + v11 * wx * wy
    )


def _resize_weights(n_in: int, n_out: int, align_corners: bool) -> np.ndarray:
    """Static (n_out, n_in) bilinear interpolation matrix."""
    if align_corners:
        pos = (
            np.linspace(0.0, n_in - 1.0, n_out)
            if n_out > 1
            else np.zeros((1,))
        )
    else:
        pos = (np.arange(n_out) + 0.5) * (n_in / n_out) - 0.5
        pos = np.clip(pos, 0.0, n_in - 1.0)
    i0 = np.floor(pos).astype(np.int64)
    i1 = np.minimum(i0 + 1, n_in - 1)
    frac = (pos - i0).astype(np.float32)
    w_mat = np.zeros((n_out, n_in), np.float32)
    w_mat[np.arange(n_out), i0] += 1.0 - frac
    w_mat[np.arange(n_out), i1] += frac
    return w_mat


def resize_bilinear(
    x: jnp.ndarray, out_shape: tuple[int, int], align_corners: bool = True
) -> jnp.ndarray:
    """Resize (..., H, W, C) -> (..., h2, w2, C), torch F.interpolate semantics.

    Separable: two matmuls with static interpolation matrices (MXU work, no
    gathers — TPU scalar gathers run at ~40M/s).
    """
    *batch, h, w, c = x.shape
    h2, w2 = out_shape
    wh = jnp.asarray(_resize_weights(h, h2, align_corners))
    ww = jnp.asarray(_resize_weights(w, w2, align_corners))
    out = jnp.einsum("ih,...hwc->...iwc", wh, x)
    out = jnp.einsum("jw,...iwc->...ijc", ww, out)
    return out


def _cubic_kernel(t: np.ndarray, a: float = -0.75) -> np.ndarray:
    """torch's cubic convolution kernel (a = -0.75)."""
    at = np.abs(t)
    w = np.where(
        at <= 1.0,
        (a + 2.0) * at**3 - (a + 3.0) * at**2 + 1.0,
        np.where(at < 2.0, a * (at**3 - 5.0 * at**2 + 8.0 * at - 4.0), 0.0),
    )
    return w.astype(np.float64)


def _resize_cubic_weights(n_in: int, n_out: int, scale: float | None) -> np.ndarray:
    """Static (n_out, n_in) matrix reproducing torch F.interpolate bicubic
    (align_corners=False, antialias=False) bit-for-bit-ish.

    When torch is given scale_factor (not size), source positions use the
    PROVIDED scale, not n_out/n_in — the DINOv2 pos-embed path relies on this
    (+0.1 interpolate_offset, dinov2.py:183-194).
    """
    s = (n_out / n_in) if scale is None else scale
    src = (np.arange(n_out, dtype=np.float64) + 0.5) / s - 0.5
    i0 = np.floor(src).astype(np.int64)
    frac = src - i0
    w_mat = np.zeros((n_out, n_in), np.float64)
    for tap in range(-1, 3):
        wt = _cubic_kernel(frac - tap)
        idx = np.clip(i0 + tap, 0, n_in - 1)
        np.add.at(w_mat, (np.arange(n_out), idx), wt)
    return w_mat.astype(np.float32)


def resize_bicubic_torch(
    x: jnp.ndarray,
    out_shape: tuple[int, int],
    scale: tuple[float, float] | None = None,
) -> jnp.ndarray:
    """Resize (..., H, W, C) with torch bicubic a=-0.75 semantics, as two
    static-matrix matmuls (MXU-friendly, exactly differentiable)."""
    *_, h, w, _ = x.shape
    h2, w2 = out_shape
    sh, sw = scale if scale is not None else (None, None)
    wh = jnp.asarray(_resize_cubic_weights(h, h2, sh))
    ww = jnp.asarray(_resize_cubic_weights(w, w2, sw))
    out = jnp.einsum("ih,...hwc->...iwc", wh, x)
    return jnp.einsum("jw,...iwc->...ijc", ww, out)


def upsample_nearest(x: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    """(..., H, W, C) -> (..., H*f, W*f, C), nearest neighbor."""
    x = jnp.repeat(x, factor, axis=-3)
    return jnp.repeat(x, factor, axis=-2)
