"""Bilinear sampling / resizing with torch-compatible conventions.

The reference model mixes several interpolation conventions; we reproduce each
exactly so converted weights stay numerically faithful:
  * grid_sample(align_corners=False, padding_mode="zeros") — deformable attn
  * F.interpolate(mode="bilinear", align_corners=True)      — feature resizing
  * F.interpolate(mode="nearest")                            — UNet upsampling
"""

from __future__ import annotations

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


def resize_bilinear(
    x: jnp.ndarray, out_shape: tuple[int, int], align_corners: bool = True
) -> jnp.ndarray:
    """Resize (..., H, W, C) -> (..., h2, w2, C), torch F.interpolate semantics."""
    *batch, h, w, c = x.shape
    h2, w2 = out_shape
    if align_corners:
        ys = jnp.linspace(0.0, h - 1.0, h2) if h2 > 1 else jnp.zeros((1,))
        xs = jnp.linspace(0.0, w - 1.0, w2) if w2 > 1 else jnp.zeros((1,))
    else:
        ys = (jnp.arange(h2) + 0.5) * (h / h2) - 0.5
        xs = (jnp.arange(w2) + 0.5) * (w / w2) - 0.5
        ys = jnp.clip(ys, 0.0, h - 1.0)
        xs = jnp.clip(xs, 0.0, w - 1.0)

    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    wy = (ys - y0)[:, None, None]  # (h2, 1, 1)
    wx = (xs - x0)[None, :, None]  # (1, w2, 1)

    xf = x.reshape(-1, h, w, c)
    r0 = xf[:, y0][:, :, x0]  # (N, h2, w2, C)
    r1 = xf[:, y0][:, :, x1]
    r2 = xf[:, y1][:, :, x0]
    r3 = xf[:, y1][:, :, x1]
    out = (
        r0 * (1 - wy) * (1 - wx)
        + r1 * (1 - wy) * wx
        + r2 * wy * (1 - wx)
        + r3 * wy * wx
    )
    return out.reshape(*batch, h2, w2, c)


def upsample_nearest(x: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    """(..., H, W, C) -> (..., H*f, W*f, C), nearest neighbor."""
    x = jnp.repeat(x, factor, axis=-3)
    return jnp.repeat(x, factor, axis=-2)
