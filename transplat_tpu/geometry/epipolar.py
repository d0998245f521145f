"""Plane-sweep / epipolar sampling geometry.

TPU-first re-design of the reference's grid builder
(/root/reference/src/model/encoder/matching/depth_predictor_trans.py:11-57):
batched (b, v)-first, no Python pair loops — pair composition is expressed by
the caller via index arrays + vmap.

Conventions (kept bit-compatible with the reference so sampled cost volumes
match):
  * pixel grid uses integer pixel coordinates 0..W-1 (no half-pixel shift)
  * returned sample locations are in [0, 1], normalized by (W-1, H-1)
  * the bilinear sampler consuming them uses torch-grid_sample
    align_corners=False semantics with zero padding (see ops.interpolate)
"""

from __future__ import annotations

import jax.numpy as jnp


def relative_pose(extrinsics_ref: jnp.ndarray, extrinsics_tgt: jnp.ndarray) -> jnp.ndarray:
    """Transform taking ref-camera points into tgt-camera coordinates.

    extrinsics are camera-to-world (..., 4, 4). Returns (..., 4, 4).
    """
    return jnp.matmul(
        jnp.linalg.inv(extrinsics_tgt), extrinsics_ref, precision="highest"
    )


def pixel_grid(h: int, w: int, dtype=jnp.float32) -> jnp.ndarray:
    """Homogeneous integer pixel coordinates, shape (3, h*w): rows (x, y, 1)."""
    ys, xs = jnp.meshgrid(
        jnp.arange(h, dtype=dtype), jnp.arange(w, dtype=dtype), indexing="ij"
    )
    ones = jnp.ones_like(xs)
    return jnp.stack([xs.reshape(-1), ys.reshape(-1), ones.reshape(-1)], axis=0)


def epipolar_sample_grid(
    intrinsics_px: jnp.ndarray,
    rel_pose: jnp.ndarray,
    depths: jnp.ndarray,
    h: int,
    w: int,
    clamp_min_depth: float = 1e-3,
) -> jnp.ndarray:
    """Project each ref pixel at D depth candidates into the other view.

    Args:
      intrinsics_px: (..., 3, 3) pixel-unit intrinsics (shared by both views)
      rel_pose:      (..., 4, 4) ref-cam -> other-cam transform
      depths:        (..., D) metric depth candidates (per ref view)
    Returns:
      loc01: (..., D, h*w, 2) sample locations in [0, 1] (x, y), normalized by
             (w-1, h-1); out-of-frustum points land outside [0, 1].
    """
    grid = pixel_grid(h, w, dtype=depths.dtype)  # (3, HW)
    rays = jnp.einsum("...ij,jn->...in", jnp.linalg.inv(intrinsics_px), grid, precision="highest")
    rays = jnp.einsum("...ij,...jn->...in", rel_pose[..., :3, :3], rays, precision="highest")
    # (..., 3, D, HW): scale rotated rays by each depth candidate, translate.
    points = rays[..., :, None, :] * depths[..., None, :, None]
    points = points + rel_pose[..., :3, 3:4][..., None, :]
    # Re-project with intrinsics.
    points = jnp.einsum("...ij,...jdn->...idn", intrinsics_px, points, precision="highest")
    z = jnp.maximum(points[..., 2:3, :, :], clamp_min_depth)
    xy = points[..., :2, :, :] / z  # (..., 2, D, HW)
    x01 = xy[..., 0, :, :] / (w - 1)
    y01 = xy[..., 1, :, :] / (h - 1)
    return jnp.stack([x01, y01], axis=-1)  # (..., D, HW, 2)


def inverse_depth_candidates(
    near: jnp.ndarray, far: jnp.ndarray, num_samples: int
) -> jnp.ndarray:
    """D disparities linearly spaced in inverse depth between 1/far and 1/near.

    near/far: (...,) -> (..., D), ascending in disparity (far -> near).
    """
    lo = 1.0 / far
    hi = 1.0 / near
    t = jnp.linspace(0.0, 1.0, num_samples, dtype=jnp.result_type(near, far))
    return lo[..., None] + t * (hi - lo)[..., None]
