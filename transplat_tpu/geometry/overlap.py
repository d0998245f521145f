"""View-overlap estimation for evaluation-index generation.

The reference computes exact ray-segment/image intersections
(/root/reference/src/geometry/epipolar_lines.py project_rays) only to read the
boolean `overlaps_image`. We compute the same decision by testing the ray's
projection at log-spaced depths — convex image bounds make dense sampling
reliable — which vectorizes cleanly on TPU/CPU.
"""

from __future__ import annotations

import jax.numpy as jnp

from .projection import get_world_rays, project, sample_image_grid


def rays_overlap_image(
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    extrinsics: jnp.ndarray,
    intrinsics: jnp.ndarray,
    t_min: float = 1e-3,
    t_max: float = 1e4,
    num_samples: int = 48,
    epsilon: float = 1e-6,
) -> jnp.ndarray:
    """For rays (N, 3)+(N, 3): does each ray ever project inside the image?

    Returns (N,) bool.
    """
    ts = jnp.logspace(jnp.log10(t_min), jnp.log10(t_max), num_samples)
    points = origins[:, None, :] + ts[None, :, None] * directions[:, None, :]
    xy, in_front = project(points, extrinsics, intrinsics)
    inside = (
        (xy >= -epsilon).all(-1)
        & (xy <= 1 + epsilon).all(-1)
        & in_front
    )
    return inside.any(axis=1)


def view_overlap(
    extrinsics_a: jnp.ndarray,
    intrinsics_a: jnp.ndarray,
    extrinsics_b: jnp.ndarray,
    intrinsics_b: jnp.ndarray,
    grid_shape: tuple[int, int] = (32, 32),
) -> jnp.ndarray:
    """Fraction of view A's rays that enter view B's frustum. Returns scalar."""
    xy, _ = sample_image_grid(grid_shape)
    origins, directions = get_world_rays(
        xy.reshape(-1, 2), extrinsics_a, intrinsics_a
    )
    return rays_overlap_image(
        origins, directions, extrinsics_b, intrinsics_b
    ).mean()
