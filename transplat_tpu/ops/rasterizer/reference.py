"""Naive per-pixel reference compositor (correctness oracle).

Composites every Gaussian for every pixel in depth order. O(G * H * W) — only
for tests and tiny scenes. The tiled production path must match this to float
tolerance.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .projection import ProjectedGaussians, gaussian_alpha, pixel_centers

TRANSMITTANCE_EPS = 1e-4


def composite_pixels(
    proj: ProjectedGaussians,
    order: jnp.ndarray,
    pixel_xy: jnp.ndarray,
    background: jnp.ndarray,
    feature: jnp.ndarray | None = None,
):
    """Front-to-back composite in the given Gaussian order.

    proj: per-view projected Gaussians; order: (G,) depth-sorted indices;
    pixel_xy: (P, 2); background: (3,); feature: optional (G, C) override for
    per-Gaussian color (used for depth rendering).
    Returns (P, C) colors and (P,) final transmittance.
    """
    mean2d = proj.mean2d[order]
    conic = proj.conic[order]
    opacity = jnp.where(proj.valid, proj.opacity, 0.0)[order]
    radius = proj.radius[order]
    color = (proj.rgb if feature is None else feature)[order]

    # (P, G) alpha matrix.
    alpha = gaussian_alpha(
        conic[None, :, :],
        mean2d[None, :, :],
        opacity[None, :],
        pixel_xy[:, None, :],
        radius[None, :],
    )
    # Transmittance before each Gaussian: exclusive cumprod of (1 - alpha).
    t_before = jnp.concatenate(
        [jnp.ones_like(alpha[:, :1]), jnp.cumprod(1.0 - alpha, axis=-1)[:, :-1]],
        axis=-1,
    )
    # CUDA kernel stops once T drops below 1e-4: those contributions vanish.
    contrib = jnp.where(t_before >= TRANSMITTANCE_EPS, alpha * t_before, 0.0)
    out = jnp.matmul(contrib, color, precision="highest")  # (P, C)
    t_final = jnp.prod(
        jnp.where(t_before >= TRANSMITTANCE_EPS, 1.0 - alpha, 1.0), axis=-1
    )
    out = out + t_final[:, None] * background[None, :]
    return out, t_final


def render_reference_view(
    proj: ProjectedGaussians,
    image_shape: tuple[int, int],
    background: jnp.ndarray,
    feature: jnp.ndarray | None = None,
    chunk: int = 4096,
) -> jnp.ndarray:
    """Render one view with the naive compositor. Returns (h, w, C)."""
    h, w = image_shape
    depth_key = jnp.where(proj.valid, proj.depth, jnp.inf)
    order = jnp.argsort(depth_key)
    pixels = pixel_centers(image_shape).reshape(-1, 2)

    def render_chunk(px):
        out, _ = composite_pixels(proj, order, px, background, feature)
        return out

    n = pixels.shape[0]
    chunks = [
        render_chunk(jax.lax.dynamic_slice_in_dim(pixels, i, chunk, axis=0))
        for i in range(0, n, chunk)
    ] if n > chunk else [render_chunk(pixels)]
    out = jnp.concatenate(chunks, axis=0)[:n]
    c = out.shape[-1]
    return out.reshape(h, w, c)
