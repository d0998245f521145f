"""Batched differentiable rendering API.

Replaces the reference's per-view Python loop around the CUDA rasterizer
(/root/reference/src/model/decoder/cuda_splatting.py:100-135) with a single
vmapped, jit-compiled pipeline: projection -> tile binning -> tiled composite.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ...geometry.projection import get_fov
from .projection import project_gaussians
from .reference import render_reference_view
from .tiles import bin_gaussians, composite_tiles


@dataclass(frozen=True)
class RasterizeConfig:
    tile_size: int = 16
    max_tiles_per_gaussian: int = 32
    capacity: int = 1024
    chunk: int = 128
    remat: bool = True
    mode: str = "tiled"  # "tiled" | "reference"


class RenderOutput(NamedTuple):
    color: jnp.ndarray  # (B, h, w, 3)
    radii: jnp.ndarray  # (B, G) screen radii (0 for invisible)
    overflow: jnp.ndarray  # (B,) dropped pairs (capacity diagnostics)


def _render_one_view(
    extrinsics,
    intrinsics,
    near,
    far,
    background,
    means,
    covariances,
    sh,
    opacities,
    feature,
    image_shape: tuple[int, int],
    cfg: RasterizeConfig,
    scale_invariant: bool,
):
    if scale_invariant:
        scale = 1.0 / near
        extrinsics = extrinsics.at[:3, 3].multiply(scale)
        covariances = covariances * scale**2
        means = means * scale

    fov = get_fov(intrinsics[None])[0]
    tan_fovx = jnp.tan(0.5 * fov[0])
    tan_fovy = jnp.tan(0.5 * fov[1])

    proj = project_gaussians(
        means, covariances, sh, opacities, extrinsics, tan_fovx, tan_fovy, image_shape
    )

    if cfg.mode == "reference":
        img = render_reference_view(proj, image_shape, background, feature)
        overflow = jnp.zeros((), jnp.int32)
    else:
        tiles = bin_gaussians(
            proj,
            image_shape,
            tile_size=cfg.tile_size,
            max_tiles_per_gaussian=cfg.max_tiles_per_gaussian,
            capacity=cfg.capacity,
        )
        img = composite_tiles(
            proj,
            tiles,
            image_shape,
            background,
            feature,
            tile_size=cfg.tile_size,
            chunk=cfg.chunk,
            remat=cfg.remat,
        )
        overflow = tiles.overflow
    radii = jnp.where(proj.valid, proj.radius, 0.0)
    return img, radii, overflow


def render(
    extrinsics: jnp.ndarray,  # (B, 4, 4) camera-to-world
    intrinsics: jnp.ndarray,  # (B, 3, 3) normalized
    near: jnp.ndarray,  # (B,)
    far: jnp.ndarray,  # (B,)
    image_shape: tuple[int, int],
    background: jnp.ndarray,  # (B, 3)
    means: jnp.ndarray,  # (B, G, 3)
    covariances: jnp.ndarray,  # (B, G, 3, 3)
    sh: jnp.ndarray,  # (B, G, 3, n_sh)
    opacities: jnp.ndarray,  # (B, G)
    scale_invariant: bool = True,
    cfg: RasterizeConfig = RasterizeConfig(),
) -> RenderOutput:
    """Render batched views of batched Gaussian sets. Returns (B, h, w, 3)."""
    fn = partial(
        _render_one_view,
        image_shape=image_shape,
        cfg=cfg,
        scale_invariant=scale_invariant,
    )
    img, radii, overflow = jax.vmap(
        lambda e, i, n, f, bg, m, c, s, o: fn(e, i, n, f, bg, m, c, s, o, None)
    )(extrinsics, intrinsics, near, far, background, means, covariances, sh, opacities)
    return RenderOutput(color=img, radii=radii, overflow=overflow)


def render_depth(
    extrinsics: jnp.ndarray,
    intrinsics: jnp.ndarray,
    near: jnp.ndarray,
    far: jnp.ndarray,
    image_shape: tuple[int, int],
    means: jnp.ndarray,
    covariances: jnp.ndarray,
    opacities: jnp.ndarray,
    scale_invariant: bool = True,
    mode: str = "depth",
    cfg: RasterizeConfig = RasterizeConfig(),
) -> jnp.ndarray:
    """Render per-pixel expected depth (B, h, w) via feature compositing.

    Mirrors /root/reference/src/model/decoder/cuda_splatting.py:375-417
    (depth-as-color), supporting depth / disparity / relative_disparity / log.
    """
    w2c = jnp.linalg.inv(extrinsics)
    cam_z = (
        jnp.einsum("bij,bgj->bgi", w2c[:, :3, :3], means) + w2c[:, None, :3, 3]
    )[..., 2]
    if mode == "depth":
        feat = cam_z
    elif mode == "disparity":
        feat = 1.0 / cam_z
    elif mode == "relative_disparity":
        near_ = near[:, None]
        far_ = far[:, None]
        feat = 1.0 - (1.0 / cam_z - 1.0 / far_) / (1.0 / near_ - 1.0 / far_)
    elif mode == "log":
        feat = jnp.log(jnp.clip(cam_z, near[:, None], far[:, None]))
    else:
        raise ValueError(f"unknown depth mode {mode}")

    # Zero-degree SH carrying the depth feature; background = 0 (one channel,
    # matching the feature width).
    dummy_sh = jnp.zeros(means.shape[:2] + (3, 1), means.dtype)
    bg = jnp.zeros((means.shape[0], 1), means.dtype)

    fn = partial(
        _render_one_view,
        image_shape=image_shape,
        cfg=cfg,
        scale_invariant=scale_invariant,
    )
    img, _, _ = jax.vmap(
        lambda e, i, n, f, bg_, m, c, s, o, ft: fn(e, i, n, f, bg_, m, c, s, o, ft)
    )(
        extrinsics,
        intrinsics,
        near,
        far,
        bg,
        means,
        covariances,
        dummy_sh,
        opacities,
        feat[..., None],
    )
    return img[..., 0]
