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
from .tiles import (
    bin_gaussians,
    bin_gaussians_fast,
    bin_gaussians_scatter,
    composite_tiles,
)


@dataclass(frozen=True)
class RasterizeConfig:
    tile_size: int = 16
    max_tiles_per_gaussian: int = 32  # only used by the sort-based binning
    capacity: int = 1024
    chunk: int = 256  # composite sweep granularity (256 measured > 128)
    remat: bool = True
    mode: str = "auto"  # "auto" | "pallas" | "tiled" | "reference"
    binning: str = "scatter"  # "scatter" | "fast" (searchsorted) | "sort"
    interpret: bool = False  # run Pallas kernels in interpreter mode (CPU)
    stream_window: int = 4096  # Gaussians per binning-kernel grid window
    bin_chunk: int = 128  # Gaussians per binning inner chunk (<=256: exact bf16)
    level_headroom: float = 1.5  # tree-level capacity over average coverage
    # "f32": the default differentiable path (exact mixed-split routing,
    # 2-way transmittance cumsum, <= ~3.5e-5 relative). "bf16": inference-
    # only forward tier — single-pass bf16 routing + cumsum (~2^-8 relative,
    # visually lossless for eval preview rendering); jax.grad through it
    # raises. Reference precedent: CUDA rasterizer offers no reduced-
    # precision tier, so this is TPU-only headroom.
    precision: str = "f32"

    def resolved_mode(self) -> str:
        if self.mode != "auto":
            return self.mode
        return "pallas" if jax.default_backend() == "tpu" else "tiled"


class RenderOutput(NamedTuple):
    color: jnp.ndarray  # (B, h, w, 3)
    radii: jnp.ndarray  # (B, G) screen radii (0 for invisible)
    overflow: jnp.ndarray  # (B,) dropped pairs (capacity diagnostics)


def _project_and_bin(
    extrinsics,
    intrinsics,
    near,
    means,
    covariances,
    sh,
    opacities,
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
    if cfg.binning == "scatter":
        tiles = bin_gaussians_scatter(
            proj,
            image_shape,
            tile_size=cfg.tile_size,
            max_tiles_per_gaussian=cfg.max_tiles_per_gaussian,
            capacity=cfg.capacity,
        )
    elif cfg.binning == "fast":
        tiles = bin_gaussians_fast(
            proj, image_shape, tile_size=cfg.tile_size, capacity=cfg.capacity
        )
    else:
        tiles = bin_gaussians(
            proj,
            image_shape,
            tile_size=cfg.tile_size,
            max_tiles_per_gaussian=cfg.max_tiles_per_gaussian,
            capacity=cfg.capacity,
        )
    return proj, tiles


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
    if cfg.mode == "reference":
        if scale_invariant:
            scale = 1.0 / near
            extrinsics = extrinsics.at[:3, 3].multiply(scale)
            covariances = covariances * scale**2
            means = means * scale
        fov = get_fov(intrinsics[None])[0]
        proj = project_gaussians(
            means, covariances, sh, opacities, extrinsics,
            jnp.tan(0.5 * fov[0]), jnp.tan(0.5 * fov[1]), image_shape,
        )
        img = render_reference_view(proj, image_shape, background, feature)
        overflow = jnp.zeros((), jnp.int32)
        radii = jnp.where(proj.valid, proj.radius, 0.0)
        return img, radii, overflow

    proj, tiles = _project_and_bin(
        extrinsics, intrinsics, near, means, covariances, sh, opacities,
        image_shape, cfg, scale_invariant,
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
    radii = jnp.where(proj.valid, proj.radius, 0.0)
    return img, radii, tiles.overflow


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
    feature: jnp.ndarray | None = None,  # (B, G, C<=8) color override
) -> RenderOutput:
    """Render batched views of batched Gaussian sets. Returns (B, h, w, C)."""
    mode = cfg.resolved_mode()
    if mode == "pallas":
        from .pallas_binning import (
            bin_single_level,
            bin_tree,
            build_sorted_features,
            level_caps,
            tree_plan,
        )
        from .pallas_composite import composite_pallas

        def prep(e, i, n, m, c, s, o, ft):
            if scale_invariant:
                scale = 1.0 / n
                e = e.at[:3, 3].multiply(scale)
                c = c * scale**2
                m = m * scale
            fov = get_fov(i[None])[0]
            proj = project_gaussians(
                m, c, s, o, e, jnp.tan(0.5 * fov[0]), jnp.tan(0.5 * fov[1]),
                image_shape,
            )
            feat = build_sorted_features(proj, ft)
            radii = jnp.where(proj.valid, proj.radius, 0.0)
            return feat, radii

        in_axes = (0, 0, 0, 0, 0, 0, 0, 0 if feature is not None else None)
        feat, radii = jax.vmap(prep, in_axes=in_axes)(
            extrinsics, intrinsics, near, means, covariances, sh, opacities, feature
        )

        ts = cfg.tile_size
        ntx = (image_shape[1] + ts - 1) // ts
        nty = (image_shape[0] + ts - 1) // ts
        num_tiles = ntx * nty
        b = feat.shape[0]

        # Pad the Gaussian stream to a whole number of kernel stream windows;
        # padding columns have radius 0 so they never cover a tile.
        bcg = cfg.bin_chunk
        g_total = feat.shape[2]
        window = max(bcg, min(cfg.stream_window, -(-g_total // bcg) * bcg))
        window = -(-window // bcg) * bcg  # multiple of bin_chunk
        pad = (-g_total) % window
        if pad:
            feat = jnp.pad(feat, ((0, 0), (0, 0), (0, pad)))

        c_stream = 3 if feature is None else feature.shape[-1]
        f_route = 7 + c_stream  # live worklist rows (geometry + colors)
        levels = tree_plan(nty, ntx) if num_tiles >= 64 else None
        if levels is not None:
            caps = level_caps(
                levels, g_total, ts, nty, ntx, cfg.capacity, bcg,
                headroom=cfg.level_headroom,
            )
            gdat, counts, overflow = bin_tree(
                feat, ts, ntx, nty, levels, caps, bcg, window, cfg.interpret,
                f_route, cfg.precision,
            )
        else:
            gdat, counts = bin_single_level(
                feat, ts, ntx, nty, cfg.capacity, bcg, window, cfg.interpret,
                f_route, cfg.precision,
            )
            overflow = jnp.sum(
                jnp.maximum(counts - cfg.capacity, 0), axis=1
            ).astype(jnp.int32)

        p = ts * ts
        c_out = c_stream
        # Full-width worklists go straight into the composite: the binning
        # drops entries at capacity (the [capacity, width) tail is exactly
        # zero) and the composite additionally bounds its sweep to the clean
        # [0, capacity) prefix — no slice, no copy, no junk.
        assert cfg.capacity % cfg.chunk == 0
        acc, tfin = composite_pallas(
            gdat,
            jnp.minimum(counts, cfg.capacity).reshape(-1),
            ts, ntx, levels, num_tiles, cfg.chunk, cfg.interpret, c_out,
            cfg.capacity,
            1 if cfg.precision == "bf16" else 2,
        )
        acc = acc.reshape(b, num_tiles, p, 8)[..., :c_out]
        tfin = tfin.reshape(b, num_tiles, p)
        out = acc + tfin[..., None] * background[:, None, None, :]
        if levels is not None:
            # Tree (path-major) tile order: per level a (fy, fx) block split.
            nl = len(levels)
            dims = [b]
            for fy, fx in levels:
                dims.extend((fy, fx))
            out = out.reshape(*dims, ts, ts, c_out)
            perm = (
                [0]
                + [1 + 2 * j for j in range(nl)]
                + [1 + 2 * nl]
                + [2 + 2 * j for j in range(nl)]
                + [2 + 2 * nl, 3 + 2 * nl]
            )
            out = out.transpose(perm).reshape(b, nty * ts, ntx * ts, c_out)
        else:
            out = out.reshape(b, nty, ntx, ts, ts, c_out)
            out = out.transpose(0, 1, 3, 2, 4, 5).reshape(
                b, nty * ts, ntx * ts, c_out
            )
        img = out[:, : image_shape[0], : image_shape[1]]
        return RenderOutput(color=img, radii=radii, overflow=overflow)

    fn = partial(
        _render_one_view,
        image_shape=image_shape,
        cfg=cfg,
        scale_invariant=scale_invariant,
    )
    in_axes = (0,) * 9 + (0 if feature is not None else None,)
    img, radii, overflow = jax.vmap(fn, in_axes=in_axes)(
        extrinsics, intrinsics, near, far, background, means, covariances, sh,
        opacities, feature,
    )
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
        jnp.einsum("bij,bgj->bgi", w2c[:, :3, :3], means, precision="highest")
        + w2c[:, None, :3, 3]
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

    out = render(
        extrinsics,
        intrinsics,
        near,
        far,
        image_shape,
        bg,
        means,
        covariances,
        dummy_sh,
        opacities,
        scale_invariant=scale_invariant,
        cfg=cfg,
        feature=feat[..., None],
    )
    return out.color[..., 0]
