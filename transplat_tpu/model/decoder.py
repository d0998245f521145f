"""Splatting decoder: Gaussians + target cameras -> rendered views.

Mirrors /root/reference/src/model/decoder/decoder_splatting_cuda.py but renders
all (batch x target view) cameras in one vmapped call instead of a per-view
Python loop.

Multi-chip (mesh given): the render is wrapped in shard_map with the TARGET
VIEW axis sharded over `sp` and the batch over `dp`. Front-to-back alpha
compositing needs every Gaussian in per-CAMERA depth order, so a
Gaussian-sharded kernel would need a per-camera depth repartition
(an all-to-all per view); sharding cameras instead costs exactly ONE
all-gather of the sp-sharded Gaussian tensors at the shard_map boundary
(~30 MB at the flagship 131k Gaussians — sub-ms on ICI) after which every
chip rasterizes its own views with zero further communication. The encoder
keeps the Gaussian axis sp-sharded right up to this boundary
(training/step.py); SURVEY.md §5.7/§2.11.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import NamedTuple

import jax.numpy as jnp

from ..ops.rasterizer import render, render_depth
from ..ops.rasterizer.api import RasterizeConfig
from .types import Gaussians


class DecoderOutput(NamedTuple):
    color: jnp.ndarray  # (b, tv, h, w, 3)
    depth: jnp.ndarray | None  # (b, tv, h, w) or None
    radii: jnp.ndarray  # (b, tv, g)
    overflow: jnp.ndarray  # (b, tv) worklist entries dropped at capacity


@dataclass(frozen=True)
class DecoderCfg:
    background_color: tuple[float, float, float] = (0.0, 0.0, 0.0)
    rasterize: RasterizeConfig = field(default_factory=RasterizeConfig)


def decode_splatting(
    gaussians: Gaussians,
    extrinsics: jnp.ndarray,  # (b, tv, 4, 4)
    intrinsics: jnp.ndarray,  # (b, tv, 3, 3)
    near: jnp.ndarray,  # (b, tv)
    far: jnp.ndarray,  # (b, tv)
    image_shape: tuple[int, int],
    cfg: DecoderCfg = DecoderCfg(),
    depth_mode: str | None = None,
    mesh=None,
) -> DecoderOutput:
    b, tv = extrinsics.shape[:2]
    if mesh is not None and mesh.shape.get("sp", 1) > 1 and tv % mesh.shape["sp"] == 0:
        return _decode_splatting_sharded(
            gaussians, extrinsics, intrinsics, near, far, image_shape, cfg,
            depth_mode, mesh,
        )
    g = gaussians.means.shape[1]

    def flatten_cam(x):
        return x.reshape(b * tv, *x.shape[2:])

    def repeat_g(x):
        return jnp.repeat(x[:, None], tv, axis=1).reshape(b * tv, *x.shape[1:])

    bg = jnp.broadcast_to(
        jnp.asarray(cfg.background_color, jnp.float32), (b * tv, 3)
    )
    out = render(
        flatten_cam(extrinsics),
        flatten_cam(intrinsics),
        flatten_cam(near),
        flatten_cam(far),
        image_shape,
        bg,
        repeat_g(gaussians.means),
        repeat_g(gaussians.covariances),
        repeat_g(gaussians.harmonics),
        repeat_g(gaussians.opacities),
        cfg=cfg.rasterize,
    )
    color = out.color.reshape(b, tv, *image_shape, 3)
    radii = out.radii.reshape(b, tv, g)
    overflow = out.overflow.reshape(b, tv)

    depth = None
    if depth_mode is not None:
        depth = render_depth(
            flatten_cam(extrinsics),
            flatten_cam(intrinsics),
            flatten_cam(near),
            flatten_cam(far),
            image_shape,
            repeat_g(gaussians.means),
            repeat_g(gaussians.covariances),
            repeat_g(gaussians.opacities),
            mode=depth_mode,
            cfg=cfg.rasterize,
        ).reshape(b, tv, *image_shape)

    return DecoderOutput(color=color, depth=depth, radii=radii, overflow=overflow)


def _decode_splatting_sharded(
    gaussians, extrinsics, intrinsics, near, far, image_shape, cfg, depth_mode, mesh
):
    """shard_map wrapper: batch over dp, target views over sp, Gaussians
    replicated per-shard (the one explicit all-gather — see module docstring).
    """
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    cam = P("dp", "sp")
    gsh = P("dp")  # gathered over sp at the boundary
    out_specs = DecoderOutput(
        color=P("dp", "sp"),
        depth=P("dp", "sp") if depth_mode is not None else None,
        radii=P("dp", "sp"),
        overflow=P("dp", "sp"),
    )

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(gsh, gsh, gsh, gsh, cam, cam, cam, cam),
        out_specs=out_specs,
        check_rep=False,
    )
    def sharded(means, covs, sh, opac, extr, intr, nr, fr):
        local = Gaussians(means=means, covariances=covs, harmonics=sh, opacities=opac)
        return decode_splatting(
            local, extr, intr, nr, fr, image_shape, cfg, depth_mode, mesh=None
        )

    return sharded(
        gaussians.means,
        gaussians.covariances,
        gaussians.harmonics,
        gaussians.opacities,
        extrinsics,
        intrinsics,
        near,
        far,
    )
