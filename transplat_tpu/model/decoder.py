"""Splatting decoder: Gaussians + target cameras -> rendered views.

Mirrors /root/reference/src/model/decoder/decoder_splatting_cuda.py but renders
all (batch x target view) cameras in one vmapped call instead of a per-view
Python loop.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import NamedTuple

import jax.numpy as jnp

from ..ops.rasterizer import render, render_depth
from ..ops.rasterizer.api import RasterizeConfig
from .types import Gaussians


class DecoderOutput(NamedTuple):
    color: jnp.ndarray  # (b, tv, h, w, 3)
    depth: jnp.ndarray | None  # (b, tv, h, w) or None
    radii: jnp.ndarray  # (b, tv, g)


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
) -> DecoderOutput:
    b, tv = extrinsics.shape[:2]
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

    return DecoderOutput(color=color, depth=depth, radii=radii)
