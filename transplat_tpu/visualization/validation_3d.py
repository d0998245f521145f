"""3D validation visuals: orthographic Gaussian projections + camera wires.

Mirrors /root/reference/src/visualization/validation_in_3d.py and the
orthographic trick of cuda_splatting.render_cuda_orthographic:139-174 (move
the camera far back with a tiny fov to approximate an orthographic view).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..model.types import Gaussians
from ..ops.rasterizer import render
from ..ops.rasterizer.api import RasterizeConfig


def render_orthographic(
    gaussians: Gaussians,
    extrinsics: jnp.ndarray,  # (b, 4, 4) look direction
    width: float,
    height: float,
    near: float,
    far: float,
    image_shape: tuple[int, int] = (256, 256),
    fov_degrees: float = 0.1,
    cfg: RasterizeConfig = RasterizeConfig(),
) -> jnp.ndarray:
    """Quasi-orthographic render of the Gaussian cloud. Returns (b, h, w, 3)."""
    b = extrinsics.shape[0]
    fov_x = np.radians(fov_degrees)
    tan_fov_x = np.tan(0.5 * fov_x)
    distance = (0.5 * width) / tan_fov_x
    tan_fov_y = 0.5 * height / distance

    # Synthesize intrinsics with the tiny fov (normalized units).
    fx = 0.5 / tan_fov_x
    fy = 0.5 / tan_fov_y
    intr = jnp.broadcast_to(
        jnp.array([[fx, 0, 0.5], [0, fy, 0.5], [0, 0, 1.0]], jnp.float32),
        (b, 3, 3),
    )
    move_back = jnp.eye(4).at[2, 3].set(-distance)
    extr = extrinsics @ move_back

    out = render(
        extr,
        intr,
        jnp.full((b,), near + distance, jnp.float32),
        jnp.full((b,), far + distance, jnp.float32),
        image_shape,
        jnp.zeros((b, 3), jnp.float32),
        gaussians.means,
        gaussians.covariances,
        gaussians.harmonics,
        gaussians.opacities,
        scale_invariant=False,
        cfg=cfg,
    )
    return out.color


def draw_line(image: np.ndarray, p0, p1, color=(1.0, 0.0, 0.0)) -> None:
    """Draw a line segment (normalized [0,1] coords) in-place."""
    h, w = image.shape[:2]
    n = int(max(abs(p1[0] - p0[0]) * w, abs(p1[1] - p0[1]) * h, 1)) + 1
    ts = np.linspace(0.0, 1.0, n)
    xs = np.clip(((p0[0] + ts * (p1[0] - p0[0])) * w).astype(int), 0, w - 1)
    ys = np.clip(((p0[1] + ts * (p1[1] - p0[1])) * h).astype(int), 0, h - 1)
    image[ys, xs] = color


def draw_cameras(
    image: np.ndarray,
    extrinsics: np.ndarray,  # (n, 4, 4) cameras to draw
    view_extrinsics: np.ndarray,  # (4, 4) viewing camera
    view_intrinsics: np.ndarray,  # (3, 3)
    frustum_depth: float = 0.3,
    colors=((1.0, 0, 0), (0, 1.0, 0), (0, 0, 1.0), (1.0, 1.0, 0)),
) -> np.ndarray:
    """Overlay wireframe camera frusta onto an image. Returns a copy."""
    from ..geometry.projection import project

    out = np.asarray(image).copy()
    corners_cam = np.array(
        [
            [0, 0, 0],
            [-0.5, -0.5, 1.0],
            [0.5, -0.5, 1.0],
            [0.5, 0.5, 1.0],
            [-0.5, 0.5, 1.0],
        ]
    ) * frustum_depth

    for ci, e in enumerate(np.asarray(extrinsics)):
        world = (e[:3, :3] @ corners_cam.T).T + e[:3, 3]
        xy, valid = project(
            jnp.asarray(world), jnp.asarray(view_extrinsics), jnp.asarray(view_intrinsics)
        )
        xy = np.asarray(xy)
        if not bool(np.all(np.asarray(valid))):
            continue
        color = colors[ci % len(colors)]
        apex = xy[0]
        quad = xy[1:]
        for i in range(4):
            draw_line(out, apex, quad[i], color)
            draw_line(out, quad[i], quad[(i + 1) % 4], color)
    return out
