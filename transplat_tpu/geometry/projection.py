"""Camera geometry in pure jnp.

Semantics match the reference TranSplat geometry layer
(/root/reference/src/geometry/projection.py) but are written batch-first and
functional so they vmap/jit cleanly:

  * extrinsics are OpenCV-style camera-to-world 4x4 matrices
  * intrinsics are 3x3, normalized to [0, 1] image coordinates unless noted
  * pixel-center convention: coordinate (x + 0.5)/W, (y + 0.5)/H
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1.1920929e-07  # float32 machine epsilon, matches torch.finfo(float32).eps


def homogenize_points(points: jnp.ndarray) -> jnp.ndarray:
    """(..., d) xyz -> (..., d+1) xyz1."""
    return jnp.concatenate([points, jnp.ones_like(points[..., :1])], axis=-1)


def homogenize_vectors(vectors: jnp.ndarray) -> jnp.ndarray:
    """(..., d) xyz -> (..., d+1) xyz0."""
    return jnp.concatenate([vectors, jnp.zeros_like(vectors[..., :1])], axis=-1)


def transform_rigid(coords: jnp.ndarray, transformation: jnp.ndarray) -> jnp.ndarray:
    """Apply (..., d, d) transform to (..., d) homogeneous coords."""
    return jnp.einsum("...ij,...j->...i", transformation, coords, precision="highest")


def transform_cam2world(coords: jnp.ndarray, extrinsics: jnp.ndarray) -> jnp.ndarray:
    return transform_rigid(coords, extrinsics)


def transform_world2cam(coords: jnp.ndarray, extrinsics: jnp.ndarray) -> jnp.ndarray:
    return transform_rigid(coords, jnp.linalg.inv(extrinsics))


def project_camera_space(
    points: jnp.ndarray,
    intrinsics: jnp.ndarray,
    epsilon: float = _EPS,
    infinity: float = 1e8,
) -> jnp.ndarray:
    """Perspective-divide then apply intrinsics. points: (..., 3) -> (..., 2)."""
    z = points[..., -1:]
    points = points / (z + epsilon)
    points = jnp.nan_to_num(points, posinf=infinity, neginf=-infinity)
    points = jnp.einsum("...ij,...j->...i", intrinsics, points, precision="highest")
    return points[..., :-1]


def project(
    points: jnp.ndarray,
    extrinsics: jnp.ndarray,
    intrinsics: jnp.ndarray,
    epsilon: float = _EPS,
):
    """World points -> normalized image xy. Returns (xy, in_front_of_camera)."""
    points = homogenize_points(points)
    points = transform_world2cam(points, extrinsics)[..., :-1]
    in_front = points[..., -1] >= 0
    return project_camera_space(points, intrinsics, epsilon=epsilon), in_front


def unproject(
    coordinates: jnp.ndarray,
    z: jnp.ndarray,
    intrinsics: jnp.ndarray,
) -> jnp.ndarray:
    """Normalized image xy + depth -> camera-space xyz."""
    coordinates = homogenize_points(coordinates)
    directions = jnp.einsum(
        "...ij,...j->...i", jnp.linalg.inv(intrinsics), coordinates,
        precision="highest"
    )
    return directions * z[..., None]


def get_world_rays(
    coordinates: jnp.ndarray,
    extrinsics: jnp.ndarray,
    intrinsics: jnp.ndarray,
):
    """Normalized image xy -> (origins, unit directions) in world space."""
    directions = unproject(
        coordinates, jnp.ones_like(coordinates[..., 0]), intrinsics
    )
    directions = directions / jnp.linalg.norm(directions, axis=-1, keepdims=True)
    directions = homogenize_vectors(directions)
    directions = transform_cam2world(directions, extrinsics)[..., :-1]
    origins = jnp.broadcast_to(extrinsics[..., :-1, -1], directions.shape)
    return origins, directions


def sample_image_grid(shape: tuple[int, int], dtype=jnp.float32):
    """Pixel-center image grid.

    Returns:
      coordinates: (h, w, 2) float xy in (0, 1), pixel centers
      indices:     (h, w, 2) int (row, col)
    """
    h, w = shape
    row = jnp.arange(h)
    col = jnp.arange(w)
    indices = jnp.stack(jnp.meshgrid(row, col, indexing="ij"), axis=-1)
    y = (row.astype(dtype) + 0.5) / h
    x = (col.astype(dtype) + 0.5) / w
    xs, ys = jnp.meshgrid(x, y, indexing="xy")
    coordinates = jnp.stack([xs, ys], axis=-1)
    return coordinates, indices


def get_fov(intrinsics: jnp.ndarray) -> jnp.ndarray:
    """Horizontal/vertical field of view from normalized intrinsics.

    intrinsics: (..., 3, 3) -> (..., 2) [fov_x, fov_y] in radians.
    """
    intrinsics_inv = jnp.linalg.inv(intrinsics)

    def ray(v):
        vec = jnp.einsum("...ij,j->...i", intrinsics_inv, jnp.asarray(v, dtype=intrinsics.dtype), precision="highest")
        return vec / jnp.linalg.norm(vec, axis=-1, keepdims=True)

    left, right = ray([0.0, 0.5, 1.0]), ray([1.0, 0.5, 1.0])
    top, bottom = ray([0.5, 0.0, 1.0]), ray([0.5, 1.0, 1.0])
    fov_x = jnp.arccos(jnp.sum(left * right, axis=-1))
    fov_y = jnp.arccos(jnp.sum(top * bottom, axis=-1))
    return jnp.stack([fov_x, fov_y], axis=-1)


def unnormalize_intrinsics(intrinsics: jnp.ndarray, image_shape: tuple[int, int]) -> jnp.ndarray:
    """Scale [0,1]-normalized intrinsics to pixel units for (h, w) images."""
    h, w = image_shape
    scale = jnp.asarray([[w], [h], [1.0]], dtype=intrinsics.dtype)
    return intrinsics * scale
