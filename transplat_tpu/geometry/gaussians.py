"""Gaussian primitive math: quaternion -> rotation, covariance construction.

Semantics match /root/reference/src/model/encoder/common/gaussians.py
(quaternions in xyzw order, covariance = R S S^T R^T).
"""

from __future__ import annotations

import jax.numpy as jnp


def quaternion_to_matrix(quaternions: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Convert (..., 4) xyzw quaternions to (..., 3, 3) rotation matrices."""
    i, j, k, r = jnp.moveaxis(quaternions, -1, 0)
    two_s = 2.0 / (jnp.sum(quaternions * quaternions, axis=-1) + eps)
    o = jnp.stack(
        [
            1 - two_s * (j * j + k * k),
            two_s * (i * j - k * r),
            two_s * (i * k + j * r),
            two_s * (i * j + k * r),
            1 - two_s * (i * i + k * k),
            two_s * (j * k - i * r),
            two_s * (i * k - j * r),
            two_s * (j * k + i * r),
            1 - two_s * (i * i + j * j),
        ],
        axis=-1,
    )
    return o.reshape(*o.shape[:-1], 3, 3)


def build_covariance(scale: jnp.ndarray, rotation_xyzw: jnp.ndarray) -> jnp.ndarray:
    """Covariance = R diag(s^2) R^T for (..., 3) scales, (..., 4) quats."""
    rotation = quaternion_to_matrix(rotation_xyzw)
    scaled = rotation * (scale**2)[..., None, :]
    return jnp.einsum("...ik,...jk->...ij", scaled, rotation, precision="highest")


def covariance_upper_triangle(covariances: jnp.ndarray) -> jnp.ndarray:
    """Pack (..., 3, 3) symmetric covariances into (..., 6) upper triangles
    in row-major order (xx, xy, xz, yy, yz, zz)."""
    return jnp.stack(
        [
            covariances[..., 0, 0],
            covariances[..., 0, 1],
            covariances[..., 0, 2],
            covariances[..., 1, 1],
            covariances[..., 1, 2],
            covariances[..., 2, 2],
        ],
        axis=-1,
    )


def covariance_from_upper_triangle(packed: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`covariance_upper_triangle`."""
    xx, xy, xz, yy, yz, zz = jnp.moveaxis(packed, -1, 0)
    row0 = jnp.stack([xx, xy, xz], axis=-1)
    row1 = jnp.stack([xy, yy, yz], axis=-1)
    row2 = jnp.stack([xz, yz, zz], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)
