"""Raw network outputs -> world-space Gaussians.

Mirrors /root/reference/src/model/encoder/common/gaussian_adapter.py:30-117:
sigmoid scale mapping x depth x pixel-size multiplier, quaternion normalize,
SH degree damping mask, covariance rotated to world, means from camera rays,
SH rotated by the camera-to-world rotation (exact Ivanic recursion instead of
e3nn Wigner-D — see geometry/sh.py).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..geometry.gaussians import build_covariance
from ..geometry.projection import get_world_rays
from ..geometry.sh import rotate_sh


@dataclass(frozen=True)
class GaussianAdapterCfg:
    gaussian_scale_min: float = 0.5
    gaussian_scale_max: float = 15.0
    sh_degree: int = 4

    @property
    def d_sh(self) -> int:
        return (self.sh_degree + 1) ** 2

    @property
    def d_in(self) -> int:
        return 7 + 3 * self.d_sh


def sh_mask(sh_degree: int) -> jnp.ndarray:
    """Damp view-dependent components at init (gaussian_adapter.py:40-46)."""
    mask = [1.0]
    for degree in range(1, sh_degree + 1):
        mask.extend([0.1 * 0.25**degree] * (2 * degree + 1))
    return jnp.asarray(mask, jnp.float32)


def adapt_gaussians(
    cfg: GaussianAdapterCfg,
    extrinsics: jnp.ndarray,  # (b, v, 4, 4)
    intrinsics: jnp.ndarray,  # (b, v, 3, 3) normalized
    coordinates: jnp.ndarray,  # (b, v, r, 2) normalized xy ray coords
    depths: jnp.ndarray,  # (b, v, r)
    opacities: jnp.ndarray,  # (b, v, r)
    raw_gaussians: jnp.ndarray,  # (b, v, r, 3 + 4 + 3 * d_sh)
    image_shape: tuple[int, int],
    eps: float = 1e-8,
):
    """Returns dict with means/covariances/harmonics/opacities/scales/rotations,
    each shaped (b, v, r, ...)."""
    h, w = image_shape
    scales = raw_gaussians[..., :3]
    rotations = raw_gaussians[..., 3:7]
    sh = raw_gaussians[..., 7:]

    smin, smax = cfg.gaussian_scale_min, cfg.gaussian_scale_max
    scales = smin + (smax - smin) * jax.nn.sigmoid(scales)
    pixel_size = jnp.asarray([1.0 / w, 1.0 / h], scales.dtype)
    k2x2_inv = jnp.linalg.inv(intrinsics[..., :2, :2])
    multiplier = 0.1 * jnp.einsum("...ij,j->...i", k2x2_inv, pixel_size, precision="highest").sum(-1)
    scales = scales * depths[..., None] * multiplier[..., None, None]

    rotations = rotations / (
        jnp.linalg.norm(rotations, axis=-1, keepdims=True) + eps
    )

    sh = sh.reshape(*sh.shape[:-1], 3, cfg.d_sh) * sh_mask(cfg.sh_degree)

    covariances = build_covariance(scales, rotations)
    c2w_rot = extrinsics[..., None, :3, :3]  # broadcast over r
    covariances = jnp.matmul(
        jnp.matmul(c2w_rot, covariances, precision="highest"),
        jnp.swapaxes(c2w_rot, -1, -2),
        precision="highest",
    )

    origins, directions = get_world_rays(
        coordinates, extrinsics[:, :, None], intrinsics[:, :, None]
    )
    means = origins + directions * depths[..., None]

    harmonics = rotate_sh(sh, c2w_rot[..., None, :, :])

    return {
        "means": means,
        "covariances": covariances,
        "harmonics": harmonics,
        "opacities": opacities,
        "scales": scales,
        "rotations": rotations,
    }
