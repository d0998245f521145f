"""Per-Gaussian screen-space preparation for the tile rasterizer.

Math follows the EWA-splatting formulation used by the reference's external
CUDA rasterizer (diff-gaussian-rasterization, see SURVEY.md §2.9 and
/root/reference/src/model/decoder/cuda_splatting.py for the calling
convention) so that images and pixel gradients can be matched numerically:

  * camera-space cull at z <= 0.2 (the scale-invariant renorm in the decoder
    puts near at 1.0, so this threshold is safe)
  * perspective Jacobian with tan-fov clamping at 1.3x the frustum
  * +0.3 screen-space low-pass on the 2D covariance diagonal
  * radius = ceil(3 * sqrt(max eigenvalue of 2D covariance))
  * color = max(SH(view direction) + 0.5, 0)

Everything is batched over Gaussians and vmapped over views by the caller.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ...geometry.sh import eval_sh


class ProjectedGaussians(NamedTuple):
    """Screen-space Gaussian data for one view."""

    mean2d: jnp.ndarray  # (G, 2) pixel coordinates
    depth: jnp.ndarray  # (G,) camera-space z
    conic: jnp.ndarray  # (G, 3) inverse 2D covariance (a, b, c) for [[a,b],[b,c]]
    radius: jnp.ndarray  # (G,) screen-space radius in pixels (0 for culled)
    rgb: jnp.ndarray  # (G, 3) view-dependent color (SH evaluated)
    opacity: jnp.ndarray  # (G,)
    valid: jnp.ndarray  # (G,) bool


def project_gaussians(
    means: jnp.ndarray,
    covariances: jnp.ndarray,
    sh: jnp.ndarray,
    opacities: jnp.ndarray,
    extrinsics: jnp.ndarray,
    tan_fovx: jnp.ndarray,
    tan_fovy: jnp.ndarray,
    image_shape: tuple[int, int],
    near_cull: float = 0.2,
    eps: float = 1e-6,
) -> ProjectedGaussians:
    """Project world-space Gaussians into one camera.

    Uses the reference rasterizer's symmetric-frustum convention: focal length
    derived from the field of view, principal point at ((w-1)/2, (h-1)/2)
    ("ndc2Pix"), so results match the CUDA path bit-for-bit-ish.

    Args:
      means:        (G, 3) world positions
      covariances:  (G, 3, 3) world covariances
      sh:           (G, 3, n_sh) SH color coefficients (graphics basis)
      opacities:    (G,)
      extrinsics:   (4, 4) camera-to-world
      tan_fovx/y:   scalars, tan of half field of view
      image_shape:  (h, w)
    """
    h, w = image_shape
    w2c = jnp.linalg.inv(extrinsics)
    rot = w2c[:3, :3]
    trans = w2c[:3, 3]

    # Camera-space positions.
    t = jnp.matmul(means, rot.T, precision="highest") + trans  # (G, 3)
    depth = t[..., 2]
    valid = depth > near_cull

    fx = (0.5 * w) / tan_fovx
    fy = (0.5 * h) / tan_fovy
    cx = (w - 1.0) / 2.0
    cy = (h - 1.0) / 2.0

    z = jnp.where(valid, depth, 1.0)
    mean2d = jnp.stack(
        [fx * t[..., 0] / z + cx, fy * t[..., 1] / z + cy], axis=-1
    )

    # EWA: 2D covariance = J W Sigma W^T J^T with frustum-clamped Jacobian.
    limx = 1.3 * tan_fovx
    limy = 1.3 * tan_fovy
    txtz = jnp.clip(t[..., 0] / z, -limx, limx)
    tytz = jnp.clip(t[..., 1] / z, -limy, limy)
    tx = txtz * z
    ty = tytz * z

    # J W has rows u = (fx/z) r0 - (fx tx/z^2) r2 and v = (fy/z) r1 -
    # (fy ty/z^2) r2 (r_i = rows of the world-to-camera rotation). Unrolled
    # over the tiny dims so everything is (G,)-elementwise on the VPU —
    # per-Gaussian 2x3x3 batched matmuls are ~30x slower on TPU (they occupy
    # 9/1024 lanes of each vreg and defeat fusion).
    pu = fx / z
    qu = -fx * tx / (z * z)
    pv = fy / z
    qv = -fy * ty / (z * z)
    u = [pu * rot[0, k] + qu * rot[2, k] for k in range(3)]
    v = [pv * rot[1, k] + qv * rot[2, k] for k in range(3)]
    s = [[covariances[..., k, l] for l in range(3)] for k in range(3)]

    def quad(x, y):  # x^T Sigma y, Sigma symmetric
        return sum(x[k] * sum(s[k][l] * y[l] for l in range(3)) for k in range(3))

    a = quad(u, u) + 0.3
    b = quad(u, v)
    c = quad(v, v) + 0.3

    det = a * c - b * b
    valid = valid & (det > 0.0)
    det_safe = jnp.where(det > 0, det, 1.0)
    conic = jnp.stack([c / det_safe, -b / det_safe, a / det_safe], axis=-1)

    # Screen-space radius from eigenvalues of the filtered covariance.
    mid = 0.5 * (a + c)
    lambda1 = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius = jnp.ceil(3.0 * jnp.sqrt(lambda1))
    radius = jnp.where(valid, radius, 0.0)

    # View-dependent color; direction from camera center to the Gaussian.
    campos = extrinsics[:3, 3]
    dirs = means - campos
    dirs = dirs / jnp.maximum(jnp.linalg.norm(dirs, axis=-1, keepdims=True), eps)
    rgb = jnp.maximum(eval_sh(sh, dirs) + 0.5, 0.0)

    return ProjectedGaussians(
        mean2d=mean2d,
        depth=depth,
        conic=conic,
        radius=radius,
        rgb=rgb,
        opacity=opacities,
        valid=valid,
    )


def gaussian_alpha(
    conic: jnp.ndarray,
    mean2d: jnp.ndarray,
    opacity: jnp.ndarray,
    pixel_xy: jnp.ndarray,
    radius: jnp.ndarray | None = None,
    alpha_min: float = 1.0 / 255.0,
    alpha_max: float = 0.99,
) -> jnp.ndarray:
    """Alpha contribution of Gaussians at pixels.

    conic: (..., 3), mean2d: (..., 2), opacity: (...,), pixel_xy: (..., 2),
    radius: optional (...,) hard circular cutoff in pixels.
    Broadcasts; returns (...,). Matches the CUDA kernel: alpha clamped at 0.99,
    zeroed below 1/255, and power > 0 treated as no contribution. The radius
    cutoff replaces CUDA's tile-quantized rect cutoff with a deterministic,
    tile-size-independent one (differences live in the same <=1/255-ish band).
    """
    d = pixel_xy - mean2d
    power = -0.5 * (
        conic[..., 0] * d[..., 0] * d[..., 0]
        + conic[..., 2] * d[..., 1] * d[..., 1]
    ) - conic[..., 1] * d[..., 0] * d[..., 1]
    alpha = jnp.minimum(alpha_max, opacity * jnp.exp(power))
    keep = (power <= 0.0) & (alpha >= alpha_min)
    if radius is not None:
        dist2 = d[..., 0] * d[..., 0] + d[..., 1] * d[..., 1]
        keep = keep & (dist2 <= radius * radius)
    return jnp.where(keep, alpha, 0.0)


def pixel_centers(image_shape: tuple[int, int], dtype=jnp.float32) -> jnp.ndarray:
    """Pixel-center coordinates (h, w, 2) in pixel units (x = col, y = row).

    The CUDA rasterizer uses integer pixel coordinates (pixf = pixel index), so
    centers sit at integers, not half-integers.
    """
    h, w = image_shape
    ys, xs = jnp.meshgrid(
        jnp.arange(h, dtype=dtype), jnp.arange(w, dtype=dtype), indexing="ij"
    )
    return jnp.stack([xs, ys], axis=-1)
