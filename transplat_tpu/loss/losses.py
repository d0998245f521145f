"""Training losses.

Mirrors /root/reference/src/loss/: MSE (weight 1.0), LPIPS (weight 0.05,
gated by apply_after_step), optional depth smoothness.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp


@dataclass(frozen=True)
class LossCfg:
    mse_weight: float = 1.0
    lpips_weight: float = 0.05
    lpips_apply_after_step: int = 0
    depth_weight: float = 0.0
    depth_sigma_image: float | None = None
    depth_use_second_derivative: bool = False


def mse_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Mean squared color error (loss_mse.py:22-31)."""
    delta = pred - target
    return jnp.mean(delta**2)


def depth_smoothness_loss(
    depth: jnp.ndarray,
    image: jnp.ndarray,
    sigma_image: float | None = None,
    use_second_derivative: bool = False,
) -> jnp.ndarray:
    """Edge-aware depth smoothness (loss_depth.py:26-60).

    depth: (..., h, w); image: (..., h, w, 3).
    """
    depth = jnp.log(depth + 1e-8)
    dx = depth[..., :, 1:] - depth[..., :, :-1]
    dy = depth[..., 1:, :] - depth[..., :-1, :]
    if use_second_derivative:
        dx = dx[..., :, 1:] - dx[..., :, :-1]
        dy = dy[..., 1:, :] - dy[..., :-1, :]
    if sigma_image is not None:
        gx = jnp.abs(image[..., :, 1:, :] - image[..., :, :-1, :]).mean(-1)
        gy = jnp.abs(image[..., 1:, :, :] - image[..., :-1, :, :]).mean(-1)
        if use_second_derivative:
            gx = gx[..., :, 1:]
            gy = gy[..., 1:, :]
        dx = dx * jnp.exp(-gx / sigma_image)
        dy = dy * jnp.exp(-gy / sigma_image)
    return jnp.abs(dx).mean() + jnp.abs(dy).mean()


def compute_losses(
    cfg: LossCfg,
    pred_color: jnp.ndarray,  # (b, tv, h, w, 3)
    target_color: jnp.ndarray,
    global_step: jnp.ndarray,
    lpips_fn=None,  # callable (N,h,w,3),(N,h,w,3) -> (N,)
    pred_depth: jnp.ndarray | None = None,
):
    """Returns (total_loss, dict of unweighted components)."""
    parts = {}
    total = 0.0

    parts["mse"] = mse_loss(pred_color, target_color)
    total = total + cfg.mse_weight * parts["mse"]

    if cfg.lpips_weight > 0.0 and lpips_fn is not None:
        flat_p = pred_color.reshape(-1, *pred_color.shape[-3:])
        flat_t = target_color.reshape(-1, *target_color.shape[-3:])
        lp = jnp.mean(lpips_fn(flat_p, flat_t))
        parts["lpips"] = lp
        gate = (global_step >= cfg.lpips_apply_after_step).astype(lp.dtype)
        total = total + cfg.lpips_weight * gate * lp

    if cfg.depth_weight > 0.0 and pred_depth is not None:
        parts["depth"] = depth_smoothness_loss(
            pred_depth,
            target_color,
            cfg.depth_sigma_image,
            cfg.depth_use_second_derivative,
        )
        total = total + cfg.depth_weight * parts["depth"]

    return total, parts
