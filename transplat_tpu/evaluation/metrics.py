"""Image quality metrics (PSNR / SSIM) in pure jnp.

Mirrors /root/reference/src/evaluation/metrics.py: PSNR on [0,1]-clipped
images; SSIM with skimage conventions (gaussian weights sigma=1.5, win=11,
data_range=1, per-channel then averaged). LPIPS lives in loss/vgg.py.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def compute_psnr(ground_truth: jnp.ndarray, predicted: jnp.ndarray) -> jnp.ndarray:
    """(..., h, w, c) images in [0, 1] -> (...,) PSNR in dB."""
    gt = jnp.clip(ground_truth, 0.0, 1.0)
    pred = jnp.clip(predicted, 0.0, 1.0)
    mse = jnp.mean((gt - pred) ** 2, axis=(-3, -2, -1))
    return -10.0 * jnp.log10(mse + 1e-12)


def _gaussian_kernel(win: int = 11, sigma: float = 1.5) -> np.ndarray:
    r = np.arange(win) - (win - 1) / 2.0
    k = np.exp(-0.5 * (r / sigma) ** 2)
    k /= k.sum()
    return np.outer(k, k)


def _filter2d(x: jnp.ndarray, kernel: np.ndarray) -> jnp.ndarray:
    """Valid-mode 2D correlation over (N, H, W)."""
    import jax.lax as lax

    k = jnp.asarray(kernel, x.dtype)[:, :, None, None]
    out = lax.conv_general_dilated(
        x[..., None],
        k,
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out[..., 0]


def compute_ssim(
    ground_truth: jnp.ndarray,
    predicted: jnp.ndarray,
    data_range: float = 1.0,
    win: int = 11,
    sigma: float = 1.5,
) -> jnp.ndarray:
    """(N, h, w, c) images -> (N,) mean SSIM (skimage gaussian_weights=True)."""
    k1, k2 = 0.01, 0.03
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    kernel = _gaussian_kernel(win, sigma)

    n, h, w, c = ground_truth.shape
    x = jnp.moveaxis(ground_truth, -1, 1).reshape(n * c, h, w)
    y = jnp.moveaxis(predicted, -1, 1).reshape(n * c, h, w)

    mu_x = _filter2d(x, kernel)
    mu_y = _filter2d(y, kernel)
    mu_xx = _filter2d(x * x, kernel)
    mu_yy = _filter2d(y * y, kernel)
    mu_xy = _filter2d(x * y, kernel)

    # skimage uses unbiased-style normalization cov_norm = 1 (gaussian case).
    var_x = mu_xx - mu_x**2
    var_y = mu_yy - mu_y**2
    cov = mu_xy - mu_x * mu_y

    ssim_map = ((2 * mu_x * mu_y + c1) * (2 * cov + c2)) / (
        (mu_x**2 + mu_y**2 + c1) * (var_x + var_y + c2)
    )
    return ssim_map.reshape(n, c, *ssim_map.shape[1:]).mean(axis=(1, 2, 3))
