"""Loss registry (mirrors /root/reference/src/loss/: mse, lpips, depth)."""

from .losses import LossCfg, compute_losses, mse_loss, depth_smoothness_loss
from .vgg import LPIPS, load_lpips_weights

__all__ = [
    "LossCfg",
    "compute_losses",
    "mse_loss",
    "depth_smoothness_loss",
    "LPIPS",
    "load_lpips_weights",
]
