"""Sine/cosine 2D positional encoding.

Matches /root/reference/src/model/encoder/backbone/unimatch/position.py:
row/col cumsum normalized to 2*pi, interleaved sin/cos, (pos_y, pos_x) concat.
Computed per split window (feature_add_position_list,
backbone_multiview.py:14-34).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def position_embedding_sine(
    h: int, w: int, num_pos_feats: int = 64, temperature: float = 10000.0
) -> np.ndarray:
    """(h, w, 2*num_pos_feats) static positional encoding."""
    eps = 1e-6
    scale = 2.0 * np.pi
    y = np.arange(1, h + 1, dtype=np.float32)[:, None] * np.ones((1, w), np.float32)
    x = np.arange(1, w + 1, dtype=np.float32)[None, :] * np.ones((h, 1), np.float32)
    y = y / (h + eps) * scale
    x = x / (w + eps) * scale

    dim_t = np.arange(num_pos_feats, dtype=np.float32)
    dim_t = temperature ** (2.0 * (dim_t // 2) / num_pos_feats)

    pos_x = x[:, :, None] / dim_t
    pos_y = y[:, :, None] / dim_t
    pos_x = np.stack([np.sin(pos_x[:, :, 0::2]), np.cos(pos_x[:, :, 1::2])], axis=3)
    pos_x = pos_x.reshape(h, w, -1)
    pos_y = np.stack([np.sin(pos_y[:, :, 0::2]), np.cos(pos_y[:, :, 1::2])], axis=3)
    pos_y = pos_y.reshape(h, w, -1)
    return np.concatenate([pos_y, pos_x], axis=-1)


def add_position_windowed(
    features: jnp.ndarray, splits: int, feature_channels: int
) -> jnp.ndarray:
    """Add window-local sine positions to (N, H, W, C) features."""
    n, h, w, c = features.shape
    if splits > 1:
        pos = position_embedding_sine(h // splits, w // splits, feature_channels // 2)
        pos = np.tile(pos, (splits, splits, 1))
    else:
        pos = position_embedding_sine(h, w, feature_channels // 2)
    return features + jnp.asarray(pos)
