"""Multi-view matching backbone: CNN -> camera SE modulation -> windowed
positional encoding -> cross-view Swin transformer.

Mirrors /root/reference/src/model/encoder/backbone/backbone_multiview.py:36-133.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..cam_encoder import CamParamEncoder
from .cnn import CNNEncoder
from .position import add_position_windowed
from .transformer import MultiViewFeatureTransformer

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def normalize_images(images: jnp.ndarray) -> jnp.ndarray:
    """ImageNet-normalize (..., H, W, 3) images in [0, 1]."""
    mean = jnp.asarray(IMAGENET_MEAN, images.dtype)
    std = jnp.asarray(IMAGENET_STD, images.dtype)
    return (images - mean) / std


class BackboneMultiview(nn.Module):
    feature_channels: int = 128
    num_transformer_layers: int = 6
    ffn_dim_expansion: int = 4

    @nn.compact
    def __call__(
        self,
        images: jnp.ndarray,
        img2world: jnp.ndarray,
        attn_splits: int = 2,
        train: bool = False,
    ):
        """images: (B, V, H, W, 3) in [0, 1]; img2world: (B, V, 4, 4).

        Returns (trans_features, cnn_features), both (B, V, H/4, W/4, C).
        """
        b, v, h, w, _ = images.shape
        x = normalize_images(images).reshape(b * v, h, w, 3)
        cnn = CNNEncoder(self.feature_channels, name="backbone")(x)
        hf, wf = cnn.shape[1:3]
        cnn_features = cnn.reshape(b, v, hf, wf, self.feature_channels)

        feats = CamParamEncoder(
            mid_channels=128, embed_dims=self.feature_channels, name="cam_param_encoder"
        )(cnn, img2world.reshape(b * v, 16), train=train)
        feats = add_position_windowed(feats, attn_splits, self.feature_channels)

        feats = feats.reshape(b, v, hf, wf, self.feature_channels)
        trans_features = MultiViewFeatureTransformer(
            num_layers=self.num_transformer_layers,
            d_model=self.feature_channels,
            ffn_dim_expansion=self.ffn_dim_expansion,
            name="transformer",
        )(feats, splits=attn_splits)
        return trans_features, cnn_features
