"""DPT depth head + DepthAnythingV2 wrapper (frozen monocular prior).

Mirrors /root/reference/src/depth_anything_v2/dpt.py: project intermediate
ViT layers, resize to a 4-level pyramid, refine with feature-fusion blocks,
and regress relative depth. Returns (depth, fusion_feature) where the fusion
feature (features//2 channels at 4x patch resolution) is the "dino_feature"
prior consumed by the depth predictor.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from ...ops.interpolate import resize_bilinear
from ..layers import conv, torch_default_init

DAV2_CONFIGS = {
    "vits": dict(embed_dim=384, num_heads=6, features=64, out_channels=(48, 96, 192, 384)),
    "vitb": dict(embed_dim=768, num_heads=12, features=128, out_channels=(96, 192, 384, 768)),
    "vitl": dict(embed_dim=1024, num_heads=16, features=256, out_channels=(256, 512, 1024, 1024)),
}


class ResidualConvUnit(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        h = nn.relu(x)
        h = conv(self.features, 3, name="conv1")(h)
        h = nn.relu(h)
        h = conv(self.features, 3, name="conv2")(h)
        return x + h


class FeatureFusionBlock(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x, res=None, out_size=None):
        if res is not None:
            x = x + ResidualConvUnit(self.features, name="resConfUnit1")(res)
        x = ResidualConvUnit(self.features, name="resConfUnit2")(x)
        if out_size is None:
            out_size = (x.shape[-3] * 2, x.shape[-2] * 2)
        x = resize_bilinear(x, out_size, align_corners=True)
        return conv(self.features, 1, name="out_conv")(x)


class DPTHead(nn.Module):
    features: int = 128
    out_channels: Sequence[int] = (96, 192, 384, 768)

    @nn.compact
    def __call__(self, layer_tokens, patch_h: int, patch_w: int):
        """layer_tokens: list of 4 (B, N, C) token maps, shallow -> deep."""
        b = layer_tokens[0].shape[0]
        maps = []
        for i, tokens in enumerate(layer_tokens):
            x = tokens.reshape(b, patch_h, patch_w, -1)
            x = conv(self.out_channels[i], 1, name=f"project_{i}")(x)
            if i == 0:
                x = nn.ConvTranspose(
                    self.out_channels[0], (4, 4), strides=(4, 4), padding="VALID",
                    kernel_init=torch_default_init, name="resize_0",
                )(x)
            elif i == 1:
                x = nn.ConvTranspose(
                    self.out_channels[1], (2, 2), strides=(2, 2), padding="VALID",
                    kernel_init=torch_default_init, name="resize_1",
                )(x)
            elif i == 3:
                x = conv(self.out_channels[3], 3, stride=2, name="resize_3")(x)
            maps.append(x)

        rn = [
            conv(self.features, 3, use_bias=False, name=f"layer{i + 1}_rn")(m)
            for i, m in enumerate(maps)
        ]

        path4 = FeatureFusionBlock(self.features, name="refinenet4")(
            rn[3], out_size=rn[2].shape[1:3]
        )
        path3 = FeatureFusionBlock(self.features, name="refinenet3")(
            path4, rn[2], out_size=rn[1].shape[1:3]
        )
        path2 = FeatureFusionBlock(self.features, name="refinenet2")(
            path3, rn[1], out_size=rn[0].shape[1:3]
        )
        path1 = FeatureFusionBlock(self.features, name="refinenet1")(path2, rn[0])

        feat = conv(self.features // 2, 3, name="output_conv1")(path1)
        out_feature = feat  # the "dino_feature" prior (detached by the caller)

        h = resize_bilinear(feat, (patch_h * 14, patch_w * 14), align_corners=True)
        h = conv(32, 3, name="output_conv2_0")(h)
        h = nn.relu(h)
        h = conv(1, 1, name="output_conv2_2")(h)
        depth = nn.relu(h)
        return depth[..., 0], out_feature


class DepthAnythingV2(nn.Module):
    """Frozen relative-depth prior. Input (B, H, W, 3) normalized (H, W % 14 == 0)."""

    encoder: str = "vitb"

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        from .vit import DinoVisionTransformer

        cfg = DAV2_CONFIGS[self.encoder]
        patch_h, patch_w = x.shape[1] // 14, x.shape[2] // 14
        tokens = DinoVisionTransformer(
            embed_dim=cfg["embed_dim"], num_heads=cfg["num_heads"], name="pretrained"
        )(x, take_layers=(2, 5, 8, 11))
        depth, feature = DPTHead(
            features=cfg["features"], out_channels=cfg["out_channels"], name="depth_head"
        )(tokens, patch_h, patch_w)
        return depth, feature
