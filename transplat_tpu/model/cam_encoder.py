"""Camera-parameter SE encoder.

Mirrors /root/reference/src/model/utils/cam_param_encoder.py:45-93: flattened
4x4 img->world matrix (16 floats) -> BN -> MLP -> SE gate over conv-reduced
features. Used both in the backbone and the depth predictor.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .layers import Mlp, SELayer, conv


class CamParamEncoder(nn.Module):
    mid_channels: int = 128
    embed_dims: int = 128

    @nn.compact
    def __call__(self, feat: jnp.ndarray, cam_params: jnp.ndarray, train: bool = False):
        """feat: (N, H, W, C_in); cam_params: (N, 16) -> (N, H, W, embed_dims)."""
        mlp_input = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, name="bn"
        )(cam_params)

        x = conv(self.mid_channels, 3, name="reduce_conv_0")(feat)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, name="reduce_bn")(x)
        x = nn.relu(x)

        se = Mlp(self.mid_channels, self.mid_channels, name="context_mlp")(mlp_input)
        x = SELayer(self.mid_channels, name="context_se")(x, se[:, None, None, :])
        return conv(self.embed_dims, 1, name="context_conv")(x)
