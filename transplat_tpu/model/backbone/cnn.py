"""UniMatch-style CNN feature encoder (1/4 resolution, 128 channels).

Semantics mirror /root/reference/src/model/encoder/backbone/unimatch/backbone.py
(ResNet-ish stages with InstanceNorm, kaiming fan-out init) in NHWC.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..layers import conv, instance_norm, kaiming_out_init


class ResidualBlock(nn.Module):
    planes: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        y = conv(
            self.planes, 3, self.stride, use_bias=False,
            kernel_init=kaiming_out_init, name="conv1",
        )(x)
        y = nn.relu(instance_norm(y))
        y = conv(
            self.planes, 3, 1, use_bias=False,
            kernel_init=kaiming_out_init, name="conv2",
        )(y)
        y = nn.relu(instance_norm(y))

        if self.stride != 1 or x.shape[-1] != self.planes:
            x = conv(
                self.planes, 1, self.stride,
                kernel_init=kaiming_out_init, name="downsample",
            )(x)
            x = instance_norm(x)
        return nn.relu(x + y)


class CNNEncoder(nn.Module):
    """(N, H, W, 3) -> (N, H/4, W/4, output_dim)."""

    output_dim: int = 128

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dims = (64, 96, 128)
        x = conv(dims[0], 7, 2, use_bias=False, kernel_init=kaiming_out_init, name="conv1")(x)
        x = nn.relu(instance_norm(x))
        # layer1 (1/2), layer2 (1/4), layer3 (1/4 — stride 1 in the
        # downscale_factor=4 configuration, backbone_multiview.py:50-53).
        x = ResidualBlock(dims[0], 1, name="layer1_0")(x)
        x = ResidualBlock(dims[0], 1, name="layer1_1")(x)
        x = ResidualBlock(dims[1], 2, name="layer2_0")(x)
        x = ResidualBlock(dims[1], 1, name="layer2_1")(x)
        x = ResidualBlock(dims[2], 1, name="layer3_0")(x)
        x = ResidualBlock(dims[2], 1, name="layer3_1")(x)
        x = conv(self.output_dim, 1, 1, kernel_init=kaiming_out_init, name="conv2")(x)
        return x
