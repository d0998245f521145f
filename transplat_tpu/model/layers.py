"""Shared Flax building blocks with torch-compatible initialization.

All modules operate channel-last (NHWC) — the TPU-native layout — while
matching the numerical semantics of the reference's torch modules so weight
conversion is a pure transpose.
"""

from __future__ import annotations

from typing import Callable, Sequence

import flax.linen as nn
import jax.numpy as jnp

# torch nn.Conv2d / nn.Linear default: kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in))
torch_default_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")
# torch kaiming_normal(mode="fan_out", nonlinearity="relu")
kaiming_out_init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")
xavier_init = nn.initializers.xavier_uniform()
zeros_init = nn.initializers.zeros
trunc_normal_002 = nn.initializers.truncated_normal(stddev=0.02, lower=-2.0, upper=2.0)


def conv(
    features: int,
    kernel: int = 3,
    stride: int = 1,
    padding: int | str | None = None,
    use_bias: bool = True,
    kernel_init: Callable = torch_default_init,
    name: str | None = None,
    dtype: jnp.dtype | None = None,
) -> nn.Conv:
    """3x3-style conv with explicit torch "padding=k//2" semantics.

    dtype: computation dtype (params stay f32; bfloat16 halves activation
    HBM traffic on bandwidth-bound stages — the reference trains under TF32,
    /root/reference/src/main.py:15, so reduced-precision compute has
    precedent)."""
    if padding is None:
        padding = (kernel - 1) // 2
    if isinstance(padding, int):
        padding = [(padding, padding), (padding, padding)]
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding=padding,
        use_bias=use_bias,
        kernel_init=kernel_init,
        name=name,
        dtype=dtype,
    )


def instance_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """torch nn.InstanceNorm2d(affine=False): per-sample, per-channel over HW.

    x: (..., H, W, C).
    """
    mean = x.mean(axis=(-3, -2), keepdims=True)
    var = x.var(axis=(-3, -2), keepdims=True)
    return (x - mean) / jnp.sqrt(var + eps)


def group_norm(
    channels: int,
    zero_init: bool = False,
    name: str | None = None,
    dtype: jnp.dtype | None = None,
) -> nn.GroupNorm:
    """The LDM-UNet "normalization": GN(8) if divisible else GN(4).

    Mirrors /root/reference/src/model/encoder/matching/ldm_unet/util.py:189-213.
    dtype None = f32 result. When the surrounding convs run bf16, pass bf16
    so the chain has no f32 round-trips (flax still computes the mean/var
    statistics in f32 internally).
    """
    groups = 8 if channels % 8 == 0 else 4
    return nn.GroupNorm(
        num_groups=groups,
        epsilon=1e-5,
        dtype=dtype or jnp.float32,
        scale_init=zeros_init if zero_init else nn.initializers.ones,
        bias_init=zeros_init,
        name=name,
    )


class Mlp(nn.Module):
    """2-layer MLP (reference src/model/utils/cam_param_encoder.py:7-29)."""

    hidden: int
    out: int
    act: Callable = nn.relu

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, kernel_init=torch_default_init, name="fc1")(x)
        x = self.act(x)
        return nn.Dense(self.out, kernel_init=torch_default_init, name="fc2")(x)


class FFN(nn.Module):
    """Residual feed-forward (reference src/model/utils/ffn.py:4-45)."""

    embed_dims: int = 128
    feedforward: int = 256
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = nn.Dense(self.feedforward, kernel_init=torch_default_init, name="fc1")(x)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = nn.Dense(self.embed_dims, kernel_init=torch_default_init, name="fc2")(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        return x + h


class SELayer(nn.Module):
    """Squeeze-excite gate (reference cam_param_encoder.py:31-43)."""

    channels: int

    @nn.compact
    def __call__(self, x, x_se):
        # x: (..., H, W, C); x_se: (..., 1, 1, C) conditioning
        g = conv(self.channels, 1, name="conv_reduce")(x_se)
        g = nn.relu(g)
        g = conv(self.channels, 1, name="conv_expand")(g)
        return x * nn.sigmoid(g)
