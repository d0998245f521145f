"""LDM-style 2D U-Net with cross-view self-attention (no timestep embedding).

Re-implements the reference's trimmed Stable-Diffusion U-Net
(/root/reference/src/model/encoder/matching/ldm_unet/unet.py, postnorm=True
configuration) in NHWC Flax. The cross-view attention folds the view axis into
the token axis so attention spans all views jointly (unet.py:529-546).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..ops.s2d import (
    conv3x3_s2d,
    depth_to_space,
    group_norm_s2d,
    space_to_depth,
)
from .layers import conv, group_norm, torch_default_init, zeros_init


class _SConv3x3(nn.Module):
    """3x3 conv evaluated in the s2d domain; param tree identical to
    nn.Conv (kernel (3, 3, CI, CO) + bias), so checkpoints/converters are
    oblivious to the layout."""

    features: int

    @nn.compact
    def __call__(self, xs):
        ci = xs.shape[-1] // 4
        kernel = self.param(
            "kernel", torch_default_init, (3, 3, ci, self.features)
        )
        bias = self.param("bias", zeros_init, (self.features,))
        return conv3x3_s2d(xs, kernel, bias)


class _SGroupNorm(nn.Module):
    """GroupNorm over fine channels evaluated in the s2d domain; param tree
    identical to nn.GroupNorm (scale + bias over C fine channels)."""

    channels: int
    zero_init: bool = False

    @nn.compact
    def __call__(self, xs):
        groups = 8 if self.channels % 8 == 0 else 4
        scale = self.param(
            "scale",
            zeros_init if self.zero_init else nn.initializers.ones,
            (self.channels,),
        )
        bias = self.param("bias", zeros_init, (self.channels,))
        return group_norm_s2d(xs, self.channels, groups, scale, bias)


class ResBlock(nn.Module):
    """Postnorm residual block (ldm_unet/unet.py:172-305).

    s2d=True runs the conv->GN->SiLU->conv->GN->SiLU chain in the
    space-to-depth domain (ops/s2d.py — full MXU lanes for thin channels;
    one s2d + one d2s per block, same parameters, numerics within fp
    reassociation). Falls back to the fine path when the spatial dims are
    odd or a compute dtype is set."""

    out_channels: int
    dtype: jnp.dtype | None = None
    s2d: bool = False

    @nn.compact
    def __call__(self, x):
        use_s2d = (
            self.s2d
            and self.dtype is None
            and x.shape[1] % 2 == 0
            and x.shape[2] % 2 == 0
        )
        if use_s2d:
            xs = space_to_depth(x)
            h = _SConv3x3(self.out_channels, name="in_conv")(xs)
            h = _SGroupNorm(self.out_channels, name="in_norm")(h)
            h = nn.silu(h)
            h = _SConv3x3(self.out_channels, name="out_conv")(h)
            h = _SGroupNorm(
                self.out_channels, zero_init=True, name="out_norm"
            )(h)
            h = nn.silu(h)
            h = depth_to_space(h)
        else:
            h = conv(self.out_channels, 3, name="in_conv", dtype=self.dtype)(x)
            h = group_norm(self.out_channels, name="in_norm", dtype=self.dtype)(h)
            h = nn.silu(h)
            h = conv(self.out_channels, 3, name="out_conv", dtype=self.dtype)(h)
            h = group_norm(self.out_channels, zero_init=True, name="out_norm", dtype=self.dtype)(h)
            h = nn.silu(h)
        if x.shape[-1] != self.out_channels:
            x = conv(self.out_channels, 1, name="skip", dtype=self.dtype)(x)
        return (x + h).astype(self.dtype or x.dtype)


class AttentionBlock(nn.Module):
    """Self-attention over spatial tokens, optionally across views.

    Postnorm variant: qkv -> attention -> proj -> zero-GN, residual.
    """

    channels: int
    num_head_channels: int = 32
    num_frames: int = 2
    cross_view: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        heads = max(1, c // self.num_head_channels)
        t = h * w
        tokens = x.reshape(n, t, c)

        qkv = nn.Dense(
            3 * c, kernel_init=torch_default_init, name="qkv", dtype=self.dtype
        )(tokens)

        if self.cross_view:
            v = self.num_frames
            b = n // v
            qkv = qkv.reshape(b, v, t, 3 * c).reshape(b, v * t, 3 * c)

        bs, length, _ = qkv.shape
        qkv = qkv.reshape(bs, length, heads, 3, c // heads)
        q, k, val = qkv[..., 0, :], qkv[..., 1, :], qkv[..., 2, :]
        scale = 1.0 / ((c // heads) ** 0.25)
        weight = jnp.einsum("blhc,bshc->bhls", q * scale, k * scale)
        weight = nn.softmax(weight.astype(jnp.float32), axis=-1).astype(q.dtype)
        out = jnp.einsum("bhls,bshc->blhc", weight, val).reshape(bs, length, c)

        if self.cross_view:
            out = out.reshape(n // self.num_frames, self.num_frames, t, c).reshape(n, t, c)

        out = nn.Dense(
            c, kernel_init=torch_default_init, name="proj_out", dtype=self.dtype
        )(out)
        out = group_norm(c, zero_init=True, name="norm", dtype=self.dtype)(out)
        return (x + out.reshape(n, h, w, c)).astype(self.dtype or x.dtype)


class UNetModel(nn.Module):
    model_channels: int
    out_channels: int
    num_res_blocks: int = 1
    attention_resolutions: Sequence[int] = ()
    channel_mult: Sequence[int] = (1, 1, 1)
    num_head_channels: int = 32
    num_frames: int = 2
    cross_view: bool = True
    dtype: jnp.dtype | None = None
    # Space-to-depth ResBlock chains (ops/s2d.py): measured 2.25x on the
    # thin-channel convs; worthwhile for model_channels <= ~64 (4C <= 256).
    s2d: bool = False

    @nn.compact
    def __call__(self, x):
        """x: (N, H, W, C_in) with N = b * num_frames."""
        mc = self.model_channels
        attn_res = set(self.attention_resolutions)

        def maybe_attn(h, ds, prefix):
            if ds in attn_res:
                h = AttentionBlock(
                    h.shape[-1],
                    self.num_head_channels,
                    self.num_frames,
                    self.cross_view,
                    self.dtype,
                    name=f"{prefix}_attn",
                )(h)
            return h

        hs = []
        h = conv(mc, 3, name="in_conv", dtype=self.dtype)(x)
        hs.append(h)
        ds = 1
        for level, mult in enumerate(self.channel_mult):
            for i in range(self.num_res_blocks):
                h = ResBlock(mult * mc, self.dtype, self.s2d, name=f"down_{level}_{i}")(h)
                h = maybe_attn(h, ds, f"down_{level}_{i}")
                hs.append(h)
            if level != len(self.channel_mult) - 1:
                h = conv(h.shape[-1], 3, stride=2, name=f"downsample_{level}", dtype=self.dtype)(h)
                hs.append(h)
                ds *= 2

        h = ResBlock(h.shape[-1], self.dtype, self.s2d, name="middle_0")(h)
        h = ResBlock(h.shape[-1], self.dtype, self.s2d, name="middle_1")(h)

        for level, mult in reversed(list(enumerate(self.channel_mult))):
            for i in range(self.num_res_blocks + 1):
                skip = hs.pop()
                h = jnp.concatenate([h, skip], axis=-1)
                h = ResBlock(mult * mc, self.dtype, self.s2d, name=f"up_{level}_{i}")(h)
                h = maybe_attn(h, ds, f"up_{level}_{i}")
                if level and i == self.num_res_blocks:
                    n, hh, ww, c = h.shape
                    h = jnp.repeat(jnp.repeat(h, 2, axis=1), 2, axis=2)
                    h = conv(c, 3, name=f"upsample_{level}", dtype=self.dtype)(h)
                    ds //= 2

        # Final out (postnorm): conv -> GN -> SiLU.
        h = conv(self.out_channels, 3, name="out_conv", dtype=self.dtype)(h)
        h = group_norm(self.out_channels, name="out_norm")(h)
        return nn.silu(h)
