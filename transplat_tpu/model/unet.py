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
    conv1x1_s2d,
    conv3x3_s2d,
    depth_to_space,
    group_norm_s2d,
    space_to_depth,
    upsample2_s2d,
)
from .layers import conv, group_norm, torch_default_init, zeros_init


class _SConv3x3(nn.Module):
    """3x3 conv evaluated in the s2d domain; param tree identical to
    nn.Conv (kernel (3, 3, CI, CO) + bias), so checkpoints/converters are
    oblivious to the layout. splits: fine widths when the input is a
    concatenation of s2d segments (skip connections)."""

    features: int
    splits: tuple | None = None

    @nn.compact
    def __call__(self, xs):
        ci = xs.shape[-1] // 4
        kernel = self.param(
            "kernel", torch_default_init, (3, 3, ci, self.features)
        )
        bias = self.param("bias", zeros_init, (self.features,))
        return conv3x3_s2d(xs, kernel, bias, self.splits)


class _SConv1x1(nn.Module):
    """1x1 conv in the s2d domain (phase-block-diagonal); params match
    nn.Conv with a (1, 1, CI, CO) kernel."""

    features: int
    splits: tuple | None = None

    @nn.compact
    def __call__(self, xs):
        ci = xs.shape[-1] // 4
        kernel = self.param(
            "kernel", torch_default_init, (1, 1, ci, self.features)
        )
        bias = self.param("bias", zeros_init, (self.features,))
        return conv1x1_s2d(xs, kernel[0, 0], bias, self.splits)


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

    s2d=True: the block lives ENTIRELY in the space-to-depth domain —
    input and output are s2d tensors (ops/s2d.py; full MXU lanes for thin
    channels, and the thin-channel conv BACKWARD — XLA's pathological case
    — runs on full-lane shapes too). Same parameter tree and the same
    function to fp reassociation. in_splits: fine widths when the input is
    a concatenated skip connection."""

    out_channels: int
    dtype: jnp.dtype | None = None
    s2d: bool = False
    in_splits: tuple | None = None

    @nn.compact
    def __call__(self, x):
        if self.s2d:
            assert self.dtype is None
            ci = x.shape[-1] // 4
            splits = self.in_splits
            h = _SConv3x3(self.out_channels, splits, name="in_conv")(x)
            h = _SGroupNorm(self.out_channels, name="in_norm")(h)
            h = nn.silu(h)
            h = _SConv3x3(self.out_channels, name="out_conv")(h)
            h = _SGroupNorm(
                self.out_channels, zero_init=True, name="out_norm"
            )(h)
            h = nn.silu(h)
            if ci != self.out_channels:
                x = _SConv1x1(self.out_channels, splits, name="skip")(x)
            return x + h
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
        # LEVEL-scope space-to-depth: the whole down/middle/up tower lives
        # in the s2d domain (in/out convs and attention at the fine
        # boundaries; skip concats consumed via splits-aware kernels).
        # Requires every level resolution even.
        use_s2d = (
            self.s2d
            and self.dtype is None
            and x.shape[1] % (1 << len(self.channel_mult)) == 0
            and x.shape[2] % (1 << len(self.channel_mult)) == 0
        )

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

        def maybe_attn_s2d(xs, ch, ds, prefix):
            # Attention operates on fine tokens: d2s/s2d boundary (only at
            # the configured resolutions — deep levels, tiny tensors).
            if ds in attn_res:
                return space_to_depth(
                    maybe_attn(depth_to_space(xs), ds, prefix)
                )
            return xs

        if use_s2d:
            return self._forward_s2d(x, mc, attn_res, maybe_attn_s2d)

        hs = []
        h = conv(mc, 3, name="in_conv", dtype=self.dtype)(x)
        hs.append(h)
        ds = 1
        for level, mult in enumerate(self.channel_mult):
            for i in range(self.num_res_blocks):
                h = ResBlock(mult * mc, self.dtype, name=f"down_{level}_{i}")(h)
                h = maybe_attn(h, ds, f"down_{level}_{i}")
                hs.append(h)
            if level != len(self.channel_mult) - 1:
                h = conv(h.shape[-1], 3, stride=2, name=f"downsample_{level}", dtype=self.dtype)(h)
                hs.append(h)
                ds *= 2

        h = ResBlock(h.shape[-1], self.dtype, name="middle_0")(h)
        h = ResBlock(h.shape[-1], self.dtype, name="middle_1")(h)

        for level, mult in reversed(list(enumerate(self.channel_mult))):
            for i in range(self.num_res_blocks + 1):
                skip = hs.pop()
                h = jnp.concatenate([h, skip], axis=-1)
                h = ResBlock(mult * mc, self.dtype, name=f"up_{level}_{i}")(h)
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

    def _forward_s2d(self, x, mc, attn_res, maybe_attn_s2d):
        """Space-to-depth tower: identical structure/names/params as the
        fine path; only the tensor layout differs (ops/s2d.py). Transposes
        appear only at the in/out convs, stride-2 downsamples, and
        attention boundaries (measured: per-block round-trips erase the
        win, in-domain chains are ~2-3x on fwd+bwd)."""
        hs = []  # (s2d tensor, fine channel width)
        h = conv(mc, 3, name="in_conv")(x)
        xs, ch = space_to_depth(h), mc
        hs.append((xs, ch))
        ds = 1
        for level, mult in enumerate(self.channel_mult):
            for i in range(self.num_res_blocks):
                xs = ResBlock(
                    mult * mc, s2d=True, name=f"down_{level}_{i}"
                )(xs)
                ch = mult * mc
                xs = maybe_attn_s2d(xs, ch, ds, f"down_{level}_{i}")
                hs.append((xs, ch))
            if level != len(self.channel_mult) - 1:
                hf = depth_to_space(xs)
                hf = conv(ch, 3, stride=2, name=f"downsample_{level}")(hf)
                xs = space_to_depth(hf)
                hs.append((xs, ch))
                ds *= 2

        xs = ResBlock(ch, s2d=True, name="middle_0")(xs)
        xs = ResBlock(ch, s2d=True, name="middle_1")(xs)

        for level, mult in reversed(list(enumerate(self.channel_mult))):
            for i in range(self.num_res_blocks + 1):
                skip, skip_ch = hs.pop()
                cat = jnp.concatenate([xs, skip], axis=-1)
                xs = ResBlock(
                    mult * mc, s2d=True, in_splits=(ch, skip_ch),
                    name=f"up_{level}_{i}",
                )(cat)
                ch = mult * mc
                xs = maybe_attn_s2d(xs, ch, ds, f"up_{level}_{i}")
                if level and i == self.num_res_blocks:
                    # repeat-2x upsample lands in-domain as a channel tile
                    # (s2d of a repeated image has all phases equal).
                    hf = depth_to_space(xs)
                    xs = _SConv3x3(ch, name=f"upsample_{level}")(
                        upsample2_s2d(hf)
                    )
                    ds //= 2

        h = depth_to_space(xs)
        # Final out (postnorm): conv -> GN -> SiLU.
        h = conv(self.out_channels, 3, name="out_conv")(h)
        h = group_norm(self.out_channels, name="out_norm")(h)
        return nn.silu(h)
