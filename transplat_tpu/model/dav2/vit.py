"""DINOv2 vision transformer (inference-only, for the frozen DAv2 prior).

Mirrors /root/reference/src/depth_anything_v2/dinov2.py: patch-14 ViT with
layer-scale (init 1.0), pre-norm blocks, interpolated position embeddings, and
intermediate-layer extraction with the final LayerNorm applied.

Position-embedding interpolation reproduces torch exactly: bicubic a=-0.75
with the DINOv2 interpolate_offset=0.1 scale_factor quirk
(dinov2.py:183-194), via static separable matmuls (ops.interpolate).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from ...ops.interpolate import resize_bicubic_torch
from ..layers import torch_default_init, trunc_normal_002


class Attention(nn.Module):
    dim: int
    num_heads: int

    @nn.compact
    def __call__(self, x):
        b, n, c = x.shape
        head = c // self.num_heads
        qkv = nn.Dense(3 * c, kernel_init=torch_default_init, name="qkv")(x)
        qkv = qkv.reshape(b, n, 3, self.num_heads, head)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        attn = jnp.einsum("bnhc,bmhc->bhnm", q, k) / (head**0.5)
        attn = nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bmhc->bnhc", attn, v).reshape(b, n, c)
        return nn.Dense(c, kernel_init=torch_default_init, name="proj")(out)


class LayerScale(nn.Module):
    dim: int
    init_value: float = 1.0

    @nn.compact
    def __call__(self, x):
        gamma = self.param(
            "gamma", nn.initializers.constant(self.init_value), (self.dim,)
        )
        return x * gamma


class Block(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: int = 4

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        h = Attention(self.dim, self.num_heads, name="attn")(h)
        x = x + LayerScale(self.dim, name="ls1")(h)
        h = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        h = nn.Dense(self.dim * self.mlp_ratio, kernel_init=torch_default_init, name="mlp_fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, kernel_init=torch_default_init, name="mlp_fc2")(h)
        return x + LayerScale(self.dim, name="ls2")(h)


class DinoVisionTransformer(nn.Module):
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    patch_size: int = 14
    pretrain_img_size: int = 518

    @nn.compact
    def __call__(self, x: jnp.ndarray, take_layers: Sequence[int] = (2, 5, 8, 11)):
        """x: (B, H, W, 3) normalized. Returns list of (B, N_patches, C) token
        maps (final norm applied), one per requested block index."""
        b, h, w, _ = x.shape
        ph, pw = h // self.patch_size, w // self.patch_size

        patches = nn.Conv(
            self.embed_dim,
            (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            padding="VALID",
            kernel_init=torch_default_init,
            name="patch_embed",
        )(x)
        tokens = patches.reshape(b, ph * pw, self.embed_dim)

        cls_token = self.param(
            "cls_token", nn.initializers.normal(1e-6), (1, 1, self.embed_dim)
        )
        n_pretrain = (self.pretrain_img_size // self.patch_size) ** 2
        pos_embed = self.param(
            "pos_embed", trunc_normal_002, (1, n_pretrain + 1, self.embed_dim)
        )

        side = self.pretrain_img_size // self.patch_size
        if (ph, pw) != (side, side):
            # torch F.interpolate(scale_factor=((ph+0.1)/side, (pw+0.1)/side),
            # mode="bicubic") — the DINOv2 +0.1 offset changes sample
            # positions slightly; reproduce it exactly (dinov2.py:183-194).
            patch_pos = pos_embed[:, 1:].reshape(1, side, side, self.embed_dim)
            patch_pos = resize_bicubic_torch(
                patch_pos,
                (ph, pw),
                scale=((ph + 0.1) / side, (pw + 0.1) / side),
            )
            patch_pos = patch_pos.reshape(1, ph * pw, self.embed_dim)
        else:
            patch_pos = pos_embed[:, 1:]
        cls_pos = pos_embed[:, :1]

        tokens = tokens + patch_pos
        cls_tok = jnp.broadcast_to(cls_token + cls_pos, (b, 1, self.embed_dim))
        tokens = jnp.concatenate([cls_tok, tokens], axis=1)

        outputs = {}
        for i in range(self.depth):
            tokens = Block(self.embed_dim, self.num_heads, name=f"block_{i}")(tokens)
            if i in take_layers:
                outputs[i] = tokens

        norm = nn.LayerNorm(epsilon=1e-6, name="norm")
        # Patch tokens only (cls token dropped — DPT runs with use_clstoken=False).
        return [norm(outputs[i])[:, 1:] for i in take_layers]
