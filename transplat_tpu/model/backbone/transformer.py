"""Multi-view Swin-window feature transformer.

Re-implements /root/reference/src/model/encoder/backbone/multiview_transformer.py
with (b, v) batch-first semantics: each layer does windowed self-attention on
each view, then windowed cross-attention against the other views' tokens
(keys/values concatenated per window), then a GELU FFN on [source || message].
Shifted windows on odd layers. Single head, xavier init.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ...ops.window import window_attention
from ..layers import xavier_init


class TransformerLayer(nn.Module):
    d_model: int = 128
    no_ffn: bool = False
    ffn_dim_expansion: int = 4
    with_shift: bool = False

    @nn.compact
    def __call__(self, source, target, h: int, w: int, splits: int):
        """source: (N, L, C); target: (N, L, C) self or (N, M, L, C) cross."""
        c = self.d_model
        q = nn.Dense(c, use_bias=False, kernel_init=xavier_init, name="q_proj")(source)
        k = nn.Dense(c, use_bias=False, kernel_init=xavier_init, name="k_proj")(target)
        v = nn.Dense(c, use_bias=False, kernel_init=xavier_init, name="v_proj")(target)

        message = window_attention(q, k, v, h, w, splits, with_shift=self.with_shift)
        message = nn.Dense(c, use_bias=False, kernel_init=xavier_init, name="merge")(message)
        message = nn.LayerNorm(name="norm1")(message)

        if not self.no_ffn:
            hcat = jnp.concatenate([source, message], axis=-1)
            hcat = nn.Dense(
                2 * c * self.ffn_dim_expansion, use_bias=False,
                kernel_init=xavier_init, name="mlp_0",
            )(hcat)
            hcat = nn.gelu(hcat, approximate=False)
            message = nn.Dense(c, use_bias=False, kernel_init=xavier_init, name="mlp_2")(hcat)
            message = nn.LayerNorm(name="norm2")(message)

        return source + message


class TransformerBlock(nn.Module):
    """Self-attention + cross-attention + FFN (multiview_transformer.py:410-492)."""

    d_model: int = 128
    ffn_dim_expansion: int = 4
    with_shift: bool = False

    @nn.compact
    def __call__(self, source, target, h, w, splits):
        source = TransformerLayer(
            self.d_model, no_ffn=True, with_shift=self.with_shift, name="self_attn"
        )(source, source, h, w, splits)
        source = TransformerLayer(
            self.d_model,
            ffn_dim_expansion=self.ffn_dim_expansion,
            with_shift=self.with_shift,
            name="cross_attn_ffn",
        )(source, target, h, w, splits)
        return source


class MultiViewFeatureTransformer(nn.Module):
    num_layers: int = 6
    d_model: int = 128
    ffn_dim_expansion: int = 4

    @nn.compact
    def __call__(self, features: jnp.ndarray, splits: int = 2) -> jnp.ndarray:
        """features: (B, V, H, W, C) -> (B, V, H, W, C)."""
        b, v, h, w, c = features.shape
        tokens = features.reshape(b, v, h * w, c)

        for i in range(self.num_layers):
            # q: every view; kv: the other views, stacked.
            others = [
                jnp.stack([tokens[:, j] for j in range(v) if j != vi], axis=1)
                for vi in range(v)
            ]
            q = tokens.reshape(b * v, h * w, c)
            kv = jnp.stack(others, axis=1).reshape(b * v, v - 1, h * w, c)
            q = TransformerBlock(
                self.d_model,
                self.ffn_dim_expansion,
                with_shift=(i % 2 == 1),
                name=f"layer_{i}",
            )(q, kv, h, w, splits)
            tokens = q.reshape(b, v, h * w, c)

        return tokens.reshape(b, v, h, w, c)
