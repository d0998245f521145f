"""Depth-aware deformable attention ("UV transformer") — the cost-volume core.

Re-implements the reference's UVCoarse/UVSelf/UVCross attentions
(/root/reference/src/model/utils/attention.py:145-551, encoder.py:13-210) with
a TPU-native twist: the coarse and cross attentions only ever reduce sampled
value vectors against the query pixel's own key vector, so we hoist the
channel reduction into a single MXU matmul S = K V^T and bilinearly sample
scalars from S (see ops/deform.py). The query's 128 channels double as the
128 depth-candidate slots, exactly as in the reference.

Reference quirks preserved:
  * the coarse attention's learned weights are a softmax over a single
    element == 1.0, so coarse correlation is parameter-free (attention.py:
    502-504 with num_points=num_levels=1); we drop the dead Linear
  * fine self-attention uses torch-default init (its init_weight is never
    called); cross-attention offsets/weights start at zero
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..ops.deform import deform_sample_scores, deform_sample_vectors
from .layers import FFN, torch_default_init, xavier_init, zeros_init


def coarse_correlation(
    key_feat: jnp.ndarray, value_feat: jnp.ndarray, grid: jnp.ndarray, hw: tuple[int, int]
) -> jnp.ndarray:
    """Plane-sweep correlation via score-map sampling.

    key_feat:   (Q, C) ref-view features (query pixels)
    value_feat: (HW, C) other-view features
    grid:       (Q, D, 2) epipolar sample locations in [0, 1]
    Returns (Q, D): sum_c V[loc]_c K_c / sqrt(C).
    """
    c = key_feat.shape[-1]
    scores = key_feat @ value_feat.T / (c**0.5)  # (Q, HW)
    weights = jnp.ones(grid.shape[:-1] + (1,), key_feat.dtype)
    return deform_sample_scores(scores, hw, grid[:, :, None, :], weights)


class UVSelfAttention(nn.Module):
    """Deformable self-attention over the 64x64 query map (P=4)."""

    embed_dims: int = 128
    num_points: int = 4
    dropout: float = 0.1

    @nn.compact
    def __call__(self, query, query_pos, ref_2d, hw, deterministic: bool = True):
        """query: (Q, C); query_pos: (Q, C) or None; ref_2d: (Q, 2) in [0,1]."""
        identity = query
        q_in = query if query_pos is None else query + query_pos
        p = self.num_points

        offsets = nn.Dense(p * 2, kernel_init=torch_default_init, name="sampling_offsets")(q_in)
        offsets = offsets.reshape(*q_in.shape[:-1], p, 2)
        weights = nn.Dense(p, kernel_init=torch_default_init, name="attention_weights")(q_in)
        weights = nn.softmax(weights, axis=-1)

        value = nn.Dense(
            self.embed_dims, kernel_init=xavier_init, name="value_proj"
        )(query)

        h, w = hw
        norm = jnp.asarray([w, h], q_in.dtype)
        loc = ref_2d[:, None, :] + offsets / norm
        out = deform_sample_vectors(value, hw, loc, weights)
        out = nn.Dense(self.embed_dims, kernel_init=xavier_init, name="output_proj")(out)
        out = nn.Dropout(self.dropout, deterministic=deterministic)(out)
        return out + identity


class UVCrossAttention(nn.Module):
    """Depth-aware deformable cross-attention (learned offsets per depth)."""

    embed_dims: int = 128
    num_depth: int = 128
    num_points: int = 4
    dropout: float = 0.1

    @nn.compact
    def __call__(
        self, query, key_feat, value_feat, grid, hw, deterministic: bool = True
    ):
        """query: (Q, C); key_feat: (Q, C) own view; value_feat: (HW, C) other
        view; grid: (Q, D, 2) epipolar base locations."""
        identity = query
        d, p, c = self.num_depth, self.num_points, self.embed_dims

        offsets = nn.Dense(
            d * p * 2, kernel_init=zeros_init, bias_init=zeros_init,
            name="sampling_offsets",
        )(query)
        offsets = offsets.reshape(*query.shape[:-1], d, p, 2)
        weights = nn.Dense(
            d * p, kernel_init=zeros_init, bias_init=zeros_init,
            name="attention_weights",
        )(query)
        weights = nn.softmax(weights.reshape(*query.shape[:-1], d, p), axis=-1)

        value = nn.Dense(c, kernel_init=xavier_init, name="value_proj")(value_feat)
        scores = key_feat @ value.T / c  # (Q, HW); mean over channels

        h, w = hw
        norm = jnp.asarray([w, h], query.dtype)
        loc = grid[:, :, None, :] + offsets / norm
        corr = deform_sample_scores(scores, hw, loc, weights)  # (Q, D)

        out = nn.Dense(c, kernel_init=xavier_init, name="output_proj")(corr)
        out = nn.Dropout(self.dropout, deterministic=deterministic)(out)
        return out + identity


class UVFineLayer(nn.Module):
    """Self-attn -> cross-attn -> FFN with LayerNorms (encoder.py:97-210)."""

    embed_dims: int = 128
    num_depth: int = 128

    @nn.compact
    def __call__(
        self, query, bev_pos, key_feat, value_feat, grid, ref_2d, hw,
        deterministic: bool = True,
    ):
        query = UVSelfAttention(self.embed_dims, name="self_attn")(
            query, bev_pos, ref_2d, hw, deterministic
        )
        query = nn.LayerNorm(name="norm0")(query)
        query = UVCrossAttention(
            self.embed_dims, self.num_depth, name="cross_attn"
        )(query, key_feat, value_feat, grid, hw, deterministic)
        query = nn.LayerNorm(name="norm1")(query)
        query = FFN(self.embed_dims, 256, name="ffn")(query, deterministic)
        return nn.LayerNorm(name="norm2")(query)


class UVMatcher(nn.Module):
    """Coarse + fine matching for one directed view pair.

    Equivalent to the reference's coarse_transformer (1 layer) + fine
    transformer (2 layers) pipeline in match_two
    (depth_predictor_trans.py:236-290).
    """

    embed_dims: int = 128
    num_depth: int = 128
    num_fine_layers: int = 2
    # Gradient-checkpoint each fine layer (recompute in backward) — the
    # reference checkpoints its UV transformer layers
    # (/root/reference/src/model/utils/transformer.py:166-177).
    remat: bool = False

    @nn.compact
    def __call__(
        self, key_feat, value_feat, bev_pos, grid, ref_2d, hw,
        deterministic: bool = True,
    ):
        """All per-directed-pair, batched over leading dims by vmap outside.

        key_feat: (Q, C) ref view; value_feat: (HW, C) other view;
        bev_pos: (Q, C); grid: (Q, D, 2); ref_2d: (Q, 2).
        Returns (Q, C) correlation embedding.

        NOTE: the query's channel dim doubles as the depth-candidate axis, so
        num_depth must equal embed_dims (as in the reference, where both are
        hardwired to 128).
        """
        assert self.num_depth == self.embed_dims
        layer_cls = (
            nn.remat(UVFineLayer, static_argnums=(7, 8)) if self.remat
            else UVFineLayer
        )
        # Coarse: query starts at zero, identity-add of the raw correlation.
        query = coarse_correlation(key_feat, value_feat, grid, hw)
        for i in range(self.num_fine_layers):
            query = layer_cls(self.embed_dims, self.num_depth, name=f"fine_{i}")(
                query, bev_pos, key_feat, value_feat, grid, ref_2d, hw, deterministic
            )
        return query
