"""UV deformable-attention parity: reference attention.py UV modules (CPU
pure-torch fallback) vs the score-hoisted Flax port.

The port computes S = K V^T once and samples scalars; the reference samples
128-dim vectors then reduces against the key. Bilinear sampling is linear, so
the two are mathematically identical — these tests pin that down numerically.
"""

from __future__ import annotations

import numpy as np
import pytest

from transplat_tpu.convert.uv import convert_uv_matcher

from .conftest import report
from .refstub import import_ref

C = 128
D = 128  # num_depth (hardwired in the reference modules)
U = V = 8  # query map side for unit tests
Q = U * V


def _pixel_centers(u, v):
    ys, xs = np.meshgrid(
        (np.arange(v) + 0.5) / v, (np.arange(u) + 0.5) / u, indexing="ij"
    )
    return np.stack([xs.ravel(), ys.ravel()], -1).astype(np.float32)  # (Q, 2) x,y


def test_uv_self_attention_parity():
    import torch

    from transplat_tpu.model.uv_transformer import UVSelfAttention

    attn_mod = import_ref("src.model.utils.attention")
    torch.manual_seed(31)
    ref = attn_mod.UVSelfAttention(embed_dims=C).eval()

    torch.manual_seed(32)
    query = torch.randn(1, Q, C)
    pos = torch.randn(1, Q, C)
    ref_2d = torch.from_numpy(_pixel_centers(U, V))[None, :, None, :]
    with torch.no_grad():
        ref_out = ref(
            query,
            value=query,
            query_pos=pos,
            ref_2d=ref_2d,
            spatial_shapes=torch.tensor([[V, U]]),
            level_start_index=torch.tensor([0]),
        )

    sd = ref.state_dict()
    from transplat_tpu.convert.common import t2f_linear

    params = {
        name: {"kernel": t2f_linear(sd[f"{name}.weight"]), "bias": np.asarray(sd[f"{name}.bias"])}
        for name in ("sampling_offsets", "attention_weights", "value_proj", "output_proj")
    }
    out = UVSelfAttention(embed_dims=C).apply(
        {"params": params},
        query[0].numpy(),
        pos[0].numpy(),
        _pixel_centers(U, V),
        (V, U),
    )
    report("uv_self_attention", out, ref_out[0].numpy(), atol=2e-5)


def _feat_flatten(f0, f1):
    """two (HW, C) torch feature maps -> reference key/value (2, HW, 1, C)."""
    import torch

    return torch.stack([f0, f1], 0)[:, :, None, :]


def test_uv_cross_attention_parity():
    import torch

    from transplat_tpu.model.uv_transformer import UVCrossAttention

    attn_mod = import_ref("src.model.utils.attention")
    torch.manual_seed(33)
    ref = attn_mod.UVCrossAttention(embed_dims=C).eval()
    # ctor zero-inits offsets/weights; randomize so the test exercises them
    with torch.no_grad():
        ref.sampling_offsets.weight.normal_(0, 0.02)
        ref.sampling_offsets.bias.normal_(0, 0.5)
        ref.attention_weights.weight.normal_(0, 0.02)
        ref.attention_weights.bias.normal_(0, 0.5)

    torch.manual_seed(34)
    query = torch.randn(2, Q, C)  # two directions of one pair (bs=1)
    f0 = torch.randn(Q, C)  # view 0 features (64-pix map here)
    f1 = torch.randn(Q, C)
    grid = torch.rand(2, Q, D, 2) * 1.2 - 0.1  # in [0,1] with a margin outside

    kv = _feat_flatten(f0, f1)
    with torch.no_grad():
        ref_out = ref(
            query,
            kv,
            kv,
            ref_3d=grid,
            spatial_shapes=torch.tensor([[V, U]]),
            level_start_index=torch.tensor([0]),
        )

    sd = ref.state_dict()
    from transplat_tpu.convert.common import t2f_linear

    params = {
        name: {"kernel": t2f_linear(sd[f"{name}.weight"]), "bias": np.asarray(sd[f"{name}.bias"])}
        for name in ("sampling_offsets", "attention_weights", "value_proj", "output_proj")
    }
    model = UVCrossAttention(embed_dims=C, num_depth=D)
    # direction 0: query view0, key = view0 feats, value = view1 feats (flip)
    for direction, (kf, vf) in enumerate([(f0, f1), (f1, f0)]):
        out = model.apply(
            {"params": params},
            query[direction].numpy(),
            kf.numpy(),
            vf.numpy(),
            grid[direction].numpy(),
            (V, U),
        )
        report(
            f"uv_cross_attention[dir{direction}]",
            out,
            ref_out[direction].numpy(),
            atol=5e-5,
        )


def test_uv_coarse_attention_parity():
    import torch

    from transplat_tpu.model.uv_transformer import coarse_correlation

    attn_mod = import_ref("src.model.utils.attention")
    torch.manual_seed(35)
    ref = attn_mod.UVCoarseAttention(embed_dims=C).eval()

    torch.manual_seed(36)
    query = torch.zeros(2, Q, C)  # match_two starts from zero queries
    f0 = torch.randn(Q, C)
    f1 = torch.randn(Q, C)
    grid = torch.rand(2, Q, D, 2) * 1.2 - 0.1

    kv = _feat_flatten(f0, f1)
    with torch.no_grad():
        ref_out = ref(
            query,
            kv,
            kv,
            ref_3d=grid,
            spatial_shapes=torch.tensor([[V, U]]),
            level_start_index=torch.tensor([0]),
        )

    for direction, (kf, vf) in enumerate([(f0, f1), (f1, f0)]):
        out = coarse_correlation(
            kf.numpy(), vf.numpy(), grid[direction].numpy(), (V, U)
        )
        report(
            f"uv_coarse[dir{direction}]", out, ref_out[direction].numpy(), atol=5e-5
        )


def test_uv_matcher_converter_shapes():
    """convert_uv_matcher output must initialize UVMatcher exactly."""
    import jax
    import torch

    from transplat_tpu.model.uv_transformer import UVMatcher

    tr = import_ref("src.model.utils.transformer")
    torch.manual_seed(37)
    coarse = tr.UVTransformer(embed_dims=C, mode="coarse", num_layers=1)
    fine = tr.UVTransformer(embed_dims=C, mode="fine", num_layers=2)
    variables = convert_uv_matcher(coarse.state_dict(), fine.state_dict())

    model = UVMatcher(embed_dims=C, num_depth=D)
    want = model.init(
        jax.random.PRNGKey(0),
        np.zeros((Q, C), np.float32),
        np.zeros((Q, C), np.float32),
        np.zeros((Q, C), np.float32),
        np.zeros((Q, D, 2), np.float32),
        _pixel_centers(U, V),
        (V, U),
    )
    got_paths = {p for p, _ in jax.tree_util.tree_leaves_with_path(variables["params"])}
    want_paths = {p for p, _ in jax.tree_util.tree_leaves_with_path(want["params"])}
    assert got_paths == want_paths
