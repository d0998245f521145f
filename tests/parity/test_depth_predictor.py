"""Depth-predictor parity: reference DepthPredictorTrans (CPU fallback) vs the
batch-first Flax DepthPredictor, full flagship shapes (64x64 features, 256x256
images, D=128), converted random-init weights.

Reference: src/model/encoder/matching/depth_predictor_trans.py:292-493.
Parametrized over V in {2, 3, 4}: the reference's hand-rolled multi-view
correlation composition (:347-414) must be reproduced exactly by the
batch-first directed-pair mean (model/depth_predictor.py matching()).
"""

from __future__ import annotations

import numpy as np
import pytest

from transplat_tpu.convert.depth_predictor import convert_depth_predictor

from .conftest import report, to_nhwc
from .refstub import import_ref

pytestmark = pytest.mark.slow

B, C, HF, WF = 1, 128, 64, 64
H = W = 256
DINO_CH = 64


def _posed_cameras(b, v, seed=0):
    """Random-ish but well-conditioned camera setup."""
    import torch

    g = torch.Generator().manual_seed(seed)
    intrinsics = torch.eye(3).repeat(b, v, 1, 1)
    intrinsics[..., 0, 0] = 1.2
    intrinsics[..., 1, 1] = 1.2
    intrinsics[..., 0, 2] = 0.5
    intrinsics[..., 1, 2] = 0.5
    extrinsics = torch.eye(4).repeat(b, v, 1, 1)
    for i in range(v):
        extrinsics[:, i, 0, 3] = 0.3 * i + 0.05 * torch.randn(b, generator=g)
        extrinsics[:, i, 1, 3] = 0.05 * torch.randn(b, generator=g)
    near = torch.full((b, v), 1.0)
    far = torch.full((b, v), 100.0)
    return intrinsics, extrinsics, near, far


@pytest.mark.parametrize("V", [2, 3, 4])
def test_depth_predictor_parity(V):
    import torch

    from transplat_tpu.model.depth_predictor import DepthPredictor

    dpt = import_ref("src.model.encoder.matching.depth_predictor_trans")
    torch.manual_seed(41)
    ref = dpt.DepthPredictorTrans(
        feature_channels=C,
        upscale_factor=4,
        num_depth_candidates=128,
        costvolume_unet_feat_dim=128,
        costvolume_unet_channel_mult=(1, 1, 1),
        costvolume_unet_attn_res=(4,),
        gaussian_raw_channels=84,
        gaussians_per_pixel=1,
        num_views=V,
        depth_unet_feat_dim=32,
        depth_unet_attn_res=(16,),
        depth_unet_channel_mult=(1, 1, 1, 1, 1),
        DA_size=DINO_CH,
    ).eval()
    with torch.no_grad():
        # exercise the zero-init deformable offsets/weights
        for attn_name in ("attentions.1",):
            for layer in ref.fine_transformer.encoder.layers:
                cross = layer.attentions[1]
                cross.sampling_offsets.weight.normal_(0, 0.02)
                cross.sampling_offsets.bias.normal_(0, 0.5)
                cross.attention_weights.weight.normal_(0, 0.02)
                cross.attention_weights.bias.normal_(0, 0.5)
        for m in ref.modules():
            if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 2.0)

    torch.manual_seed(42)
    features = torch.randn(B, V, C, HF, WF) * 0.5
    cnn_features = torch.randn(B, V, C, HF, WF) * 0.5
    images = torch.rand(B, V, 3, H, W)
    da_depth = torch.rand(B, V, 1, H, W)
    dino_feature = torch.randn(B, V, DINO_CH, 63, 63) * 0.5
    intrinsics, extrinsics, near, far = _posed_cameras(B, V)

    from einops import rearrange

    with torch.no_grad():
        ref_depths, ref_densities, ref_raw = ref(
            features,
            intrinsics,
            extrinsics,
            near,
            far,
            gaussians_per_pixel=1,
            deterministic=True,
            extra_info={"images": rearrange(images, "b v ... -> (v b) ...")},
            cnn_features=cnn_features,
            da_depth=da_depth,
            dino_feature=dino_feature,
        )

    variables = convert_depth_predictor(
        {k: v for k, v in ref.state_dict().items()},
        costvolume_unet_channel_mult=(1, 1, 1),
        costvolume_unet_attn_res=(4,),
        depth_unet_channel_mult=(1, 1, 1, 1, 1),
        depth_unet_attn_res=(16,),
    )
    model = DepthPredictor(
        feature_channels=C,
        num_depth_candidates=128,
        costvolume_unet_feat_dim=128,
        costvolume_unet_channel_mult=(1, 1, 1),
        costvolume_unet_attn_res=(4,),
        gaussian_raw_channels=84,
        num_views=V,
        depth_unet_feat_dim=32,
        depth_unet_attn_res=(16,),
        depth_unet_channel_mult=(1, 1, 1, 1, 1),
    )
    depths, densities, raw_gaussians, aux = model.apply(
        variables,
        to_nhwc(features),
        to_nhwc(cnn_features),
        to_nhwc(images),
        intrinsics.numpy(),
        extrinsics.numpy(),
        near.numpy(),
        far.numpy(),
        to_nhwc(da_depth),
        to_nhwc(dino_feature),
        train=False,
        deterministic=True,
    )

    report("depth_predictor raw_gaussians", raw_gaussians, ref_raw.numpy(), atol=5e-4)
    report("depth_predictor densities", densities, ref_densities.numpy(), atol=5e-4)
    report("depth_predictor depths", depths, ref_depths.numpy(), atol=5e-3, rtol=1e-4)
