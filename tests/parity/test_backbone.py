"""Backbone parity: reference torch BackboneMultiview vs Flax port.

Reference: src/model/encoder/backbone/backbone_multiview.py:36-133,
unimatch/backbone.py:39-117, utils/cam_param_encoder.py:45-93,
multiview_transformer.py:410-625.
"""

from __future__ import annotations

import numpy as np
import pytest

from transplat_tpu.convert.backbone import (
    convert_backbone_multiview,
    convert_unimatch_checkpoint,
)

from .conftest import report, to_nhwc
from .refstub import import_ref


def _randomize_running_stats(module):
    """Give BatchNorms non-trivial running stats so the converter's
    batch_stats mapping is actually exercised."""
    import torch

    for m in module.modules():
        if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
            with torch.no_grad():
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 2.0)


@pytest.fixture(scope="module")
def ref_backbone():
    bm = import_ref("src.model.encoder.backbone.backbone_multiview")
    import torch

    torch.manual_seed(7)
    m = bm.BackboneMultiview(downscale_factor=4)
    _randomize_running_stats(m)
    m.eval()
    return m


def test_cnn_encoder_parity(ref_backbone):
    import torch

    from transplat_tpu.model.backbone.cnn import CNNEncoder

    torch.manual_seed(1)
    x = torch.randn(2, 3, 64, 64)
    with torch.no_grad():
        ref = ref_backbone.backbone(x)
    if isinstance(ref, list):
        ref = ref[0]

    variables = convert_backbone_multiview(dict(ref_backbone.state_dict()))
    out = CNNEncoder(128, name="backbone").apply(
        {"params": variables["params"]["backbone"]}, to_nhwc(x)
    )
    report("cnn_encoder", out, to_nhwc(ref), atol=2e-5)


def test_cam_param_encoder_parity(ref_backbone):
    import torch

    from transplat_tpu.model.cam_encoder import CamParamEncoder

    torch.manual_seed(2)
    feat = torch.randn(4, 128, 16, 16)
    cams = torch.randn(4, 16)
    with torch.no_grad():
        ref = ref_backbone.cam_param_encoder(feat, cams)

    variables = convert_backbone_multiview(dict(ref_backbone.state_dict()))
    out = CamParamEncoder(mid_channels=128, embed_dims=128).apply(
        {
            "params": variables["params"]["cam_param_encoder"],
            "batch_stats": variables["batch_stats"]["cam_param_encoder"],
        },
        to_nhwc(feat),
        cams.numpy(),
        train=False,
    )
    report("cam_param_encoder", out, to_nhwc(ref), atol=2e-5)


@pytest.mark.parametrize("num_views", [2, 3])
def test_backbone_multiview_parity(ref_backbone, num_views):
    import torch

    from transplat_tpu.model.backbone.multiview import BackboneMultiview

    torch.manual_seed(3)
    b, v, h, w = 1, num_views, 64, 64
    images = torch.rand(b, v, 3, h, w)
    img2world = torch.randn(b, v, 4, 4)
    with torch.no_grad():
        ref_trans, ref_cnn = ref_backbone(
            images, attn_splits=2, return_cnn_features=True, img2world=img2world
        )

    variables = convert_backbone_multiview(dict(ref_backbone.state_dict()))
    trans, cnn = BackboneMultiview().apply(
        variables, to_nhwc(images.numpy()), img2world.numpy(), attn_splits=2, train=False
    )
    report("backbone cnn_features", cnn, to_nhwc(ref_cnn), atol=2e-5)
    report("backbone trans_features", trans, to_nhwc(ref_trans), atol=5e-4)


def test_unimatch_partial_load_matches_reference_filter(ref_backbone):
    """The reference's partial load (encoder_trans.py:90-98) keeps exactly the
    intersection of checkpoint and model keys. Build a fake gmdepth checkpoint
    from the reference backbone's own weights; conversion must reproduce the
    same CNN + transformer subtrees as the full converter."""
    sd = dict(ref_backbone.state_dict())
    fake_ckpt = {k: v for k, v in sd.items() if k.split(".")[0] in ("backbone", "transformer")}
    got = convert_unimatch_checkpoint(fake_ckpt)
    want = convert_backbone_multiview(sd)

    import jax

    for key in ("backbone", "transformer"):
        ga, wa = got["params"][key], want["params"][key]
        flat_g = jax.tree_util.tree_leaves_with_path(ga)
        flat_w = dict(jax.tree_util.tree_leaves_with_path(wa))
        assert len(flat_g) == len(flat_w)
        for path, leaf in flat_g:
            np.testing.assert_array_equal(leaf, flat_w[path])
