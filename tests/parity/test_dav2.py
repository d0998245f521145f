"""Depth-Anything-V2 parity: reference torch (dpt.py:154-222, dinov2.py) vs
the Flax port, random-init weights converted via transplat_tpu.convert.dav2.

Covers the two flagged conversion risk points: the DINOv2 pos-embed bicubic
interpolation (+0.1 scale offset, a=-0.75) and the DPT fusion pyramid.
"""

from __future__ import annotations

import numpy as np
import pytest

from transplat_tpu.convert.dav2 import convert_dav2

from .conftest import report, to_nhwc
from .refstub import import_ref

MODEL_CONFIGS = {
    "vits": dict(features=64, out_channels=[48, 96, 192, 384]),
    "vitb": dict(features=128, out_channels=[96, 192, 384, 768]),
}


def _build(encoder: str):
    import torch

    dpt = import_ref("src.depth_anything_v2.dpt")
    torch.manual_seed(11)
    m = dpt.DepthAnythingV2(encoder=encoder, **MODEL_CONFIGS[encoder])
    m.eval()
    return m


@pytest.mark.parametrize("encoder,size", [("vits", 112), ("vitb", 112)])
def test_dav2_parity(encoder, size):
    import torch

    from transplat_tpu.model.dav2.dpt import DepthAnythingV2

    ref = _build(encoder)
    torch.manual_seed(12)
    x = torch.randn(1, 3, size, size)
    with torch.no_grad():
        ref_depth, ref_feat = ref(x)

    variables = convert_dav2(ref.state_dict(), encoder=encoder)
    depth, feat = DepthAnythingV2(encoder=encoder).apply(variables, to_nhwc(x))

    report(f"dav2[{encoder}] feature", feat, to_nhwc(ref_feat), atol=5e-4)
    report(
        f"dav2[{encoder}] depth",
        np.asarray(depth),
        ref_depth.numpy(),
        atol=5e-4,
    )


@pytest.mark.slow
def test_dav2_vitb_252_parity():
    """Flagship path: 252x252 input (the encoder_trans resize target),
    exercising the 37->18 pos-embed interpolation."""
    import torch

    from transplat_tpu.model.dav2.dpt import DepthAnythingV2

    ref = _build("vitb")
    torch.manual_seed(13)
    x = torch.randn(1, 3, 252, 252)
    with torch.no_grad():
        ref_depth, ref_feat = ref(x)

    variables = convert_dav2(ref.state_dict(), encoder="vitb")
    depth, feat = DepthAnythingV2(encoder="vitb").apply(variables, to_nhwc(x))
    report("dav2 252 feature", feat, to_nhwc(ref_feat), atol=5e-4)
    report("dav2 252 depth", np.asarray(depth), ref_depth.numpy(), atol=5e-4)
