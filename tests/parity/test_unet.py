"""LDM U-Net parity: reference ldm_unet/unet.py (postnorm, timestep-free) vs
the Flax UNetModel, for both live configurations (cost-volume and refine).

Layout note: the reference runs in (v b) view-major batch; the Flax port is
(b v). The cross-view attention folds views of the same scene either way, so
parity holds after permuting the batch axis.
"""

from __future__ import annotations

import numpy as np
import pytest

from transplat_tpu.convert.unet import convert_unet

from .conftest import report, to_nhwc
from .refstub import import_ref


def _vb_to_bv(x: np.ndarray, v: int) -> np.ndarray:
    """(v*b, ...) view-major -> (b*v, ...) batch-major."""
    vb = x.shape[0]
    b = vb // v
    return x.reshape(v, b, *x.shape[1:]).swapaxes(0, 1).reshape(vb, *x.shape[1:])


@pytest.mark.parametrize(
    "channels,attn_res,channel_mult,num_frames,b",
    [
        (128, (4,), (1, 1, 1), 2, 1),  # corr_refine_net config (re10k)
        (32, (16,), (1, 1, 1, 1, 1), 2, 1),  # refine_unet-style config, deeper
        (64, (), (1, 1), 3, 2),  # no attention, 3 views
    ],
)
def test_unet_parity(channels, attn_res, channel_mult, num_frames, b):
    import torch

    from transplat_tpu.model.unet import UNetModel

    un = import_ref("src.model.encoder.matching.ldm_unet.unet")
    torch.manual_seed(21)
    ref = un.UNetModel(
        image_size=None,
        in_channels=channels,
        model_channels=channels,
        out_channels=channels,
        num_res_blocks=1,
        attention_resolutions=list(attn_res),
        channel_mult=channel_mult,
        num_head_channels=32,
        dims=2,
        postnorm=True,
        num_frames=num_frames,
        use_cross_view_self_attn=True,
    ).eval()

    size = 32
    torch.manual_seed(22)
    x = torch.randn(num_frames * b, channels, size, size)
    with torch.no_grad():
        ref_out = ref(x)

    variables = convert_unet(
        ref.state_dict(),
        channel_mult=channel_mult,
        num_res_blocks=1,
        attention_resolutions=attn_res,
    )
    model = UNetModel(
        model_channels=channels,
        out_channels=channels,
        num_res_blocks=1,
        attention_resolutions=attn_res,
        channel_mult=channel_mult,
        num_head_channels=32,
        num_frames=num_frames,
        cross_view=True,
    )
    x_bv = _vb_to_bv(to_nhwc(x), num_frames)
    out = model.apply(variables, x_bv)
    ref_bv = _vb_to_bv(to_nhwc(ref_out), num_frames)
    report("unet", out, ref_bv, atol=1e-4)
