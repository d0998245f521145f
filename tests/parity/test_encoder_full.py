"""Full-encoder parity: reference EncoderTrans (CPU) vs EncoderTranSplat at
the flagship re10k configuration (256x256, v=2, D=128, DAv2-vitb), with
random-init weights converted by transplat_tpu.convert.encoder.

Also the pixel-gradient parity check from BASELINE's north star: gradients of
a rendered-color surrogate (both sides using the same differentiable JAX
oracle consumes Gaussians identically, so we compare gradients of a shared
scalar functional of the Gaussians w.r.t. input images).

SH rotation: the reference imports e3nn (absent); its rotate_sh is
monkeypatched with a torch wrapper of our Ivanic-recursion rotate_sh, which
is itself validated against the analytic rotation identity in
tests/test_geometry.py (eval(rotate_sh(c,R), d) == eval(c, R^T d)).
"""

from __future__ import annotations

import numpy as np
import pytest

from transplat_tpu.convert.encoder import (
    convert_encoder,
    convert_lightning_checkpoint,
)

from .conftest import report, to_nhwc
from .refstub import import_ref

pytestmark = pytest.mark.slow

B, V, H, W = 1, 2, 256, 256


def _jax_rotate_sh_as_torch(sh, rotations):
    """torch wrapper of transplat_tpu.geometry.sh.rotate_sh (broadcasting like
    the reference e3nn version)."""
    import torch

    from transplat_tpu.geometry.sh import rotate_sh

    sh_np = sh.detach().cpu().numpy()
    rot_np = np.broadcast_to(
        rotations.detach().cpu().numpy(), sh_np.shape[:-1] + (3, 3)
    )
    out = np.asarray(rotate_sh(sh_np, rot_np))
    return torch.from_numpy(out).to(sh.dtype)


@pytest.fixture(scope="module")
def ref_encoder():
    import torch

    et = import_ref("src.model.encoder.encoder_trans")
    global_cfg = import_ref("src.global_cfg")
    from omegaconf import DictConfig

    global_cfg.set_cfg(
        DictConfig(
            {
                "mode": "test",
                "dataset": {"view_sampler": {"num_context_views": V}},
            }
        )
    )

    # da_model weights are torch.load'ed unconditionally; serve random-init
    real_load = torch.load

    def fake_load(path, *a, **k):
        if "depth_anything" in str(path):
            dpt = import_ref("src.depth_anything_v2.dpt")
            torch.manual_seed(51)
            return dpt.DepthAnythingV2(
                encoder="vitb", features=128, out_channels=[96, 192, 384, 768]
            ).state_dict()
        return real_load(path, *a, **k)

    torch.load = fake_load
    try:
        torch.manual_seed(52)
        cfg = et.EncoderTransCfg(
            name="trans",
            d_feature=128,
            num_depth_candidates=128,
            num_surfaces=1,
            visualizer=None,
            gaussian_adapter=import_ref(
                "src.model.encoder.common.gaussian_adapter"
            ).GaussianAdapterCfg(
                gaussian_scale_min=0.5, gaussian_scale_max=15.0, sh_degree=4
            ),
            opacity_mapping=et.OpacityMappingCfg(initial=0.0, final=0.0, warm_up=1),
            gaussians_per_pixel=1,
            unimatch_weights_path=None,
            downscale_factor=4,
            shim_patch_size=4,
            multiview_trans_attn_split=2,
            costvolume_unet_feat_dim=128,
            costvolume_unet_channel_mult=[1, 1, 1],
            costvolume_unet_attn_res=[4],
            depth_unet_feat_dim=32,
            depth_unet_attn_res=[16],
            depth_unet_channel_mult=[1, 1, 1, 1, 1],
            wo_depth_refine=False,
            wo_cost_volume=False,
            wo_cost_volume_refine=False,
        )
        m = et.EncoderTrans(cfg).eval()
    finally:
        torch.load = real_load

    with torch.no_grad():
        # random-init DAv2 can emit an all-zero ReLU depth map, which NaNs the
        # min-max normalization on both sides; bias the head positive
        m.da_model.depth_head.scratch.output_conv2[0].bias.add_(0.5)
        m.da_model.depth_head.scratch.output_conv2[2].bias.add_(1.0)
        for layer in m.depth_predictor.fine_transformer.encoder.layers:
            cross = layer.attentions[1]
            cross.sampling_offsets.weight.normal_(0, 0.02)
            cross.sampling_offsets.bias.normal_(0, 0.5)
            cross.attention_weights.weight.normal_(0, 0.02)
            cross.attention_weights.bias.normal_(0, 0.5)
        for mod in m.modules():
            if isinstance(mod, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
                mod.running_mean.normal_(0, 0.5)
                mod.running_var.uniform_(0.5, 2.0)

    ga = import_ref("src.model.encoder.common.gaussian_adapter")
    ga.rotate_sh = _jax_rotate_sh_as_torch
    return m


def _context(seed=53):
    import torch

    g = torch.Generator().manual_seed(seed)
    images = torch.rand(B, V, 3, H, W, generator=g)
    intrinsics = torch.eye(3).repeat(B, V, 1, 1)
    intrinsics[..., 0, 0] = 1.2
    intrinsics[..., 1, 1] = 1.2
    intrinsics[..., 0, 2] = 0.5
    intrinsics[..., 1, 2] = 0.5
    extrinsics = torch.eye(4).repeat(B, V, 1, 1)
    for i in range(V):
        extrinsics[:, i, 0, 3] = 0.3 * i
    return {
        "image": images,
        "intrinsics": intrinsics,
        "extrinsics": extrinsics,
        "near": torch.full((B, V), 1.0),
        "far": torch.full((B, V), 100.0),
    }


def _flax_model_and_vars(ref_encoder):
    from transplat_tpu.model.encoder import EncoderCfg, EncoderTranSplat

    variables = convert_encoder(dict(ref_encoder.state_dict()))
    model = EncoderTranSplat(EncoderCfg())
    return model, variables


def test_encoder_full_parity(ref_encoder):
    import torch

    model, variables = _flax_model_and_vars(ref_encoder)
    ctx = _context()
    with torch.no_grad():
        ref_g = ref_encoder(ctx, global_step=100, deterministic=True)

    gaussians = model.apply(
        variables,
        to_nhwc(ctx["image"]),
        ctx["intrinsics"].numpy(),
        ctx["extrinsics"].numpy(),
        ctx["near"].numpy(),
        ctx["far"].numpy(),
        global_step=100,
        train=False,
        deterministic=True,
    )

    report("encoder means", gaussians.means, ref_g.means.numpy(), atol=5e-3, rtol=1e-3)
    report(
        "encoder opacities", gaussians.opacities, ref_g.opacities.numpy(), atol=5e-4
    )
    report(
        "encoder covariances",
        gaussians.covariances,
        ref_g.covariances.numpy(),
        atol=5e-3,
        rtol=1e-3,
    )
    report(
        "encoder harmonics",
        gaussians.harmonics,
        ref_g.harmonics.numpy(),
        atol=5e-4,
    )


def test_encoder_pixel_grad_parity(ref_encoder):
    """North-star gradient check: d(scalar functional of Gaussians)/d(images)
    allclose between torch and JAX graphs. The functional weights every
    Gaussian field so all adapter/SH/covariance paths contribute."""
    import torch

    model, variables = _flax_model_and_vars(ref_encoder)
    ctx = _context(seed=54)

    def functional_torch(g):
        return (
            g.means.sin().mean()
            + g.covariances.mean()
            + g.harmonics.square().mean()
            + g.opacities.mean()
        )

    images = ctx["image"].clone().requires_grad_(True)
    ctx_t = dict(ctx, image=images)
    ref_g = ref_encoder(ctx_t, global_step=100, deterministic=True)
    functional_torch(ref_g).backward()
    ref_grad = images.grad.detach()

    import jax
    import jax.numpy as jnp

    def functional_jax(img_nhwc):
        g = model.apply(
            variables,
            img_nhwc,
            ctx["intrinsics"].numpy(),
            ctx["extrinsics"].numpy(),
            ctx["near"].numpy(),
            ctx["far"].numpy(),
            global_step=100,
            train=False,
            deterministic=True,
        )
        return (
            jnp.sin(g.means).mean()
            + g.covariances.mean()
            + jnp.square(g.harmonics).mean()
            + g.opacities.mean()
        )

    grad = jax.grad(functional_jax)(jnp.asarray(to_nhwc(ctx["image"])))
    report(
        "encoder pixel grads",
        np.moveaxis(np.asarray(grad), -1, 2),
        ref_grad.numpy(),
        atol=5e-6,
        rtol=1e-3,
    )


def test_lightning_checkpoint_roundtrip(ref_encoder):
    """convert_lightning_checkpoint on a synthetic Lightning ckpt reproduces
    convert_encoder and surfaces the losses.* keys."""
    sd = {f"encoder.{k}": v for k, v in ref_encoder.state_dict().items()}
    sd["losses.0.lpips.net.slice1.0.weight"] = np.zeros((64, 3, 3, 3), np.float32)
    got = convert_lightning_checkpoint({"state_dict": sd})
    want = convert_encoder(dict(ref_encoder.state_dict()))

    import jax

    flat_g = jax.tree_util.tree_leaves_with_path(got["params"])
    flat_w = dict(jax.tree_util.tree_leaves_with_path(want["params"]))
    assert len(flat_g) == len(flat_w)
    for path, leaf in flat_g:
        np.testing.assert_array_equal(leaf, flat_w[path])
    assert list(got["lpips_state"]) == ["losses.0.lpips.net.slice1.0.weight"]
