"""EncoderTranSplat: posed context images -> per-pixel world Gaussians.

Full pipeline mirror of /root/reference/src/model/encoder/encoder_trans.py:
backbone (CNN + multi-view Swin) -> frozen DAv2 mono prior -> depth predictor
(epipolar deformable cost volume) -> Gaussian adapter.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..geometry.projection import sample_image_grid, unnormalize_intrinsics
from ..ops.interpolate import resize_bilinear
from .adapter import GaussianAdapterCfg, adapt_gaussians
from .backbone.multiview import BackboneMultiview, normalize_images
from .dav2 import DepthAnythingV2
from .depth_predictor import DepthPredictor
from .types import Gaussians


@dataclass(frozen=True)
class OpacityMappingCfg:
    initial: float = 0.0
    final: float = 0.0
    warm_up: int = 1


@dataclass(frozen=True)
class EncoderCfg:
    d_feature: int = 128
    num_depth_candidates: int = 128
    num_surfaces: int = 1
    gaussians_per_pixel: int = 1
    num_context_views: int = 2
    downscale_factor: int = 4
    multiview_trans_attn_split: int = 2
    costvolume_unet_feat_dim: int = 128
    costvolume_unet_channel_mult: Sequence[int] = (1, 1, 1)
    costvolume_unet_attn_res: Sequence[int] = (4,)
    depth_unet_feat_dim: int = 32
    depth_unet_attn_res: Sequence[int] = (16,)
    depth_unet_channel_mult: Sequence[int] = (1, 1, 1, 1, 1)
    dav2_encoder: str = "vitb"
    dav2_input_size: int = 252
    gaussian_adapter: GaussianAdapterCfg = field(default_factory=GaussianAdapterCfg)
    opacity_mapping: OpacityMappingCfg = field(default_factory=OpacityMappingCfg)
    # "float32" (default; parity-exact) or "bfloat16": mixed-precision compute
    # for the depth-predictor conv/U-Net stages (params and every
    # softmax/normalization/disparity head stay f32). The reference trains
    # under TF32 (/root/reference/src/main.py:15) — same precedent.
    compute_dtype: str = "float32"
    # Gradient checkpointing (recompute in backward; the reference's U-Net
    # use_checkpoint + checkpointed UV layers, transformer.py:166-177).
    remat_unet: bool = False
    remat_matching: bool = False
    # Space-to-depth ResBlock chains in the 32-channel refine U-Net
    # (ops/s2d.py): identical parameters and function (fp-reassociation
    # level), ~2x the conv throughput on TPU. Mutually exclusive with
    # compute_dtype="bfloat16" (the s2d tower is f32-only; see __post_init__).
    s2d_unet: bool = False

    def __post_init__(self):
        if self.s2d_unet and self.compute_dtype == "bfloat16":
            raise ValueError(
                "s2d_unet=True requires compute_dtype='float32': the s2d "
                "U-Net tower only builds when dtype is None (model/unet.py), "
                "so bf16 would silently disable it. Pick one."
            )


def map_pdf_to_opacity(
    pdf: jnp.ndarray, cfg: OpacityMappingCfg, global_step: jnp.ndarray
) -> jnp.ndarray:
    """Warm-up-scheduled opacity curve (encoder_trans.py:139-152)."""
    x = cfg.initial + jnp.minimum(global_step / cfg.warm_up, 1.0) * (
        cfg.final - cfg.initial
    )
    exponent = 2.0**x
    return 0.5 * (1.0 - (1.0 - pdf) ** exponent + pdf ** (1.0 / exponent))


class EncoderTranSplat(nn.Module):
    cfg: EncoderCfg = EncoderCfg()

    @nn.compact
    def __call__(
        self,
        images: jnp.ndarray,  # (b, v, H, W, 3) in [0, 1]
        intrinsics: jnp.ndarray,  # (b, v, 3, 3) normalized
        extrinsics: jnp.ndarray,  # (b, v, 4, 4) camera-to-world
        near: jnp.ndarray,  # (b, v)
        far: jnp.ndarray,  # (b, v)
        global_step: jnp.ndarray | int = 0,
        train: bool = False,
        deterministic: bool = True,
        return_aux: bool = False,
    ):
        cfg = self.cfg
        if cfg.num_surfaces != 1:
            raise NotImplementedError(
                "num_surfaces > 1 is not implemented (the reference config "
                "keeps the axis but every shipped experiment uses 1; "
                "encoder_trans.py:127, gaussian_adapter.py:111-117)"
            )
        b, v, h, w, _ = images.shape

        # 1. Full-resolution img->world matrices for the backbone SE encoder.
        intr_px = unnormalize_intrinsics(intrinsics, (h, w))
        camk = jnp.broadcast_to(jnp.eye(4), (b, v, 4, 4)).at[..., :3, :3].set(intr_px)
        img2world = extrinsics @ jnp.linalg.inv(camk)

        # 2. Backbone: cross-view matching features at 1/4 resolution.
        trans_features, cnn_features = BackboneMultiview(
            feature_channels=cfg.d_feature, name="backbone"
        )(images, img2world, attn_splits=cfg.multiview_trans_attn_split, train=train)

        # 3. Frozen DAv2 prior: normalized + channel-shuffled [2,0,1], resized
        #    to 252x252 (encoder_trans.py:209-228). Fully stop-gradiented.
        da_in = normalize_images(images)[..., jnp.array([2, 0, 1])]
        da_in = resize_bilinear(
            da_in.reshape(b * v, h, w, 3),
            (cfg.dav2_input_size, cfg.dav2_input_size),
            align_corners=True,
        )
        da_depth, dino_feature = DepthAnythingV2(cfg.dav2_encoder, name="da_model")(
            da_in
        )
        da_depth = jax.lax.stop_gradient(da_depth)
        dino_feature = jax.lax.stop_gradient(dino_feature)
        da_depth = resize_bilinear(da_depth[..., None], (h, w), align_corners=True)
        # Min-max normalize per view.
        flat = da_depth.reshape(b * v, -1)
        lo = flat.min(axis=-1, keepdims=True)
        hi = flat.max(axis=-1, keepdims=True)
        da_depth = ((flat - lo) / (hi - lo + 1e-8)).reshape(b, v, h, w, 1)
        dino_feature = dino_feature.reshape(b, v, *dino_feature.shape[1:])

        # 4. Depth predictor.
        adapter_cfg = cfg.gaussian_adapter
        raw_channels = cfg.num_surfaces * (adapter_cfg.d_in + 2)
        depths, densities, raw_gaussians, aux = DepthPredictor(
            feature_channels=cfg.d_feature,
            upscale_factor=cfg.downscale_factor,
            num_depth_candidates=cfg.num_depth_candidates,
            costvolume_unet_feat_dim=cfg.costvolume_unet_feat_dim,
            costvolume_unet_channel_mult=cfg.costvolume_unet_channel_mult,
            costvolume_unet_attn_res=cfg.costvolume_unet_attn_res,
            gaussian_raw_channels=raw_channels,
            gaussians_per_pixel=cfg.gaussians_per_pixel,
            num_views=cfg.num_context_views,
            depth_unet_feat_dim=cfg.depth_unet_feat_dim,
            depth_unet_attn_res=cfg.depth_unet_attn_res,
            depth_unet_channel_mult=cfg.depth_unet_channel_mult,
            dtype=(
                jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None
            ),
            remat_unet=cfg.remat_unet,
            remat_matching=cfg.remat_matching,
            s2d_unet=cfg.s2d_unet,
            name="depth_predictor",
        )(
            trans_features,
            cnn_features,
            images,
            intrinsics,
            extrinsics,
            near,
            far,
            da_depth,
            dino_feature,
            train=train,
            deterministic=deterministic,
        )

        # 5. Gaussian adapter: rays + depths -> world Gaussians.
        r = h * w
        xy, _ = sample_image_grid((h, w))
        xy = xy.reshape(1, 1, r, 2)
        raw = raw_gaussians.reshape(b, v, r, cfg.num_surfaces, -1)[:, :, :, 0, :]
        offset_xy = jax.nn.sigmoid(raw[..., :2])
        pixel_size = jnp.asarray([1.0 / w, 1.0 / h], raw.dtype)
        coords = xy + (offset_xy - 0.5) * pixel_size

        gpp = cfg.gaussians_per_pixel
        opacities = (
            map_pdf_to_opacity(
                densities[..., 0, 0], cfg.opacity_mapping, jnp.asarray(global_step)
            )
            / gpp
        )

        out = adapt_gaussians(
            adapter_cfg,
            extrinsics,
            intrinsics,
            coords,
            depths[..., 0, 0],
            opacities,
            raw[..., 2:],
            (h, w),
        )

        gaussians = Gaussians(
            means=out["means"].reshape(b, v * r, 3),
            covariances=out["covariances"].reshape(b, v * r, 3, 3),
            harmonics=out["harmonics"].reshape(b, v * r, 3, adapter_cfg.d_sh),
            opacities=out["opacities"].reshape(b, v * r),
        )
        if return_aux:
            aux = dict(aux)
            aux["depths"] = depths.reshape(b, v, h, w)
            aux["scales"] = out["scales"].reshape(b, v * r, 3)
            aux["rotations"] = out["rotations"].reshape(b, v * r, 4)
            # Backbone matching features at 1/4 res, NHWC — the reference's
            # _last_trans_features stash consumed by the analysis layer
            # (encoder_trans.py:286-291).
            aux["features"] = trans_features
            return gaussians, aux
        return gaussians
