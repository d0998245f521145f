"""Depth predictor: epipolar cost volume via depth-aware deformable attention,
cost-volume U-Net refinement, coarse-to-fine depth, and Gaussian heads.

Re-implements /root/reference/src/model/encoder/matching/depth_predictor_trans.py
batch-first: the reference's hand-rolled v=2/3/4 pair index arithmetic
(:347-414) becomes a single ordered-pair enumeration — for every view i the
correlation is the mean over directed pairs (i -> j), which reproduces the
reference combination exactly for v in {2, 3, 4} and generalizes beyond.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..geometry.epipolar import (
    epipolar_sample_grid,
    inverse_depth_candidates,
    relative_pose,
)
from ..geometry.projection import unnormalize_intrinsics
from ..ops.interpolate import resize_bilinear, upsample_nearest
from .cam_encoder import CamParamEncoder
from .layers import conv, group_norm
from .unet import UNetModel
from .uv_transformer import UVMatcher


class DepthPredictor(nn.Module):
    feature_channels: int = 128
    upscale_factor: int = 4
    num_depth_candidates: int = 128
    costvolume_unet_feat_dim: int = 128
    costvolume_unet_channel_mult: Sequence[int] = (1, 1, 1)
    costvolume_unet_attn_res: Sequence[int] = (4,)
    gaussian_raw_channels: int = 84
    gaussians_per_pixel: int = 1
    num_views: int = 2
    depth_unet_feat_dim: int = 32
    depth_unet_attn_res: Sequence[int] = (16,)
    depth_unet_channel_mult: Sequence[int] = (1, 1, 1, 1, 1)

    @nn.compact
    def __call__(
        self,
        features: jnp.ndarray,  # (b, v, hf, wf, C) transformer features
        cnn_features: jnp.ndarray,  # (b, v, hf, wf, C)
        images: jnp.ndarray,  # (b, v, H, W, 3)
        intrinsics: jnp.ndarray,  # (b, v, 3, 3) normalized
        extrinsics: jnp.ndarray,  # (b, v, 4, 4)
        near: jnp.ndarray,  # (b, v)
        far: jnp.ndarray,  # (b, v)
        da_depth: jnp.ndarray,  # (b, v, H, W, 1) normalized mono prior
        dino_feature: jnp.ndarray,  # (b, v, hd, wd, cd) DAv2 fusion feature
        train: bool = False,
        deterministic: bool = True,
    ):
        b, v, hf, wf, c = features.shape
        big_h, big_w = images.shape[2:4]
        d = self.num_depth_candidates
        q = hf * wf

        # --- geometry prep (feature-resolution intrinsics, reference :94-108)
        intr_px = unnormalize_intrinsics(intrinsics, (hf, wf))
        disp_candidates = inverse_depth_candidates(near, far, d)  # (b, v, D)

        # --- per-view positional features from DAv2 prior + camera params
        dino_small = resize_bilinear(
            dino_feature.reshape(b * v, *dino_feature.shape[2:]), (hf, wf), True
        )
        camk = jnp.broadcast_to(jnp.eye(4), (b, v, 4, 4))
        camk = camk.at[..., :3, :3].set(intr_px)
        img2world = extrinsics @ jnp.linalg.inv(camk)
        bev_pos = CamParamEncoder(128, c, name="cam_param_encoder")(
            dino_small, img2world.reshape(b * v, 16), train=train
        )  # (b*v, hf, wf, C)
        bev_pos = bev_pos.reshape(b, v, q, c)

        # --- directed pair enumeration
        pairs = [(i, j) for i in range(v) for j in range(v) if j != i]
        # Epipolar grids per pair: (b, D, HW, 2) -> (b, Q, D, 2)
        feats_tok = features.reshape(b, v, q, c)
        grids = []
        keys, values, poss = [], [], []
        for i, j in pairs:
            # Grid construction is no-grad in the reference (calculate_grid).
            rel = jax.lax.stop_gradient(
                relative_pose(extrinsics[:, i], extrinsics[:, j])
            )
            g = epipolar_sample_grid(
                jax.lax.stop_gradient(intr_px[:, i]),
                rel,
                1.0 / jax.lax.stop_gradient(disp_candidates[:, i]),
                hf,
                wf,
            )  # (b, D, HW, 2)
            grids.append(jnp.swapaxes(g, 1, 2))  # (b, Q, D, 2)
            keys.append(feats_tok[:, i])
            values.append(feats_tok[:, j])
            poss.append(bev_pos[:, i])
        grid_all = jnp.stack(grids, 1).reshape(b * len(pairs), q, d, 2)
        key_all = jnp.stack(keys, 1).reshape(b * len(pairs), q, c)
        value_all = jnp.stack(values, 1).reshape(b * len(pairs), q, c)
        pos_all = jnp.stack(poss, 1).reshape(b * len(pairs), q, c)

        # Pixel-center reference points for self-attention, [0, 1].
        ry = (jnp.arange(hf, dtype=features.dtype) + 0.5) / hf
        rx = (jnp.arange(wf, dtype=features.dtype) + 0.5) / wf
        ref2d = jnp.stack(jnp.meshgrid(rx, ry, indexing="xy"), -1).reshape(q, 2)
        ref2d_all = jnp.broadcast_to(ref2d, (b * len(pairs), q, 2))

        assert d == c, "num_depth_candidates must equal feature_channels"
        matcher = nn.vmap(
            UVMatcher,
            in_axes=(0, 0, 0, 0, 0, None, None),
            out_axes=0,
            variable_axes={"params": None, "batch_stats": None},
            split_rngs={"params": False, "dropout": True},
        )(embed_dims=c, num_depth=d, name="uv_matcher")
        corr = matcher(
            key_all, value_all, pos_all, grid_all, ref2d_all, (hf, wf), deterministic
        )  # (b*P, Q, C)

        # Mean over directed pairs sharing the same ref view.
        corr = corr.reshape(b, v, v - 1, q, c).mean(axis=2)

        # --- cost-volume U-Net refinement
        corr_maps = corr.reshape(b * v, hf, wf, c)
        feat01 = features.reshape(b * v, hf, wf, c)
        raw_in = jnp.concatenate([corr_maps, feat01], axis=-1)

        h = conv(self.costvolume_unet_feat_dim, 3, name="corr_conv_in")(raw_in)
        h = group_norm(self.costvolume_unet_feat_dim, name="corr_norm_in")(h)
        h = nn.gelu(h, approximate=False)
        h = UNetModel(
            model_channels=self.costvolume_unet_feat_dim,
            out_channels=self.costvolume_unet_feat_dim,
            num_res_blocks=1,
            attention_resolutions=tuple(self.costvolume_unet_attn_res),
            channel_mult=tuple(self.costvolume_unet_channel_mult),
            num_frames=self.num_views,
            name="corr_unet",
        )(h)
        raw_corr = conv(d, 3, name="corr_conv_out")(h)
        raw_corr = raw_corr + conv(d, 1, name="regressor_residual")(raw_in)

        # --- coarse depth from softmax expectation over candidates
        pdf_logits = conv(2 * d, 3, name="depth_head_0")(raw_corr)
        pdf_logits = nn.gelu(pdf_logits, approximate=False)
        pdf_logits = conv(d, 3, name="depth_head_2")(pdf_logits)
        pdf = nn.softmax(pdf_logits, axis=-1)  # (b*v, hf, wf, D)

        disp_c = disp_candidates.reshape(b * v, 1, 1, d)
        coarse_disps = jnp.sum(disp_c * pdf, axis=-1, keepdims=True)
        pdf_max = jnp.max(pdf, axis=-1, keepdims=True)
        pdf_max_full = upsample_nearest(pdf_max, self.upscale_factor)
        fullres_disps = resize_bilinear(
            coarse_disps, (big_h, big_w), align_corners=True
        )

        # --- depth refinement U-Net at full resolution
        proj_in = jnp.concatenate(
            [feat01, cnn_features.reshape(b * v, hf, wf, c)], axis=-1
        )
        up = conv(self.feature_channels, 3, name="upsampler_conv")(proj_in)
        up = resize_bilinear(up, (big_h, big_w), align_corners=True)
        proj_feat_fullres = nn.gelu(up, approximate=False)
        proj_feature = conv(self.depth_unet_feat_dim, 3, name="proj_feature")(
            proj_feat_fullres
        )

        imgs = images.reshape(b * v, big_h, big_w, 3)
        da = da_depth.reshape(b * v, big_h, big_w, 1)
        refine_in = jnp.concatenate(
            [imgs, da, proj_feature, fullres_disps, pdf_max_full], axis=-1
        )
        h = conv(self.depth_unet_feat_dim, 3, name="refine_conv_in")(refine_in)
        h = nn.GroupNorm(num_groups=4, name="refine_norm_in")(h)
        h = nn.gelu(h, approximate=False)
        refine_out = UNetModel(
            model_channels=self.depth_unet_feat_dim,
            out_channels=self.depth_unet_feat_dim,
            num_res_blocks=1,
            attention_resolutions=tuple(self.depth_unet_attn_res),
            channel_mult=tuple(self.depth_unet_channel_mult),
            num_frames=self.num_views,
            name="refine_unet",
        )(h)

        # --- Gaussian heads
        gau_in = jnp.concatenate([refine_out, imgs, proj_feat_fullres], axis=-1)
        g = conv(self.gaussian_raw_channels * 2, 3, name="to_gaussians_0")(gau_in)
        g = nn.gelu(g, approximate=False)
        raw_gaussians = conv(self.gaussian_raw_channels, 3, name="to_gaussians_2")(g)
        raw_gaussians = raw_gaussians.reshape(b, v, big_h * big_w, -1)

        dd = conv(self.depth_unet_feat_dim * 2, 3, name="to_disparity_0")(refine_out)
        dd = nn.gelu(dd, approximate=False)
        dd = conv(self.gaussians_per_pixel * 2, 3, name="to_disparity_2")(dd)
        gpp = self.gaussians_per_pixel
        delta_disps, raw_densities = dd[..., :gpp], dd[..., gpp:]

        densities = nn.sigmoid(raw_densities).reshape(b, v, big_h * big_w, 1, gpp)

        lo = (1.0 / far).reshape(b * v, 1, 1, 1)
        hi = (1.0 / near).reshape(b * v, 1, 1, 1)
        fine_disps = jnp.clip(fullres_disps + delta_disps, lo, hi)
        depths = (1.0 / fine_disps).reshape(b, v, big_h * big_w, 1, gpp)

        aux = {
            "pdf": pdf.reshape(b, v, hf, wf, d),
            "coarse_disps": coarse_disps.reshape(b, v, hf, wf),
            "depth_candidates": 1.0 / disp_candidates,
        }
        return depths, densities, raw_gaussians, aux
