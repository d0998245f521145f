"""Depth predictor: epipolar cost volume via depth-aware deformable attention,
cost-volume U-Net refinement, coarse-to-fine depth, and Gaussian heads.

Re-implements /root/reference/src/model/encoder/matching/depth_predictor_trans.py
batch-first: the reference's hand-rolled v=2/3/4 pair index arithmetic
(:347-414) becomes a single ordered-pair enumeration — for every view i the
correlation is the mean over directed pairs (i -> j), which reproduces the
reference combination exactly for v in {2, 3, 4} and generalizes beyond.

Structured as setup-style stage methods mirroring the reference's profiling
taxonomy (encoder_4a..4f, model_wrapper.py:381-395) so the evaluator can time
each stage as its own jitted function; __call__ chains them under
jax.named_scope for xprof attribution. Parity: tests/parity/test_depth_predictor.py.
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
    # Computation dtype for the conv/U-Net stages (params stay f32; heads'
    # disparity arithmetic and every softmax stay f32). None = full f32.
    dtype: jnp.dtype | None = None
    # Gradient checkpointing: recompute the U-Nets / UV matching layers in
    # the backward instead of storing activations (the reference's U-Net
    # use_checkpoint flag and checkpointed UV layers,
    # /root/reference/src/model/utils/transformer.py:166-177).
    remat_unet: bool = False
    remat_matching: bool = False
    # Space-to-depth ResBlock chains in the thin-channel refine U-Net
    # (ops/s2d.py): same parameters/function, full-lane MXU shapes.
    s2d_unet: bool = False

    def setup(self):
        c, d = self.feature_channels, self.num_depth_candidates
        unet_cls = nn.remat(UNetModel) if self.remat_unet else UNetModel
        self.cam_param_encoder = CamParamEncoder(128, c, name="cam_param_encoder")
        self.uv_matcher = nn.vmap(
            UVMatcher,
            in_axes=(0, 0, 0, 0, 0, None, None),
            out_axes=0,
            variable_axes={"params": None, "batch_stats": None},
            split_rngs={"params": False, "dropout": True},
        )(embed_dims=c, num_depth=d, remat=self.remat_matching, name="uv_matcher")

        self.corr_conv_in = conv(
            self.costvolume_unet_feat_dim, 3, name="corr_conv_in", dtype=self.dtype
        )
        self.corr_norm_in = group_norm(
            self.costvolume_unet_feat_dim, name="corr_norm_in", dtype=self.dtype
        )
        self.corr_unet = unet_cls(
            model_channels=self.costvolume_unet_feat_dim,
            out_channels=self.costvolume_unet_feat_dim,
            num_res_blocks=1,
            attention_resolutions=tuple(self.costvolume_unet_attn_res),
            channel_mult=tuple(self.costvolume_unet_channel_mult),
            num_frames=self.num_views,
            dtype=self.dtype,
            name="corr_unet",
        )
        self.corr_conv_out = conv(d, 3, name="corr_conv_out", dtype=self.dtype)
        self.regressor_residual = conv(d, 1, name="regressor_residual", dtype=self.dtype)

        self.depth_head_0 = conv(2 * d, 3, name="depth_head_0", dtype=self.dtype)
        self.depth_head_2 = conv(d, 3, name="depth_head_2", dtype=self.dtype)

        self.upsampler_conv = conv(
            self.feature_channels, 3, name="upsampler_conv", dtype=self.dtype
        )
        self.proj_feature = conv(
            self.depth_unet_feat_dim, 3, name="proj_feature", dtype=self.dtype
        )
        self.refine_conv_in = conv(
            self.depth_unet_feat_dim, 3, name="refine_conv_in", dtype=self.dtype
        )
        self.refine_norm_in = nn.GroupNorm(
            num_groups=4, dtype=self.dtype or jnp.float32, name="refine_norm_in"
        )
        self.refine_unet = unet_cls(
            model_channels=self.depth_unet_feat_dim,
            out_channels=self.depth_unet_feat_dim,
            num_res_blocks=1,
            attention_resolutions=tuple(self.depth_unet_attn_res),
            channel_mult=tuple(self.depth_unet_channel_mult),
            num_frames=self.num_views,
            dtype=self.dtype,
            s2d=self.s2d_unet,
            name="refine_unet",
        )

        self.to_gaussians_0 = conv(
            self.gaussian_raw_channels * 2, 3, name="to_gaussians_0", dtype=self.dtype
        )
        self.to_gaussians_2 = conv(
            self.gaussian_raw_channels, 3, name="to_gaussians_2", dtype=self.dtype
        )
        self.to_disparity_0 = conv(
            self.depth_unet_feat_dim * 2, 3, name="to_disparity_0", dtype=self.dtype
        )
        self.to_disparity_2 = conv(
            self.gaussians_per_pixel * 2, 3, name="to_disparity_2", dtype=self.dtype
        )

    # ---- stage 4a: geometry prep + positional features -------------------

    def prep(
        self, features, intrinsics, extrinsics, near, far, dino_feature,
        train: bool = False,
    ):
        """Per-view geometry + directed-pair tensors (encoder_4a)."""
        b, v, hf, wf, c = features.shape
        d = self.num_depth_candidates
        q = hf * wf

        intr_px = unnormalize_intrinsics(intrinsics, (hf, wf))
        disp_candidates = inverse_depth_candidates(near, far, d)  # (b, v, D)

        dino_small = resize_bilinear(
            dino_feature.reshape(b * v, *dino_feature.shape[2:]), (hf, wf), True
        )
        camk = jnp.broadcast_to(jnp.eye(4), (b, v, 4, 4))
        camk = camk.at[..., :3, :3].set(intr_px)
        img2world = extrinsics @ jnp.linalg.inv(camk)
        bev_pos = self.cam_param_encoder(
            dino_small, img2world.reshape(b * v, 16), train=train
        )  # (b*v, hf, wf, C)
        bev_pos = bev_pos.reshape(b, v, q, c)

        pairs = [(i, j) for i in range(v) for j in range(v) if j != i]
        feats_tok = features.reshape(b, v, q, c)
        grids, keys, values, poss = [], [], [], []
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
        npairs = len(pairs)

        ry = (jnp.arange(hf, dtype=features.dtype) + 0.5) / hf
        rx = (jnp.arange(wf, dtype=features.dtype) + 0.5) / wf
        ref2d = jnp.stack(jnp.meshgrid(rx, ry, indexing="xy"), -1).reshape(q, 2)

        return {
            "grid": jnp.stack(grids, 1).reshape(b * npairs, q, d, 2),
            "key": jnp.stack(keys, 1).reshape(b * npairs, q, c),
            "value": jnp.stack(values, 1).reshape(b * npairs, q, c),
            "pos": jnp.stack(poss, 1).reshape(b * npairs, q, c),
            "ref2d": jnp.broadcast_to(ref2d, (b * npairs, q, 2)),
            "disp_candidates": disp_candidates,
        }

    # ---- stage 4b: deformable cost-volume matching -----------------------

    def matching(self, prep, hw: tuple[int, int], deterministic: bool = True):
        """Directed-pair UV matching -> per-view correlation (encoder_4b)."""
        hf, wf = hw
        corr = self.uv_matcher(
            prep["key"], prep["value"], prep["pos"], prep["grid"], prep["ref2d"],
            (hf, wf), deterministic,
        )  # (b*P, Q, C)
        npairs = self.num_views * (self.num_views - 1)
        b = corr.shape[0] // npairs
        v = self.num_views
        # Mean over directed pairs sharing the same ref view.
        return corr.reshape(b, v, v - 1, hf * wf, corr.shape[-1]).mean(axis=2)

    # ---- stage 4c: cost-volume U-Net ------------------------------------

    def cost_unet(self, corr, features):
        """U-Net refinement + residual skip (encoder_4c)."""
        b, v, hf, wf, c = features.shape
        corr_maps = corr.reshape(b * v, hf, wf, c)
        feat01 = features.reshape(b * v, hf, wf, c)
        raw_in = jnp.concatenate([corr_maps, feat01], axis=-1)

        h = self.corr_conv_in(raw_in)
        h = self.corr_norm_in(h)
        h = nn.gelu(h, approximate=False)
        h = self.corr_unet(h)
        raw_corr = self.corr_conv_out(h)
        return raw_corr + self.regressor_residual(raw_in)

    # ---- stage 4d: coarse depth ------------------------------------------

    def coarse_depth(self, raw_corr, disp_candidates, image_shape):
        """Softmax-expectation coarse disparity + upsampling (encoder_4d)."""
        big_h, big_w = image_shape
        d = self.num_depth_candidates
        bv = raw_corr.shape[0]

        pdf_logits = self.depth_head_0(raw_corr)
        pdf_logits = nn.gelu(pdf_logits, approximate=False)
        pdf_logits = self.depth_head_2(pdf_logits)
        # Softmax + disparity expectation in f32 regardless of compute dtype.
        pdf = nn.softmax(pdf_logits.astype(jnp.float32), axis=-1)  # (b*v, hf, wf, D)

        disp_c = disp_candidates.reshape(bv, 1, 1, d)
        coarse_disps = jnp.sum(disp_c * pdf, axis=-1, keepdims=True)
        pdf_max = jnp.max(pdf, axis=-1, keepdims=True)
        pdf_max_full = upsample_nearest(pdf_max, self.upscale_factor)
        fullres_disps = resize_bilinear(
            coarse_disps, (big_h, big_w), align_corners=True
        )
        return {
            "pdf": pdf,
            "coarse_disps": coarse_disps,
            "pdf_max_full": pdf_max_full,
            "fullres_disps": fullres_disps,
        }

    # ---- stage 4e: full-resolution depth refinement ----------------------

    def refine(self, features, cnn_features, images, da_depth, coarse):
        """Upsampler + refine U-Net at full resolution (encoder_4e)."""
        b, v, hf, wf, c = features.shape
        big_h, big_w = images.shape[2:4]
        feat01 = features.reshape(b * v, hf, wf, c)

        proj_in = jnp.concatenate(
            [feat01, cnn_features.reshape(b * v, hf, wf, c)], axis=-1
        )
        up = self.upsampler_conv(proj_in)
        up = resize_bilinear(up, (big_h, big_w), align_corners=True)
        proj_feat_fullres = nn.gelu(up, approximate=False)
        proj_feature = self.proj_feature(proj_feat_fullres)

        imgs = images.reshape(b * v, big_h, big_w, 3)
        da = da_depth.reshape(b * v, big_h, big_w, 1)
        refine_in = jnp.concatenate(
            [imgs, da, proj_feature, coarse["fullres_disps"], coarse["pdf_max_full"]],
            axis=-1,
        )
        h = self.refine_conv_in(refine_in)
        h = self.refine_norm_in(h)
        h = nn.gelu(h, approximate=False)
        refine_out = self.refine_unet(h)
        return refine_out, proj_feat_fullres

    # ---- stage 4f: Gaussian heads ----------------------------------------

    def heads(self, refine_out, proj_feat_fullres, images, fullres_disps, near, far):
        """Raw Gaussians + fine disparity/density heads (encoder_4f)."""
        b, v = images.shape[:2]
        big_h, big_w = images.shape[2:4]
        imgs = images.reshape(b * v, big_h, big_w, 3)

        gau_in = jnp.concatenate(
            [refine_out.astype(imgs.dtype), imgs, proj_feat_fullres.astype(imgs.dtype)],
            axis=-1,
        )
        g = self.to_gaussians_0(gau_in)
        g = nn.gelu(g, approximate=False)
        raw_gaussians = self.to_gaussians_2(g).astype(jnp.float32)
        raw_gaussians = raw_gaussians.reshape(b, v, big_h * big_w, -1)

        dd = self.to_disparity_0(refine_out)
        dd = nn.gelu(dd, approximate=False)
        # Disparity deltas and densities in f32: depth = 1/disp amplifies
        # quantization, so the head's output precision is kept full.
        dd = self.to_disparity_2(dd).astype(jnp.float32)
        gpp = self.gaussians_per_pixel
        delta_disps, raw_densities = dd[..., :gpp], dd[..., gpp:]

        densities = nn.sigmoid(raw_densities).reshape(b, v, big_h * big_w, 1, gpp)

        lo = (1.0 / far).reshape(b * v, 1, 1, 1)
        hi = (1.0 / near).reshape(b * v, 1, 1, 1)
        fine_disps = jnp.clip(fullres_disps + delta_disps, lo, hi)
        depths = (1.0 / fine_disps).reshape(b, v, big_h * big_w, 1, gpp)
        return depths, densities, raw_gaussians

    # ---- full forward -----------------------------------------------------

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
        assert self.num_depth_candidates == c, (
            "num_depth_candidates must equal feature_channels"
        )

        with jax.named_scope("encoder_4a_prep_features"):
            prep = self.prep(
                features, intrinsics, extrinsics, near, far, dino_feature, train
            )
        with jax.named_scope("encoder_4b_cost_volume_matching"):
            corr = self.matching(prep, (hf, wf), deterministic)
        with jax.named_scope("encoder_4c_cost_volume_unet"):
            raw_corr = self.cost_unet(corr, features)
        with jax.named_scope("encoder_4d_coarse_depth"):
            coarse = self.coarse_depth(
                raw_corr, prep["disp_candidates"], (big_h, big_w)
            )
        with jax.named_scope("encoder_4e_depth_refine_unet"):
            refine_out, proj_feat_fullres = self.refine(
                features, cnn_features, images, da_depth, coarse
            )
        with jax.named_scope("encoder_4f_gaussian_head"):
            depths, densities, raw_gaussians = self.heads(
                refine_out, proj_feat_fullres, images, coarse["fullres_disps"],
                near, far,
            )

        aux = {
            "pdf": coarse["pdf"].reshape(b, v, hf, wf, self.num_depth_candidates),
            "coarse_disps": coarse["coarse_disps"].reshape(b, v, hf, wf),
            "depth_candidates": 1.0 / prep["disp_candidates"],
        }
        return depths, densities, raw_gaussians, aux
