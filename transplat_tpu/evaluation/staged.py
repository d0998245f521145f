"""Stage-resolved encoder execution for profiling parity.

The reference times every encoder stage with explicit CUDA sync fences
(encoder_trans.py:183-319, depth_predictor_trans.py:309-491; canonical order
model_wrapper.py:381-395). Under one fused jit that is impossible, so this
module re-drives the SAME flax modules (identical param subtrees from the
full encoder variables) as separately-jitted stage functions with
block_until_ready fences between — giving the reference's
encoder_1..encoder_4f..encoder_5 wall-clock taxonomy on TPU.

Consistency with the fused encoder is pinned by
tests/test_analysis.py::test_staged_encoder_matches_fused.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..model.adapter import adapt_gaussians
from ..model.backbone.multiview import BackboneMultiview, normalize_images
from ..model.dav2 import DepthAnythingV2
from ..model.depth_predictor import DepthPredictor
from ..model.encoder import EncoderCfg, map_pdf_to_opacity
from ..model.types import Gaussians
from ..ops.interpolate import resize_bilinear
from ..geometry.projection import sample_image_grid, unnormalize_intrinsics

STAGES = [
    "encoder_1_prep_intrinsics",
    "encoder_2_backbone",
    "encoder_3_depth_anything",
    "encoder_4a_prep_features",
    "encoder_4b_cost_volume_matching",
    "encoder_4c_cost_volume_unet",
    "encoder_4d_coarse_depth",
    "encoder_4e_depth_refine_unet",
    "encoder_4f_gaussian_head",
    "encoder_5_gaussian_adapter",
]


class StagedEncoder:
    """Stage-by-stage encoder driver over the full encoder variables."""

    def __init__(self, cfg: EncoderCfg, variables: dict):
        self.cfg = cfg
        params = variables["params"]
        stats = variables.get("batch_stats", {})
        self.backbone_vars = {
            "params": params["backbone"],
            "batch_stats": stats.get("backbone", {}),
        }
        self.dav2_vars = {"params": params["da_model"]}
        self.dp_vars = {
            "params": params["depth_predictor"],
            "batch_stats": stats.get("depth_predictor", {}),
        }
        self.backbone = BackboneMultiview(feature_channels=cfg.d_feature)
        self.dav2 = DepthAnythingV2(cfg.dav2_encoder)
        raw_channels = cfg.num_surfaces * (cfg.gaussian_adapter.d_in + 2)
        self.dp = DepthPredictor(
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
            dtype=jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None,
        )
        self._jit_cache: dict = {}

    def _jit(self, name, fn):
        if name not in self._jit_cache:
            def probed(*args, _fn=fn):
                out = _fn(*args)
                # A scalar probe computed ON DEVICE: float(probe) is the only
                # reliable sync on remote backends where block_until_ready is
                # a no-op, and transfers 4 bytes instead of a stage output.
                leaf = jax.tree.leaves(out)[0]
                return out, jnp.ravel(leaf)[0].astype(jnp.float32)

            jitted = jax.jit(probed)
            holder = {"jitted": jitted, "args": None}

            def wrapper(*args, _holder=holder):
                _holder["args"] = args
                return _holder["jitted"](*args)

            self._jit_cache[name] = holder
            holder["call"] = wrapper
        return self._jit_cache[name]["call"]

    def cost_analysis(self) -> dict:
        """Per-stage XLA cost analysis (bytes accessed ~= HBM traffic, flops)
        from the compiled stage modules — the nsys/ncu-replacement numbers
        used by scripts/profile_stages.py. Call after at least one run()."""
        out = {}
        for name, holder in self._jit_cache.items():
            if holder["args"] is None:
                continue
            try:
                compiled = holder["jitted"].lower(*holder["args"]).compile()
                out[name] = compiled.cost_analysis() or {}
            except Exception:  # pragma: no cover - backend-dependent
                out[name] = {}
        return out

    def memory_analysis(self) -> dict:
        """Per-stage XLA static memory breakdown (argument/output/temp bytes
        per compiled stage executable) — the compile-time side of the
        reference's memory_stats.json (model_wrapper.py:427-515)."""
        from ..utils.benchmarker import compiled_memory_analysis

        out = {}
        for name, holder in self._jit_cache.items():
            if holder["args"] is None:
                continue
            try:
                compiled = holder["jitted"].lower(*holder["args"]).compile()
                out[name] = compiled_memory_analysis(compiled)
            except Exception:  # pragma: no cover - backend-dependent
                out[name] = {}
        return out

    def _dp_method(self, method, dp_vars, *args):
        # Variables arrive as jit ARGUMENTS: closing over them would bake
        # ~100 MB of weights into the serialized HLO as constants (the
        # remote-compile tunnel rejects such modules with HTTP 413).
        return self.dp.apply(dp_vars, *args, method=method)

    def run(self, ctx: dict, benchmarker=None, global_step: int = 0):
        """Run the encoder stage-by-stage; time into `benchmarker` if given.
        Returns (gaussians, aux)."""
        from contextlib import nullcontext

        cfg = self.cfg
        images = jnp.asarray(ctx["image"])
        intrinsics = jnp.asarray(ctx["intrinsics"])
        extrinsics = jnp.asarray(ctx["extrinsics"])
        near = jnp.asarray(ctx["near"])
        far = jnp.asarray(ctx["far"])
        b, v, h, w, _ = images.shape

        def bench(tag):
            if benchmarker is None:
                return nullcontext()
            from contextlib import ExitStack

            stack = ExitStack()
            stack.enter_context(benchmarker.memory(tag))
            stack.enter_context(benchmarker.time(tag))
            return stack

        def block(x):
            out, probe = x
            float(probe)  # host transfer: the only reliable remote sync
            return out

        with bench("encoder_1_prep_intrinsics"):

            def prep_intr(intrinsics, extrinsics):
                intr_px = unnormalize_intrinsics(intrinsics, (h, w))
                camk = (
                    jnp.broadcast_to(jnp.eye(4), (b, v, 4, 4))
                    .at[..., :3, :3]
                    .set(intr_px)
                )
                return extrinsics @ jnp.linalg.inv(camk)

            img2world = block(self._jit("prep_intr", prep_intr)(intrinsics, extrinsics))

        with bench("encoder_2_backbone"):

            def run_backbone(bvars, images, img2world):
                return self.backbone.apply(
                    bvars, images, img2world,
                    attn_splits=cfg.multiview_trans_attn_split, train=False,
                )

            trans_features, cnn_features = block(
                self._jit("backbone", run_backbone)(
                    self.backbone_vars, images, img2world
                )
            )

        with bench("encoder_3_depth_anything"):

            def run_dav2(dvars, images):
                da_in = normalize_images(images)[..., jnp.array([2, 0, 1])]
                da_in = resize_bilinear(
                    da_in.reshape(b * v, h, w, 3),
                    (cfg.dav2_input_size, cfg.dav2_input_size),
                    align_corners=True,
                )
                da_depth, dino_feature = self.dav2.apply(dvars, da_in)
                da_depth = resize_bilinear(
                    da_depth[..., None], (h, w), align_corners=True
                )
                flat = da_depth.reshape(b * v, -1)
                lo = flat.min(axis=-1, keepdims=True)
                hi = flat.max(axis=-1, keepdims=True)
                da_depth = ((flat - lo) / (hi - lo + 1e-8)).reshape(b, v, h, w, 1)
                return da_depth, dino_feature.reshape(b, v, *dino_feature.shape[1:])

            da_depth, dino_feature = block(
                self._jit("dav2", run_dav2)(self.dav2_vars, images)
            )

        with bench("encoder_4a_prep_features"):
            prep = block(
                self._jit(
                    "dp_prep",
                    partial(self._dp_method, DepthPredictor.prep),
                )(self.dp_vars, trans_features, intrinsics, extrinsics, near,
                  far, dino_feature)
            )
        with bench("encoder_4b_cost_volume_matching"):
            hf, wf = trans_features.shape[2:4]
            corr = block(
                self._jit(
                    "dp_matching",
                    lambda dpv, prep: self._dp_method(
                        DepthPredictor.matching, dpv, prep, (hf, wf)
                    ),
                )(self.dp_vars, prep)
            )
        with bench("encoder_4c_cost_volume_unet"):
            raw_corr = block(
                self._jit(
                    "dp_cost_unet",
                    partial(self._dp_method, DepthPredictor.cost_unet),
                )(self.dp_vars, corr, trans_features)
            )
        with bench("encoder_4d_coarse_depth"):
            coarse = block(
                self._jit(
                    "dp_coarse",
                    lambda dpv, rc, dc: self._dp_method(
                        DepthPredictor.coarse_depth, dpv, rc, dc, (h, w)
                    ),
                )(self.dp_vars, raw_corr, prep["disp_candidates"])
            )
        with bench("encoder_4e_depth_refine_unet"):
            refine_out, proj_feat_fullres = block(
                self._jit(
                    "dp_refine",
                    partial(self._dp_method, DepthPredictor.refine),
                )(self.dp_vars, trans_features, cnn_features, images, da_depth,
                  coarse)
            )
        with bench("encoder_4f_gaussian_head"):
            depths, densities, raw_gaussians = block(
                self._jit(
                    "dp_heads",
                    partial(self._dp_method, DepthPredictor.heads),
                )(
                    self.dp_vars, refine_out, proj_feat_fullres, images,
                    coarse["fullres_disps"], near, far,
                )
            )

        with bench("encoder_5_gaussian_adapter"):

            def run_adapter(raw_gaussians, densities, depths, extrinsics, intrinsics):
                r = h * w
                xy, _ = sample_image_grid((h, w))
                xy = xy.reshape(1, 1, r, 2)
                raw = raw_gaussians.reshape(b, v, r, cfg.num_surfaces, -1)[:, :, :, 0, :]
                offset_xy = jax.nn.sigmoid(raw[..., :2])
                pixel_size = jnp.asarray([1.0 / w, 1.0 / h], raw.dtype)
                coords = xy + (offset_xy - 0.5) * pixel_size
                opacities = (
                    map_pdf_to_opacity(
                        densities[..., 0, 0], cfg.opacity_mapping,
                        jnp.asarray(global_step),
                    )
                    / cfg.gaussians_per_pixel
                )
                out = adapt_gaussians(
                    cfg.gaussian_adapter, extrinsics, intrinsics, coords,
                    depths[..., 0, 0], opacities, raw[..., 2:], (h, w),
                )
                return Gaussians(
                    means=out["means"].reshape(b, v * r, 3),
                    covariances=out["covariances"].reshape(b, v * r, 3, 3),
                    harmonics=out["harmonics"].reshape(
                        b, v * r, 3, cfg.gaussian_adapter.d_sh
                    ),
                    opacities=out["opacities"].reshape(b, v * r),
                )

            gaussians = block(
                self._jit("adapter", run_adapter)(
                    raw_gaussians, densities, depths, extrinsics, intrinsics
                )
            )

        aux = {
            "pdf": coarse["pdf"],
            "depth_candidates": 1.0 / prep["disp_candidates"],
            "depths": depths,
        }
        return gaussians, aux
