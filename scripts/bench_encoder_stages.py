"""Encoder stage attribution on the real chip (backbone / DAv2 / depth
predictor / adapter), forward and forward+backward, to aim train-step
optimization. Mirrors the reference's encoder_1..encoder_5 stage taxonomy
(/root/reference/src/model/encoder/encoder_trans.py:183-319)."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import argparse
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import jax.numpy as jnp

from transplat_tpu.config import load_config
from transplat_tpu.dataset.loader import synthetic_batch
from transplat_tpu.geometry.projection import unnormalize_intrinsics
from transplat_tpu.model.backbone.multiview import (
    BackboneMultiview,
    normalize_images,
)
from transplat_tpu.model.dav2 import DepthAnythingV2
from transplat_tpu.model.depth_predictor import DepthPredictor
from transplat_tpu.ops.interpolate import resize_bilinear
from transplat_tpu.training.schedule import make_lr_schedule
from transplat_tpu.training.step import create_train_state, make_optimizer

TUNNEL_MS = 25.0


def sync(tree):
    return float(jax.tree.leaves(tree)[0].ravel()[0])


def timeit(fn, *args, iters=10):
    sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        sync(fn(*args))
    ms = (time.perf_counter() - t0) / iters * 1e3
    return ms, ms - TUNNEL_MS


def scalarize(tree):
    return sum(jnp.sum(x**2) * 1e-6 for x in jax.tree.leaves(tree))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    cfg = load_config("re10k").encoder
    batch = synthetic_batch(0, batch_size=1, image_shape=(256, 256))
    ctx = {k: jnp.asarray(v) for k, v in batch["context"].items() if k != "index"}
    images, intrinsics, extrinsics = ctx["image"], ctx["intrinsics"], ctx["extrinsics"]
    near, far = ctx["near"], ctx["far"]
    b, v, h, w, _ = images.shape

    optimizer = make_optimizer(make_lr_schedule(2e-4, 300001))
    state = create_train_state(jax.random.PRNGKey(0), cfg, optimizer, batch)
    p, bs = state.params, state.batch_stats

    intr_px = unnormalize_intrinsics(intrinsics, (h, w))
    camk = jnp.broadcast_to(jnp.eye(4), (b, v, 4, 4)).at[..., :3, :3].set(intr_px)
    img2world = extrinsics @ jnp.linalg.inv(camk)

    backbone = BackboneMultiview(feature_channels=cfg.d_feature)
    dav2 = DepthAnythingV2(cfg.dav2_encoder)
    adapter_cfg = cfg.gaussian_adapter
    raw_channels = cfg.num_surfaces * (adapter_cfg.d_in + 2)
    dpred = DepthPredictor(
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

    def bb_vars(params):
        return {"params": params["backbone"], "batch_stats": bs.get("backbone", {})}

    def run_backbone(params, images):
        return backbone.apply(
            bb_vars(params), images, img2world,
            attn_splits=cfg.multiview_trans_attn_split, train=False,
        )

    def run_dav2(params, images):
        da_in = normalize_images(images)[..., jnp.array([2, 0, 1])]
        da_in = resize_bilinear(
            da_in.reshape(b * v, h, w, 3),
            (cfg.dav2_input_size, cfg.dav2_input_size),
            align_corners=True,
        )
        return dav2.apply({"params": params["da_model"]}, da_in)

    trans_features, cnn_features = jax.jit(run_backbone)(p, images)
    da_depth, dino_feature = jax.jit(run_dav2)(p, images)
    da_depth = resize_bilinear(da_depth[..., None], (h, w), align_corners=True)
    flat = da_depth.reshape(b * v, -1)
    lo, hi = flat.min(axis=-1, keepdims=True), flat.max(axis=-1, keepdims=True)
    da_depth = ((flat - lo) / (hi - lo + 1e-8)).reshape(b, v, h, w, 1)
    dino_feature = dino_feature.reshape(b, v, *dino_feature.shape[1:])

    def dp_vars(params):
        return {
            "params": params["depth_predictor"],
            "batch_stats": bs.get("depth_predictor", {}),
        }

    def run_dpred(params, trans_features, cnn_features):
        return dpred.apply(
            dp_vars(params), trans_features, cnn_features, images, intrinsics,
            extrinsics, near, far, da_depth, dino_feature,
            train=False, deterministic=True,
        )

    rows = [
        ("backbone fwd", *timeit(jax.jit(run_backbone), p, images, iters=args.iters)),
        (
            "backbone fwd+bwd",
            *timeit(
                jax.jit(jax.grad(lambda p_, im: scalarize(run_backbone(p_, im)))),
                p, images, iters=args.iters,
            ),
        ),
        ("dav2 fwd (frozen)", *timeit(jax.jit(run_dav2), p, images, iters=args.iters)),
        (
            "depth_pred fwd",
            *timeit(
                jax.jit(run_dpred), p, trans_features, cnn_features,
                iters=args.iters,
            ),
        ),
        (
            "depth_pred fwd+bwd",
            *timeit(
                jax.jit(
                    jax.grad(
                        lambda p_, tf, cf: scalarize(run_dpred(p_, tf, cf)[:3])
                    )
                ),
                p, trans_features, cnn_features, iters=args.iters,
            ),
        ),
    ]
    print(f"{'stage':20s} {'ms/call':>9s} {'real ms':>9s}")
    for name, ms, real in rows:
        print(f"{name:20s} {ms:9.2f} {real:9.2f}")


if __name__ == "__main__":
    main()
