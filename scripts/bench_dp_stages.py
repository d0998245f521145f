"""Depth-predictor SUB-stage attribution (4b matching / 4c cost U-Net /
4e refine U-Net / 4f heads), forward and forward+backward, with a --dtype
switch — the decisive probe for mixed-precision and MXU-shape changes.

Each sub-stage runs as its own jit over the real flagship shapes
(b=1, v=2, 64x64 features, 256^2 images) with variables passed as
arguments (HTTP 413 rule)."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import time
from functools import partial

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import jax.numpy as jnp

from transplat_tpu.config import load_config
from transplat_tpu.dataset.loader import synthetic_batch
from transplat_tpu.model.depth_predictor import DepthPredictor
from transplat_tpu.training.schedule import make_lr_schedule
from transplat_tpu.training.step import create_train_state, make_optimizer

TUNNEL_MS = 25.0


def sync(tree):
    return float(jax.tree.leaves(tree)[0].ravel()[0])


def timeit(fn, *args, iters=8):
    sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        sync(fn(*args))
    ms = (time.perf_counter() - t0) / iters * 1e3
    return ms, ms - TUNNEL_MS


def scalarize(tree):
    return sum(jnp.sum(x.astype(jnp.float32) ** 2) * 1e-6 for x in jax.tree.leaves(tree))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--dtype", choices=["f32", "bf16"], default=None,
                    help="override cfg compute dtype")
    ap.add_argument("--s2d", action="store_true",
                    help="space-to-depth refine U-Net ResBlocks (ops/s2d.py)")
    args = ap.parse_args()

    cfg = load_config("re10k").encoder
    if args.dtype is not None:
        dtype = jnp.bfloat16 if args.dtype == "bf16" else None
    else:
        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None
    print(f"compute dtype: {'bf16' if dtype is not None else 'f32'}")

    batch = synthetic_batch(0, batch_size=1, image_shape=(256, 256))
    ctx = {k: jnp.asarray(v) for k, v in batch["context"].items() if k != "index"}
    images, intrinsics, extrinsics = ctx["image"], ctx["intrinsics"], ctx["extrinsics"]
    near, far = ctx["near"], ctx["far"]
    b, v, h, w, _ = images.shape
    hf = wf = h // 4
    c = cfg.d_feature

    optimizer = make_optimizer(make_lr_schedule(2e-4, 300001))
    state = create_train_state(jax.random.PRNGKey(0), cfg, optimizer, batch)
    dp_vars = {
        "params": state.params["depth_predictor"],
        "batch_stats": state.batch_stats.get("depth_predictor", {}),
    }

    adapter_cfg = cfg.gaussian_adapter
    dp = DepthPredictor(
        feature_channels=cfg.d_feature,
        upscale_factor=cfg.downscale_factor,
        num_depth_candidates=cfg.num_depth_candidates,
        costvolume_unet_feat_dim=cfg.costvolume_unet_feat_dim,
        costvolume_unet_channel_mult=cfg.costvolume_unet_channel_mult,
        costvolume_unet_attn_res=cfg.costvolume_unet_attn_res,
        gaussian_raw_channels=cfg.num_surfaces * (adapter_cfg.d_in + 2),
        gaussians_per_pixel=cfg.gaussians_per_pixel,
        num_views=cfg.num_context_views,
        depth_unet_feat_dim=cfg.depth_unet_feat_dim,
        depth_unet_attn_res=cfg.depth_unet_attn_res,
        depth_unet_channel_mult=cfg.depth_unet_channel_mult,
        dtype=dtype,
        s2d_unet=args.s2d,
    )

    key = jax.random.PRNGKey(1)
    ks = jax.random.split(key, 4)
    features = jax.random.normal(ks[0], (b, v, hf, wf, c)) * 0.5
    cnn_features = jax.random.normal(ks[1], (b, v, hf, wf, c)) * 0.5
    da_depth = jax.random.uniform(ks[2], (b, v, h, w, 1))
    dino_feature = jax.random.normal(ks[3], (b, v, 63, 63, 64)) * 0.5

    def m(method, variables, *xs):
        return dp.apply(variables, *xs, method=method)

    prep = jax.jit(partial(m, DepthPredictor.prep))(
        dp_vars, features, intrinsics, extrinsics, near, far, dino_feature
    )
    def _matching0(variables, prep_):
        return m(DepthPredictor.matching, variables, prep_, (hf, wf))

    corr = jax.jit(_matching0)(dp_vars, prep)
    raw_corr = jax.jit(partial(m, DepthPredictor.cost_unet))(dp_vars, corr, features)
    def _coarse0(variables, rc, dc):
        return m(DepthPredictor.coarse_depth, variables, rc, dc, (h, w))

    coarse = jax.jit(_coarse0)(dp_vars, raw_corr, prep["disp_candidates"])
    refine_out, proj_full = jax.jit(partial(m, DepthPredictor.refine))(
        dp_vars, features, cnn_features, images, da_depth, coarse
    )

    def grad_of(method, out_slice=None):
        def loss(variables, *xs):
            out = m(method, variables, *xs)
            if out_slice is not None:
                out = out_slice(out)
            return scalarize(out)

        return jax.jit(jax.grad(loss))

    def matching_fn(variables, prep_):
        # hw closed over statically: a jit-arg tuple would turn the static
        # spatial shape into tracers inside the deform custom_vjp.
        return m(DepthPredictor.matching, variables, prep_, (hf, wf))

    def grad_matching(variables, prep_):
        return jax.grad(lambda v_, p_: scalarize(matching_fn(v_, p_)))(
            variables, prep_
        )

    rows = [
        ("4b matching fwd", *timeit(
            jax.jit(matching_fn), dp_vars, prep, iters=args.iters)),
        ("4b matching fwd+bwd", *timeit(
            jax.jit(grad_matching), dp_vars, prep, iters=args.iters)),
        ("4c cost_unet fwd+bwd", *timeit(
            grad_of(DepthPredictor.cost_unet), dp_vars, corr, features,
            iters=args.iters)),
        ("4e refine fwd", *timeit(
            jax.jit(partial(m, DepthPredictor.refine)), dp_vars, features,
            cnn_features, images, da_depth, coarse, iters=args.iters)),
        ("4e refine fwd+bwd", *timeit(
            grad_of(DepthPredictor.refine), dp_vars, features, cnn_features,
            images, da_depth, coarse, iters=args.iters)),
        ("4f heads fwd+bwd", *timeit(
            grad_of(DepthPredictor.heads), dp_vars, refine_out, proj_full,
            images, coarse["fullres_disps"], near, far, iters=args.iters)),
    ]
    print(f"{'stage':24s} {'ms/call':>9s} {'real ms':>9s}")
    for name, ms, real in rows:
        print(f"{name:24s} {ms:9.2f} {real:9.2f}")


if __name__ == "__main__":
    main()
