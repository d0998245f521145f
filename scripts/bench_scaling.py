"""Rays/s scaling harness: train-step throughput at dp=1/2/4/8.

Measures the full sharded training step (encoder -> camera-sharded rasterizer
-> losses -> psum'd grads) at fixed per-device batch, reporting rays/s
(= batch x target_views x H x W / step time) and scaling efficiency vs dp=1
(BASELINE north star: >=80% to 2 hosts).

On real hardware run one process per host over the pod slice; on a dev box
use virtual devices to validate the harness itself:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python scripts/bench_scaling.py --dps 1 2 4 8 --tiny
Writes outputs/scaling.json.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import jax.numpy as jnp


def run_once(dp: int, sp: int, image_shape, tiny: bool, iters: int) -> dict:
    from transplat_tpu.dataset.loader import synthetic_batch
    from transplat_tpu.loss.losses import LossCfg
    from transplat_tpu.model.decoder import DecoderCfg
    from transplat_tpu.ops.rasterizer.api import RasterizeConfig
    from transplat_tpu.parallel.mesh import make_mesh, shard_batch
    from transplat_tpu.training.schedule import make_lr_schedule
    from transplat_tpu.training.step import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    import __graft_entry__ as entry

    mesh = make_mesh(dp=dp, sp=sp, devices=jax.devices()[: dp * sp])
    cfg = entry._flagship_cfg(tiny=tiny)
    h, w = image_shape
    num_target = 2
    batch = synthetic_batch(0, batch_size=dp, image_shape=(h, w), num_target=num_target)

    optimizer = make_optimizer(make_lr_schedule(2e-4, 1000))
    state = create_train_state(jax.random.PRNGKey(0), cfg, optimizer, batch)
    rc = (
        RasterizeConfig(capacity=128, chunk=64, max_tiles_per_gaussian=8)
        if tiny
        else RasterizeConfig()
    )
    step_fn = make_train_step(
        cfg,
        LossCfg(lpips_weight=0.0),
        DecoderCfg(rasterize=rc),
        optimizer,
        (h, w),
        donate=False,
        mesh=mesh,
    )
    device_batch = shard_batch(
        {
            "context": {k: jnp.asarray(v) for k, v in batch["context"].items()},
            "target": {k: jnp.asarray(v) for k, v in batch["target"].items()},
        },
        mesh,
    )
    rng = jax.random.PRNGKey(1)
    state, metrics = step_fn(state, device_batch, rng)  # compile
    float(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step_fn(state, device_batch, rng)
    float(metrics["loss"])
    dt = (time.perf_counter() - t0) / iters
    rays = dp * num_target * h * w
    return {
        "dp": dp,
        "sp": sp,
        "step_seconds": dt,
        "rays_per_step": rays,
        "rays_per_s": rays / dt,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dps", type=int, nargs="+", default=None)
    ap.add_argument("--sp", type=int, default=1)
    ap.add_argument("--tiny", action="store_true", help="tiny model/images (CPU)")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--out", default="outputs/scaling.json")
    args = ap.parse_args()

    n = len(jax.devices())
    dps = args.dps or [d for d in (1, 2, 4, 8) if d * args.sp <= n]
    image_shape = (32, 32) if args.tiny else (256, 256)

    rows = []
    for dp in dps:
        r = run_once(dp, args.sp, image_shape, args.tiny, args.iters)
        rows.append(r)
        print(
            f"dp={dp} sp={args.sp}: {r['step_seconds'] * 1e3:.1f} ms/step, "
            f"{r['rays_per_s']:.0f} rays/s"
        )

    base = rows[0]["rays_per_s"] / rows[0]["dp"]
    for r in rows:
        r["efficiency_vs_dp1"] = (r["rays_per_s"] / r["dp"]) / base
        print(f"dp={r['dp']}: efficiency {r['efficiency_vs_dp1'] * 100:.1f}%")

    _os.makedirs(_os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(
            {"device_kind": jax.devices()[0].device_kind, "rows": rows}, f, indent=2
        )
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
