"""Full-train-step throughput at the flagship configuration.

One step = encoder fwd (backbone + DAv2 + depth predictor) -> 131k Gaussians
-> rasterize 4 target views -> MSE + LPIPS -> full backward -> Adam update,
jitted on one chip (reference training_step, model_wrapper.py:129-183, at
per-GPU batch 1). Prints ONE JSON line: {"train_step_ms": ..., ...} —
consumed by bench.py to embed the number in the driver's benchmark record.

The LPIPS term uses random-init weights (calibrated weights are not in this
environment); identical FLOPs/memory, so the timing is representative.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import jax.numpy as jnp

from transplat_tpu.config import load_config
from transplat_tpu.dataset.loader import synthetic_batch
from transplat_tpu.loss.vgg import LPIPS
from transplat_tpu.training.schedule import make_lr_schedule
from transplat_tpu.training.step import (
    create_train_state,
    make_optimizer,
    make_train_step,
)

TUNNEL_MS = 25.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--s2d", choices=["config", "on", "off"], default="config",
                    help="override EncoderCfg.s2d_unet for A/B verification")
    ap.add_argument("--inner", type=int, default=1,
                    help=">1: chain N steps on-device inside one jit "
                    "(lax.fori_loop over the train step) so the per-dispatch "
                    "tunnel latency and its ~ms jitter amortize away — use "
                    "for A/Bs whose expected delta is inside the 1-dispatch "
                    "noise band")
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--capacity", type=int, default=None,
                    help="rasterizer worklist capacity override")
    args = ap.parse_args()

    cfg = load_config("re10k")
    if args.capacity is not None:
        import dataclasses as _dc

        cfg = _dc.replace(
            cfg,
            decoder=_dc.replace(
                cfg.decoder,
                rasterize=_dc.replace(
                    cfg.decoder.rasterize, capacity=args.capacity
                ),
            ),
        )
    if args.s2d != "config":
        import dataclasses

        cfg = dataclasses.replace(
            cfg,
            encoder=dataclasses.replace(cfg.encoder, s2d_unet=args.s2d == "on"),
        )
    h, w = cfg.dataset.image_shape
    batch = synthetic_batch(0, batch_size=1, image_shape=(h, w), num_target=4)
    device_batch = {
        "context": {k: jnp.asarray(v) for k, v in batch["context"].items() if k != "index"},
        "target": {k: jnp.asarray(v) for k, v in batch["target"].items() if k != "index"},
    }

    schedule = make_lr_schedule(cfg.optimizer.lr, cfg.trainer.max_steps)
    optimizer = make_optimizer(schedule, cfg.optimizer.gradient_clip_val)

    # Random-init LPIPS params: same compute graph as calibrated weights.
    lpips = LPIPS()
    lpips_params = jax.jit(lpips.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((1, h, w, 3)),
        jnp.zeros((1, h, w, 3)),
    )["params"]

    state = create_train_state(
        jax.random.PRNGKey(0), cfg.encoder, optimizer, batch,
        lpips_params=lpips_params,
    )
    step_fn = make_train_step(
        cfg.encoder, cfg.loss, cfg.decoder, optimizer, (h, w), donate=False,
        lr_schedule=schedule,
    )

    rng = jax.random.PRNGKey(1)

    if args.inner > 1:
        # Chained on-device steps: one dispatch runs `inner` serialized full
        # train steps (the state carry serializes them), one scalar probe
        # syncs. Removes the per-step tunnel RT entirely from the loop.
        @jax.jit
        def chained(state):
            def body(_, st):
                st, _m = step_fn(st, device_batch, rng)
                return st

            st = jax.lax.fori_loop(0, args.inner, body, state)
            leaf = jax.tree.leaves(st.params)[0]
            return jnp.ravel(leaf)[0] + st.step.astype(jnp.float32)

        float(chained(state))  # compile + warm
        t0 = time.perf_counter()
        for _ in range(args.iters):
            float(chained(state))
        dt = time.perf_counter() - t0
        ms = dt / (args.iters * args.inner) * 1e3
        ms_real = (dt - args.iters * TUNNEL_MS / 1e3) / (args.iters * args.inner) * 1e3
        print(json.dumps({
            "train_step_ms": round(ms, 1),
            "train_step_ms_real": round(ms_real, 1),
            "chained_inner": args.inner,
            "s2d": cfg.encoder.s2d_unet,
            "train_views": 4,
            "train_batch": 1,
        }))
        return

    state, metrics = step_fn(state, device_batch, rng)  # compile
    float(metrics["loss"])  # sync (block_until_ready is a tunnel no-op)

    t0 = time.perf_counter()
    for _ in range(args.iters):
        state, metrics = step_fn(state, device_batch, rng)
        float(metrics["loss"])
    ms = (time.perf_counter() - t0) / args.iters * 1e3
    print(json.dumps({
        "train_step_ms": round(ms, 1),
        "train_step_ms_real": round(ms - TUNNEL_MS, 1),
        "s2d": cfg.encoder.s2d_unet,
        "train_views": 4,
        "train_batch": 1,
    }))


if __name__ == "__main__":
    main()
