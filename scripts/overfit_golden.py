"""Golden-scene overfit regression gate.

Overfits the full model on ONE parallax-consistent synthetic scene (textured
planes at mixed depths, dataset/loader.py golden_scene_batch) and tracks the
target-view PSNR curve. This is the structured stand-in for the blocked
real-checkpoint quality gate (BASELINE.md:22-25 — no dataset/weights in this
environment): a model + rasterizer + optimizer stack that cannot drive a
4-plane scene to high PSNR cannot reproduce the reference's RE10K numbers
either.

Usage:
  python scripts/overfit_golden.py [--steps 2000] [--size 256] [--out FILE]

Gate (asserted by tests/test_training.py::test_golden_overfit_cpu at reduced
scale, and recorded on-chip under artifacts/): PSNR rises monotonically-ish
and clears --min-psnr. Calibrated on v5e: lr 4e-4 / 2000 steps reaches
25.0 dB (10.9 -> 15.6@75 -> 21.5@500 -> 25.0@2000; lr 1e-3 DIVERGES —
collapses to ~9.9 dB). Each step ~0.33 s on one chip.
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
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--lr", type=float, default=4e-4)
    ap.add_argument("--min-psnr", type=float, default=25.0)
    ap.add_argument("--out", default="outputs/overfit_golden.json")
    args = ap.parse_args()

    from transplat_tpu.config import load_config
    from transplat_tpu.dataset.loader import golden_scene_batch
    from transplat_tpu.training.schedule import make_lr_schedule
    from transplat_tpu.training.step import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    cfg = load_config("re10k")
    shape = (args.size, args.size)
    batch = golden_scene_batch(image_shape=shape)
    device_batch = {
        "context": {k: jnp.asarray(v) for k, v in batch["context"].items() if k != "index"},
        "target": {k: jnp.asarray(v) for k, v in batch["target"].items() if k != "index"},
    }

    # Effectively constant LR (1-step warmup): overfitting, not training.
    schedule = make_lr_schedule(args.lr, args.steps, cosine=False, warm_up_steps=1)
    optimizer = make_optimizer(schedule, cfg.optimizer.gradient_clip_val)
    state = create_train_state(
        jax.random.PRNGKey(0), cfg.encoder, optimizer, batch
    )
    step_fn = make_train_step(
        cfg.encoder, cfg.loss, cfg.decoder, optimizer, shape, donate=False
    )

    rng = jax.random.PRNGKey(1)
    curve = []
    t0 = time.perf_counter()
    for i in range(args.steps):
        state, metrics = step_fn(state, device_batch, rng)
        if i % 25 == 0 or i == args.steps - 1:
            psnr = float(metrics["psnr"])
            curve.append({"step": i, "psnr": round(psnr, 3),
                          "loss": round(float(metrics["loss"]), 5),
                          "overflow": int(metrics["render_overflow"])})
            print(f"step {i:4d}: psnr {psnr:6.2f} loss {float(metrics['loss']):.5f} "
                  f"overflow {int(metrics['render_overflow'])}", flush=True)
    wall = time.perf_counter() - t0

    final = curve[-1]["psnr"]
    record = {
        "steps": args.steps,
        "size": args.size,
        "final_psnr": final,
        "wall_s": round(wall, 1),
        "curve": curve,
        "passed": final >= args.min_psnr,
    }
    _os.makedirs(_os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(record, f, indent=2)
    print(json.dumps({k: record[k] for k in ("final_psnr", "wall_s", "passed")}))
    if not record["passed"]:
        raise SystemExit(f"FAIL: final PSNR {final:.2f} < {args.min_psnr}")


if __name__ == "__main__":
    main()
