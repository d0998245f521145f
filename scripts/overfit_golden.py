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
scale, and recorded on-chip under artifacts/): the MEDIAN of the last 5 PSNR
evals clears --min-psnr. Median-of-last-k (not the single final step) because
two round-4 same-seed runs diverged after step ~175 (recompilation changes
fp reassociation; optimization chaotically amplifies 1-ulp deltas) and one
collapsed 20.2 -> 17.0 dB in its last 24 steps at constant lr 4e-4 — a
single-step gate is noise. The lr now cosine-decays over the run (constant
lr near convergence was collapse suspect #1); --no-cosine restores the old
behavior. Round-5 root cause of BOTH effects: worklist-capacity gradient
starvation (see config.py re10k decoder comment) — at the old capacity 1024
the optimization bifurcates (22.8 or 15.5 dB at step 500 depending on
compilation roundings); at the shipped 4096 it is stable at 36.7 dB with
zero drops. Calibration on v5e, cosine lr 4e-4, 500 steps: cap 1024 -> 22.8,
2048 -> 31.7, 4096 -> 36.7 dB (artifacts/testsuite_r5/run_cap*.json; lr 1e-3
DIVERGES to ~9.9 dB). Each step ~0.33-0.4 s on one chip.
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
    ap.add_argument("--capacity", type=int, default=None,
                    help="rasterizer worklist capacity override (default: "
                    "RasterizeConfig default, 1024) — for quantifying "
                    "capacity-drop effect on TRAINING, not just rendering")
    ap.add_argument("--no-cosine", action="store_true",
                    help="constant lr (round-4 behavior; collapse-prone tail)")
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

    import dataclasses

    cfg = load_config("re10k")
    if args.capacity is not None:
        cfg = dataclasses.replace(
            cfg,
            decoder=dataclasses.replace(
                cfg.decoder,
                rasterize=dataclasses.replace(
                    cfg.decoder.rasterize, capacity=args.capacity
                ),
            ),
        )
    shape = (args.size, args.size)
    batch = golden_scene_batch(image_shape=shape)
    device_batch = {
        "context": {k: jnp.asarray(v) for k, v in batch["context"].items() if k != "index"},
        "target": {k: jnp.asarray(v) for k, v in batch["target"].items() if k != "index"},
    }

    # 1-step warmup (overfitting, not training); cosine decay by default so
    # the tail is not sitting at full lr when converged (round-4 collapse).
    schedule = make_lr_schedule(
        args.lr, args.steps, cosine=not args.no_cosine, warm_up_steps=1
    )
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
        # Dense evals over the last 25 steps feed the median-of-last-5 gate.
        if i % 25 == 0 or i >= args.steps - 25 and i % 5 == 4 or i == args.steps - 1:
            psnr = float(metrics["psnr"])
            curve.append({"step": i, "psnr": round(psnr, 3),
                          "loss": round(float(metrics["loss"]), 5),
                          "overflow": int(metrics["render_overflow"])})
            print(f"step {i:4d}: psnr {psnr:6.2f} loss {float(metrics['loss']):.5f} "
                  f"overflow {int(metrics['render_overflow'])}", flush=True)
    wall = time.perf_counter() - t0

    final = curve[-1]["psnr"]
    last5 = sorted(c["psnr"] for c in curve[-5:])
    gate_psnr = last5[len(last5) // 2]
    record = {
        "steps": args.steps,
        "size": args.size,
        "capacity": args.capacity,
        "cosine": not args.no_cosine,
        "final_psnr": final,
        "gate_psnr_median_last5": gate_psnr,
        "wall_s": round(wall, 1),
        "curve": curve,
        "passed": gate_psnr >= args.min_psnr,
    }
    _os.makedirs(_os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(record, f, indent=2)
    print(json.dumps({k: record[k] for k in (
        "final_psnr", "gate_psnr_median_last5", "wall_s", "passed")}))
    if not record["passed"]:
        raise SystemExit(
            f"FAIL: median-of-last-5 PSNR {gate_psnr:.2f} < {args.min_psnr}"
        )


if __name__ == "__main__":
    main()
