"""Device-trace attribution of ONE full train step (xprof, on-chip).

Same machinery as trace_rasterizer.py (parse the xplane trace.json into a
per-HLO-op table), pointed at the flagship train step: encoder fwd -> render
-> MSE+LPIPS -> backward -> Adam. The tf_op/source fields group ops by model
stage, which per-stage jit timing can't do inside ONE compiled step (XLA
fuses across stage boundaries).

Usage:  python scripts/trace_train_step.py [--out-dir outputs/train_trace]
Writes <out-dir>/attribution.{txt,json} + a tf_op-grouped table.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))

import argparse
import collections
import json
import os

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import jax.numpy as jnp

from trace_rasterizer import parse_trace, attribute


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out-dir", default="outputs/train_trace")
    ap.add_argument("--s2d", choices=["config", "on", "off"], default="config")
    args = ap.parse_args()

    from transplat_tpu.config import load_config
    from transplat_tpu.dataset.loader import synthetic_batch
    from transplat_tpu.loss.vgg import LPIPS
    from transplat_tpu.training.schedule import make_lr_schedule
    from transplat_tpu.training.step import (
        create_train_state, make_optimizer, make_train_step,
    )

    cfg = load_config("re10k")
    if args.s2d != "config":
        import dataclasses

        cfg = dataclasses.replace(
            cfg,
            encoder=dataclasses.replace(cfg.encoder, s2d_unet=args.s2d == "on"),
        )
    h, w = cfg.dataset.image_shape
    batch = synthetic_batch(0, batch_size=1, image_shape=(h, w), num_target=4)
    device_batch = {
        "context": {k: jnp.asarray(v) for k, v in batch["context"].items()
                    if k != "index"},
        "target": {k: jnp.asarray(v) for k, v in batch["target"].items()
                   if k != "index"},
    }
    schedule = make_lr_schedule(cfg.optimizer.lr, cfg.trainer.max_steps)
    optimizer = make_optimizer(schedule, cfg.optimizer.gradient_clip_val)
    lpips = LPIPS()
    lpips_params = jax.jit(lpips.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3)), jnp.zeros((1, h, w, 3))
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
    state, metrics = step_fn(state, device_batch, rng)  # compile + warm
    float(metrics["loss"])

    os.makedirs(args.out_dir, exist_ok=True)
    tdir = os.path.join(args.out_dir, "trace_step")
    with jax.profiler.trace(tdir):
        _st, metrics = step_fn(state, device_batch, rng)
        float(metrics["loss"])

    parsed = parse_trace(tdir)
    att = attribute(parsed)

    # Additionally group by tf_op prefix (model-module attribution); ops
    # without tf_op (layout copies etc.) fall back to their source line.
    ops = parsed["ops"]
    by_group = collections.defaultdict(lambda: {"us": 0.0, "count": 0})
    for e in ops:
        tf_op = e["args"].get("tf_op", "")
        parts = [p for p in tf_op.split("/") if p and not p.startswith("jit(")]
        key = "/".join(parts[:5]) if parts else (
            "<copy/fmt> " + e["args"].get("source", "?")
        )
        by_group[key]["us"] += e["dur"]
        by_group[key]["count"] += 1

    lines = [
        f"train step device span {att['span_us']:.0f} us, ops "
        f"{att['total_op_us']:.0f} us, idle {att['idle_us']:.0f} us "
        f"({att['idle_us'] / max(att['span_us'], 1e-9):.0%}); s2d="
        f"{cfg.encoder.s2d_unet}",
        "",
        f"{'op [category]':<46}{'us':>9}{'n':>5}{'GB':>8}{'GB/s':>8}{'GFLOP/s':>9}",
    ]
    for op, r in list(att["rows"].items())[:30]:
        gb = r["bytes"] / 1e9
        gbps = gb / (r["us"] / 1e6) if r["us"] > 0 else 0.0
        gfps = r["flops"] / 1e9 / (r["us"] / 1e6) if r["us"] > 0 else 0.0
        lines.append(
            f"{op[:45]:<46}{r['us']:>9.1f}{r['count']:>5}{gb:>8.3f}"
            f"{gbps:>8.1f}{gfps:>9.1f}"
        )
    lines.append("")
    lines.append(f"{'module (tf_op prefix)':<56}{'us':>10}{'n':>6}")
    for key, r in sorted(by_group.items(), key=lambda kv: -kv[1]["us"])[:40]:
        lines.append(f"{key[:55]:<56}{r['us']:>10.1f}{r['count']:>6}")

    text = "\n".join(lines)
    print(text)
    with open(os.path.join(args.out_dir, "attribution.txt"), "w") as f:
        f.write(text + "\n")
    with open(os.path.join(args.out_dir, "attribution.json"), "w") as f:
        json.dump({"summary": att, "by_module": by_group}, f, indent=2, default=dict)


if __name__ == "__main__":
    main()
