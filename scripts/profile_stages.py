"""Per-stage time / HBM-traffic / FLOP profile of the encoder + decoder.

TPU replacement for the reference's nsys/ncu flows
(/root/reference/scripts/profile_hbm_by_stage.py, analyze_hbm_traffic.py,
analyze_cache_efficiency.py): each stage runs as its own jitted function
(evaluation/staged.py) and its compiled module reports XLA cost analysis —
bytes accessed (HBM traffic) and FLOPs — which together with measured wall
time give achieved bandwidth and compute throughput per stage, the same
table the fork derives from ncu DRAM counters.

Usage (real chip or CPU):
  python scripts/profile_stages.py [--tiny] [--iters 5]
Writes outputs/stage_profile.json and prints the table.
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--out", default="outputs/stage_profile.json")
    args = ap.parse_args()

    from transplat_tpu.dataset.loader import synthetic_batch
    from transplat_tpu.evaluation.staged import StagedEncoder
    from transplat_tpu.model.decoder import DecoderCfg, decode_splatting
    from transplat_tpu.model.encoder import EncoderTranSplat
    from transplat_tpu.ops.rasterizer.api import RasterizeConfig
    from transplat_tpu.utils.benchmarker import Benchmarker

    import __graft_entry__ as entry

    cfg = entry._flagship_cfg(tiny=args.tiny)
    shape = (32, 32) if args.tiny else (256, 256)
    batch = synthetic_batch(0, batch_size=1, image_shape=shape, num_target=2)
    ctx = {k: jnp.asarray(v) for k, v in batch["context"].items()}
    tgt = {k: jnp.asarray(v) for k, v in batch["target"].items()}

    model = EncoderTranSplat(cfg)
    variables = jax.jit(
        lambda: model.init(
            jax.random.PRNGKey(0), ctx["image"], ctx["intrinsics"],
            ctx["extrinsics"], ctx["near"], ctx["far"],
        )
    )()
    staged = StagedEncoder(cfg, variables)

    bench = Benchmarker()
    gaussians = None
    for _ in range(args.iters + 1):  # first iteration compiles
        gaussians, _ = staged.run(ctx, benchmarker=bench)

    rc = (
        RasterizeConfig(capacity=128, chunk=64, max_tiles_per_gaussian=8)
        if args.tiny
        else RasterizeConfig()
    )

    def run_decoder(gaussians):
        color = decode_splatting(
            gaussians, tgt["extrinsics"], tgt["intrinsics"], tgt["near"],
            tgt["far"], shape, cfg=DecoderCfg(rasterize=rc),
        ).color
        return color, jnp.ravel(color)[0]  # scalar probe: remote-safe sync

    dec = jax.jit(run_decoder)
    float(dec(gaussians)[1])
    for _ in range(args.iters):
        with bench.time("decoder"):
            float(dec(gaussians)[1])

    # XLA cost analysis per compiled stage: bytes accessed ~= HBM traffic
    # (XLA counts operand + output bytes of each fused computation), flops.
    costs = staged.cost_analysis()
    try:
        costs["decoder"] = jax.jit(run_decoder).lower(gaussians).compile().cost_analysis() or {}
    except Exception:
        costs["decoder"] = {}

    summary = bench.summarize(skip_first=1)
    stage_to_jit = {
        "encoder_1_prep_intrinsics": "prep_intr",
        "encoder_2_backbone": "backbone",
        "encoder_3_depth_anything": "dav2",
        "encoder_4a_prep_features": "dp_prep",
        "encoder_4b_cost_volume_matching": "dp_matching",
        "encoder_4c_cost_volume_unet": "dp_cost_unet",
        "encoder_4d_coarse_depth": "dp_coarse",
        "encoder_4e_depth_refine_unet": "dp_refine",
        "encoder_4f_gaussian_head": "dp_heads",
        "encoder_5_gaussian_adapter": "adapter",
        "decoder": "decoder",
    }

    # jax's public path for cost analysis: trace + lower + compile explicitly.
    def cost_of(jitted_name):
        return costs.get(jitted_name) or {}

    # Each stage's wall time includes one sync round-trip over the axon
    # tunnel (~25 ms); "real" subtracts it, and the bandwidth/throughput
    # columns use real time. On a locally-attached chip real == mean - ~0.
    tunnel_ms = 25.0 if jax.default_backend() != "cpu" else 0.0
    rows = []
    print(
        f"{'stage':<34}{'mean ms':>10}{'real ms':>9}{'GB moved':>10}"
        f"{'GB/s':>9}{'GFLOP':>9}{'GFLOP/s':>10}"
    )
    for stage, jit_name in stage_to_jit.items():
        if stage not in summary:
            continue
        ms = summary[stage]["mean_ms"]
        real = max(ms - tunnel_ms, 0.0)
        c = cost_of(jit_name)
        gb = float(c.get("bytes accessed", 0.0)) / 1e9
        gflop = float(c.get("flops", 0.0)) / 1e9
        # Stages faster than the tunnel's timing resolution (~2 ms jitter)
        # cannot support a rate estimate.
        resolvable = real >= 0.5
        gbps = gb / (real / 1e3) if resolvable else 0.0
        gfps = gflop / (real / 1e3) if resolvable else 0.0
        rows.append(
            {
                "stage": stage,
                "mean_ms": ms,
                "real_ms": real,
                "gb_accessed": gb,
                "gb_per_s": gbps,
                "gflop": gflop,
                "gflop_per_s": gfps,
            }
        )
        rate = (
            f"{gbps:>9.1f}{gflop:>9.2f}{gfps:>10.1f}"
            if resolvable
            else f"{'--':>9}{gflop:>9.2f}{'--':>10}"
        )
        print(f"{stage:<34}{ms:>10.2f}{real:>9.2f}{gb:>10.3f}" + rate)
    print(
        "NOTE: over the axon dev tunnel, device execution shorter than the "
        "~25 ms dispatch RPC hides inside it — per-stage 'real' times below "
        "that are a FLOOR, not a measurement (rates suppressed < 0.5 ms). "
        "On a locally-attached chip the same script resolves true times; "
        "scripts/bench_train_stages.py times coarser sub-graphs that clear "
        "the floor."
    )

    _os.makedirs(_os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({"device": jax.devices()[0].device_kind, "rows": rows}, f, indent=2)
    print(f"wrote {args.out}")

    # Device peak-memory observability (the reference dumps peak_memory.json /
    # memory_stats.json per stage, src/misc/benchmarker.py:66-116 and
    # model_wrapper.py:427-515): runtime allocator peaks per stage + XLA's
    # static per-executable breakdown.
    mem_out = _os.path.join(_os.path.dirname(args.out) or ".", "peak_memory.json")
    bench.dump_memory(mem_out, extra={"compiled": staged.memory_analysis()})
    stages_with_mem = sum(1 for v in bench.memory_stats.values() if v)
    print(f"wrote {mem_out} ({stages_with_mem} stages with runtime stats)")


if __name__ == "__main__":
    main()
