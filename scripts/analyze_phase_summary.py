"""4-phase timing summary from an evaluation benchmark.json.

TPU port of /root/reference/scripts/generate_phase_summary.py (transplat
mapping): groups the stage taxonomy recorded by the evaluator
(test.stage_timing=true) into the fork's four phases and prints / dumps the
same summary table.

Usage: python scripts/analyze_phase_summary.py outputs/test/benchmark.json
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json

PHASES = {
    "Feature Extraction": [
        "encoder_1_prep_intrinsics",
        "encoder_2_backbone",
    ],
    "Depth Prediction": [
        "encoder_3_depth_anything",
        "encoder_4a_prep_features",
        "encoder_4b_cost_volume_matching",
        "encoder_4c_cost_volume_unet",
        "encoder_4d_coarse_depth",
        "encoder_4e_depth_refine_unet",
    ],
    "Gaussian Generation": [
        "encoder_4f_gaussian_head",
        "encoder_5_gaussian_adapter",
    ],
    "Decoder": [
        "decoder",
    ],
}


def summarize(benchmark: dict) -> dict:
    if "rows" in benchmark:  # scripts/profile_stages.py output
        summary = {r["stage"]: r for r in benchmark["rows"]}
    else:
        summary = benchmark["summary"] if "summary" in benchmark else benchmark
    phases = {}
    for phase, stages in PHASES.items():
        ms = sum(summary[s]["mean_ms"] for s in stages if s in summary)
        phases[phase] = ms
    total = sum(phases.values()) or 1.0
    return {
        phase: {"mean_ms": ms, "share": ms / total} for phase, ms in phases.items()
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("benchmark_json")
    ap.add_argument("--out", default=None, help="optional JSON output path")
    args = ap.parse_args()

    with open(args.benchmark_json) as f:
        benchmark = json.load(f)
    phases = summarize(benchmark)

    print(f"{'phase':<24}{'mean ms':>12}{'share':>9}")
    for phase, row in phases.items():
        print(f"{phase:<24}{row['mean_ms']:>12.2f}{row['share'] * 100:>8.1f}%")
    if args.out:
        with open(args.out, "w") as f:
            json.dump(phases, f, indent=2)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
