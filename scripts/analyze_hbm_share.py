"""Per-phase HBM-traffic share table from a stage_profile.json.

TPU analog of the fork's DDR-traffic attribution
(/root/reference/scripts/analyze_hbm_traffic.py + profile_hbm_by_stage.py,
parsed from nsys sqlite / ncu DRAM counters): here the per-stage bytes come
from XLA's compiled cost analysis ("bytes accessed" = operand+output bytes of
every fused computation ~= HBM traffic; no bus counters exist behind the axon
tunnel), grouped into the same 4 phases as generate_phase_summary.py.

The fork's headline claim this reproduces on TPU terms: depth-search
(Depth Prediction phase) dominates memory traffic — ">65% of DDR traffic"
on Jetson Orin NX (/root/reference/draft/Challenge.md:7-9).

Usage:
  python scripts/analyze_hbm_share.py outputs/stage_profile.json \
      [--out hbm_share.json]
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json

from analyze_phase_summary import PHASES


def summarize(profile: dict) -> dict:
    rows = {r["stage"]: r for r in profile["rows"]}
    phases = {}
    for phase, stages in PHASES.items():
        gb = sum(rows[s]["gb_accessed"] for s in stages if s in rows)
        ms = sum(rows[s]["real_ms"] for s in stages if s in rows)
        phases[phase] = {"gb_accessed": gb, "real_ms": ms}
    total_gb = sum(p["gb_accessed"] for p in phases.values()) or 1.0
    for phase, p in phases.items():
        p["hbm_share"] = p["gb_accessed"] / total_gb
        p["gb_per_s"] = (
            p["gb_accessed"] / (p["real_ms"] / 1e3) if p["real_ms"] >= 0.5 else 0.0
        )
    return {
        "phases": phases,
        "total_gb_accessed": total_gb,
        "per_stage": {
            s: {
                "gb_accessed": r["gb_accessed"],
                "hbm_share": r["gb_accessed"] / total_gb,
                "gb_per_s": r["gb_per_s"],
            }
            for s, r in rows.items()
        },
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("stage_profile_json")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    with open(args.stage_profile_json) as f:
        profile = json.load(f)
    result = summarize(profile)

    print(f"{'phase':<22}{'GB moved':>10}{'share':>8}{'GB/s':>9}")
    for phase, p in result["phases"].items():
        print(
            f"{phase:<22}{p['gb_accessed']:>10.3f}{p['hbm_share']:>7.1%}"
            f"{p['gb_per_s']:>9.1f}"
        )
    print(f"{'total':<22}{result['total_gb_accessed']:>10.3f}")
    dp = result["phases"].get("Depth Prediction", {}).get("hbm_share", 0.0)
    print(
        f"\nDepth Prediction share of HBM traffic: {dp:.1%} "
        "(fork's Jetson DDR claim: >65%, draft/Challenge.md:7-9)"
    )
    print(f"\n{'stage':<34}{'GB moved':>10}{'share':>8}")
    for s, r in result["per_stage"].items():
        print(f"{s:<34}{r['gb_accessed']:>10.3f}{r['hbm_share']:>7.1%}")

    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
