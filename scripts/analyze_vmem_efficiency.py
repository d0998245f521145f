#!/usr/bin/env python3
"""VMEM working-set / HBM-traffic efficiency analysis (TPU-native).

Counterpart of the reference's /root/reference/scripts/analyze_cache_efficiency.py
(L2-cache hit-rate estimation for the irregular grid_sample gathers of the
deformable attention). On TPU there is no hardware cache between HBM and the
compute units — the analysis becomes: does the working set of each
depth-predictor stage fit VMEM, and how much HBM traffic does the chosen
formulation cost vs (a) the theoretical minimum and (b) the gather-based
formulation the reference uses?

The punchline the numbers make: the reference loses ~97% of every 128 B cache
line to 4 B irregular samples; the MXU separable one-hot reformulation
(transplat_tpu/ops/deform.py) reads each feature map exactly once, dense.
"""

import argparse


def fmt(b):
    return f"{b / 1e6:8.2f} MB"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--views", type=int, default=2)
    ap.add_argument("--channels", type=int, default=128)
    ap.add_argument("--hw", type=int, default=64, help="query grid side")
    ap.add_argument("--depths", type=int, default=128)
    ap.add_argument("--points", type=int, default=4, help="deform points/depth")
    ap.add_argument("--vmem-mb", type=float, default=16.0)
    ap.add_argument("--hbm-gbps", type=float, default=819.0, help="v5e HBM BW")
    args = ap.parse_args()

    v, c, hw, d, p = args.views, args.channels, args.hw, args.depths, args.points
    q = hw * hw  # queries per view
    f32 = 4

    # Stage working sets (per matching pair, matching the reference's
    # depth_predictor accounting: features / cost volume / attention QKV).
    feats = v * c * q * f32
    cost_volume = v * d * q * f32
    qkv = 3 * v * c * q * f32
    onehot = 2 * q * p * 128 * 2  # separable bf16 one-hot factors (x/y), ops/deform.py
    total = feats + cost_volume + qkv + onehot

    vmem = args.vmem_mb * 1e6
    print("=== depth-predictor working set (per pair) ===")
    print(f"backbone features      {fmt(feats)}")
    print(f"cost volume (D={d:4d})  {fmt(cost_volume)}")
    print(f"attention Q/K/V        {fmt(qkv)}")
    print(f"one-hot factors (bf16) {fmt(onehot)}")
    print(f"total                  {fmt(total)}   vs VMEM {args.vmem_mb:.0f} MB "
          f"-> {'fits on-chip' if total <= vmem else f'{total / vmem:.1f}x VMEM'}")
    print()

    # HBM traffic: MXU separable formulation reads each operand once and
    # writes each product once (XLA fuses the elementwise chain).
    mxu_traffic = 2 * total
    # Reference-style irregular gather: every (query, depth, point) sample
    # touches a 128 B line for 4 useful bytes, twice (x2 for bilinear rows).
    samples = v * q * d * p
    line = 128
    gather_traffic = samples * 2 * line
    print("=== HBM traffic, cost-volume attention ===")
    print(f"MXU separable matmuls  {fmt(mxu_traffic)}  (dense, each map read once)")
    print(f"irregular gathers      {fmt(gather_traffic)}  "
          f"({samples / 1e6:.1f}M samples x 2 x {line} B lines)")
    print(f"line utilization       {f32 / line * 100:.1f}% (gather) vs 100% (dense)")
    print(f"traffic ratio          {gather_traffic / mxu_traffic:.1f}x")
    print()

    hbm = args.hbm_gbps * 1e9
    print("=== time at HBM roofline ===")
    print(f"MXU formulation        {mxu_traffic / hbm * 1e3:6.2f} ms")
    print(f"gather formulation     {gather_traffic / hbm * 1e3:6.2f} ms "
          "(lower bound; TPU scalar-gather rate ~40M/s is the real limit: "
          f"{samples / 40e6 * 1e3:.0f} ms)")


if __name__ == "__main__":
    main()
