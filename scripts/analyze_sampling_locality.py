"""Epipolar sampling locality / reuse analysis (TPU-angled).

Port of /root/reference/scripts/analyze_sampling_locality.py: the fork studied
the spatial locality of the geometry-guided sampling coordinates to motivate
a PIM accelerator (cache-line utilization on GPU). On TPU the same workload
is served by the score-hoisted MXU formulation (ops/deform.py), so this
analysis reports, for the real epipolar grids of a camera setup:

  * adjacent-PIXEL coordinate deltas per depth candidate (the fork's
    locality metric: small deltas = heavy reuse opportunity)
  * adjacent-DEPTH deltas along each pixel's epipolar segment
  * fraction of samples whose 4-tap bilinear footprint falls inside one
    (8, 128) VMEM tile of the value grid — the TPU analogue of cache-line
    utilization
  * traffic comparison: naive per-sample vector gathers vs the hoisted
    S = K V^T matmul + scalar sampling actually used

Usage: python scripts/analyze_sampling_locality.py [--h 64 --w 64 --d 128]
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json

import numpy as np

import jax.numpy as jnp

from transplat_tpu.geometry.epipolar import (
    epipolar_sample_grid,
    inverse_depth_candidates,
    relative_pose,
)


def camera_pair(h, w, angle=0.1, tx=0.3):
    intr = np.array(
        [[1.2 * w, 0, 0.5 * w], [0, 1.2 * h, 0.5 * h], [0, 0, 1.0]], np.float32
    )
    e0 = np.eye(4, dtype=np.float32)
    c, s = np.cos(angle), np.sin(angle)
    e1 = np.array(
        [[c, 0, s, tx], [0, 1, 0, 0], [-s, 0, c, 0], [0, 0, 0, 1]], np.float32
    )
    return intr, e0, e1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--h", type=int, default=64)
    ap.add_argument("--w", type=int, default=64)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--c", type=int, default=128, help="feature channels")
    ap.add_argument("--points", type=int, default=4, help="deformable points")
    ap.add_argument("--out", default="outputs/sampling_locality.json")
    args = ap.parse_args()
    h, w, d = args.h, args.w, args.d

    intr, e0, e1 = camera_pair(h, w)
    rel = relative_pose(jnp.asarray(e0), jnp.asarray(e1))
    disp = inverse_depth_candidates(jnp.asarray(1.0), jnp.asarray(100.0), d)
    grid01 = epipolar_sample_grid(jnp.asarray(intr), rel, 1.0 / disp, h, w)
    # (D, HW, 2) in [0,1] -> pixel units
    px = np.asarray(grid01) * np.array([w - 1, h - 1], np.float32)
    px_map = px.reshape(d, h, w, 2)

    # Adjacent-pixel deltas (per depth candidate)
    dx = np.linalg.norm(px_map[:, :, 1:] - px_map[:, :, :-1], axis=-1)
    dy = np.linalg.norm(px_map[:, 1:] - px_map[:, :-1], axis=-1)
    adj_pixel = np.concatenate([dx.ravel(), dy.ravel()])

    # Adjacent-depth deltas (epipolar step length)
    dd = np.linalg.norm(px_map[1:] - px_map[:-1], axis=-1).ravel()

    # VMEM-tile locality: does a sample's bilinear footprint stay inside one
    # (8, 128) f32 VMEM tile of the (H, W) value grid?
    x0 = np.floor(px[..., 0])
    y0 = np.floor(px[..., 1])
    same_tile = ((x0 % 128) <= 126) & ((y0 % 8) <= 6)
    inside = (
        (px[..., 0] >= 0) & (px[..., 0] <= w - 1)
        & (px[..., 1] >= 0) & (px[..., 1] <= h - 1)
    )

    # Traffic: naive gather of C-dim vectors at Q*D*P samples (the mmcv
    # kernel's reads) vs hoisted score sampling (Q*D*P scalars after one
    # (Q, C) x (C, HW) matmul whose operands are read once).
    q = h * w
    p = args.points
    naive_bytes = q * d * p * 4 * args.c * 4  # 4 bilinear taps, f32
    hoisted_bytes = (q * args.c + args.c * q + q * q) * 4 + q * d * p * 4 * 4
    stats = {
        "adjacent_pixel_delta_px": {
            "mean": float(adj_pixel.mean()),
            "p50": float(np.percentile(adj_pixel, 50)),
            "p95": float(np.percentile(adj_pixel, 95)),
            "frac_below_1px": float((adj_pixel < 1.0).mean()),
            "frac_below_2px": float((adj_pixel < 2.0).mean()),
        },
        "adjacent_depth_delta_px": {
            "mean": float(dd.mean()),
            "p50": float(np.percentile(dd, 50)),
            "frac_below_1px": float((dd < 1.0).mean()),
        },
        "in_frustum_fraction": float(inside.mean()),
        "bilinear_footprint_single_vmem_tile_fraction": float(
            (same_tile & inside).sum() / max(inside.sum(), 1)
        ),
        "gather_traffic_bytes": int(naive_bytes),
        "hoisted_traffic_bytes": int(hoisted_bytes),
        "traffic_reduction_x": float(naive_bytes / hoisted_bytes),
    }

    print(json.dumps(stats, indent=2))
    _os.makedirs(_os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(stats, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
