"""Visualize epipolar sample lines between two context views.

Equivalent of /root/reference/src/scripts/visualize_epipolar_lines.py: for a
few query pixels in view A, draw the plane-sweep sample locations (the depth
candidates' projections) in view B — the geometry the UV cost-volume
attention samples along.

Usage:
  python scripts/visualize_epipolar_lines.py --experiment re10k \
      --scene <key> --out outputs/epipolar
"""



from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
from pathlib import Path

import numpy as np
import jax.numpy as jnp

from transplat_tpu.config import load_config
from transplat_tpu.dataset.re10k import ChunkDataset
from transplat_tpu.dataset.view_samplers import ViewSamplerEvaluation, BoundedCfg, ViewSamplerBounded
from transplat_tpu.geometry.epipolar import (
    epipolar_sample_grid,
    inverse_depth_candidates,
    relative_pose,
)
from transplat_tpu.geometry.projection import unnormalize_intrinsics
from transplat_tpu.utils.image_io import save_image
from transplat_tpu.visualization.layout import hcat
from transplat_tpu.visualization.color_map import apply_color_map


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--experiment", default="re10k")
    parser.add_argument("--evaluation-index", default=None)
    parser.add_argument("--num-pixels", type=int, default=6)
    parser.add_argument("--num-depths", type=int, default=32)
    parser.add_argument("--out", default="outputs/epipolar")
    parser.add_argument("--max-scenes", type=int, default=4)
    args = parser.parse_args()

    cfg = load_config(args.experiment)
    if args.evaluation_index:
        sampler = ViewSamplerEvaluation(args.evaluation_index)
        stage = "test"
    else:
        sampler = ViewSamplerBounded(BoundedCfg(warm_up_steps=0), stage="test")
        stage = "test"
    dataset = ChunkDataset(cfg.dataset, stage, sampler)

    out_dir = Path(args.out)
    rng = np.random.default_rng(0)
    for i, example in enumerate(dataset):
        if i >= args.max_scenes:
            break
        ctx = example["context"]
        h, w = ctx["image"].shape[1:3]
        intr_px = unnormalize_intrinsics(jnp.asarray(ctx["intrinsics"][0]), (h, w))
        rel = relative_pose(
            jnp.asarray(ctx["extrinsics"][0]), jnp.asarray(ctx["extrinsics"][1])
        )
        depths = 1.0 / inverse_depth_candidates(
            jnp.asarray(ctx["near"][0]), jnp.asarray(ctx["far"][0]), args.num_depths
        )
        grid = np.asarray(
            epipolar_sample_grid(intr_px, rel, depths, h, w)
        )  # (D, H*W, 2) in [0, 1]

        img_a = ctx["image"][0].copy()
        img_b = ctx["image"][1].copy()
        for p in range(args.num_pixels):
            py = int(rng.integers(h // 4, 3 * h // 4))
            px = int(rng.integers(w // 4, 3 * w // 4))
            color = apply_color_map(np.asarray([p / args.num_pixels]))[0]
            img_a[max(py - 2, 0) : py + 3, max(px - 2, 0) : px + 3] = color
            q = py * w + px
            for d in range(args.num_depths):
                x = grid[d, q, 0] * (w - 1)
                y = grid[d, q, 1] * (h - 1)
                if 0 <= x < w and 0 <= y < h:
                    img_b[int(y), int(x)] = color
        save_image(hcat(img_a, img_b), out_dir / f"{example['scene']}.png")
        print(f"wrote {out_dir / example['scene']}.png")


if __name__ == "__main__":
    main()
