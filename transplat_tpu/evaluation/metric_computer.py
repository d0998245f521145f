"""Offline metric comparison across methods' saved renders.

Mirrors /root/reference/src/evaluation/metric_computer.py:15-115: loads saved
PNGs for N methods, tabulates running PSNR/SSIM/LPIPS against ground truth,
optionally writes side-by-side comparisons.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from ..utils.image_io import load_image, save_image, save_video
from ..visualization.layout import add_label, hcat
from .metrics import compute_psnr, compute_ssim


@dataclass
class MetricComputerCfg:
    methods: dict = field(default_factory=dict)  # name -> directory of renders
    ground_truth: str = ""
    output_path: str = "outputs/metrics"
    side_by_side: bool = False
    # Per-scene side-by-side animation (reference animate_side_by_side,
    # metric_computer.py:83-92 — ffmpeg there, cv2 mp4 writer here).
    animate_side_by_side: bool = False


class MetricComputer:
    def __init__(self, cfg: MetricComputerCfg, lpips_fn=None):
        self.cfg = cfg
        self.lpips_fn = lpips_fn
        self.scores: dict[str, dict[str, list]] = {
            m: {"psnr": [], "ssim": [], "lpips": []} for m in cfg.methods
        }

    def _scene_images(self, root: str | Path, scene: str) -> list[Path]:
        return sorted((Path(root) / scene / "color").glob("*.png"))

    def process_scene(self, scene: str) -> None:
        gt_paths = self._scene_images(self.cfg.ground_truth, scene)
        if not gt_paths:
            return
        gt = np.stack([load_image(p) for p in gt_paths])
        panels = []
        for method, root in self.cfg.methods.items():
            paths = self._scene_images(root, scene)
            if len(paths) != len(gt_paths):
                continue
            pred = np.stack([load_image(p) for p in paths])
            self.scores[method]["psnr"].append(
                float(np.mean(np.asarray(compute_psnr(jnp.asarray(gt), jnp.asarray(pred)))))
            )
            self.scores[method]["ssim"].append(
                float(np.mean(np.asarray(compute_ssim(jnp.asarray(gt), jnp.asarray(pred)))))
            )
            if self.lpips_fn is not None:
                self.scores[method]["lpips"].append(
                    float(np.mean(np.asarray(self.lpips_fn(jnp.asarray(pred), jnp.asarray(gt)))))
                )
            if self.cfg.side_by_side:
                panels.append((method, pred))
        if self.cfg.side_by_side and panels:
            # Per-frame rows (ground truth | method renders), frame 0 saved as
            # the scene preview; all frames optionally stitched into an mp4
            # (the reference's ffmpeg glob animation, metric_computer.py:83-92).
            rows = [
                hcat(
                    add_label(gt[i], "ground truth"),
                    *[add_label(pred[i], m) for m, pred in panels],
                )
                for i in range(len(gt))
            ]
            out = Path(self.cfg.output_path) / "side_by_side" / f"{scene}.png"
            save_image(rows[0], out)
            if self.cfg.animate_side_by_side and len(rows) > 1:
                # Fixed 30 fps like the reference's ffmpeg animation; only
                # degenerate 2-3 frame scenes slow down so they are visible.
                save_video(
                    rows,
                    Path(self.cfg.output_path) / "videos" / f"{scene}.mp4",
                    fps=30 if len(rows) >= 4 else 2,
                )

    def summarize(self) -> dict:
        out = {}
        for method, score in self.scores.items():
            out[method] = {
                k: float(np.mean(v)) for k, v in score.items() if len(v) > 0
            }
        path = Path(self.cfg.output_path)
        path.mkdir(parents=True, exist_ok=True)
        with open(path / "summary.json", "w") as f:
            json.dump(out, f, indent=2)
        return out
