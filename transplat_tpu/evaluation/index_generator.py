"""Evaluation-index generation: pick context pairs by epipolar overlap.

Mirrors /root/reference/src/evaluation/evaluation_index_generator.py:35-158:
walk away from a random starting frame until the mutual view overlap falls in
[min_overlap, max_overlap], then sample non-repeating target views inside the
context interval. Emits the same JSON schema as assets/evaluation_index_*.json.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from ..geometry.overlap import view_overlap


@dataclass
class IndexGeneratorCfg:
    num_target_views: int = 3
    min_overlap: float = 0.6
    max_overlap: float = 0.8
    min_distance: int = 45
    max_distance: int = 245
    seed: int = 123
    # Dense targets (every frame between the context pair) for video
    # rendering — the reference's generate_video_evaluation_index.py variant.
    dense_targets: bool = False


class EvaluationIndexGenerator:
    def __init__(self, cfg: IndexGeneratorCfg):
        self.cfg = cfg
        self.rng = np.random.default_rng(cfg.seed)
        self.index: dict[str, dict | None] = {}

    def _overlap(self, extrinsics, intrinsics, i, j) -> tuple[float, float]:
        a = float(
            view_overlap(
                jnp.asarray(extrinsics[i]), jnp.asarray(intrinsics[i]),
                jnp.asarray(extrinsics[j]), jnp.asarray(intrinsics[j]),
            )
        )
        b = float(
            view_overlap(
                jnp.asarray(extrinsics[j]), jnp.asarray(intrinsics[j]),
                jnp.asarray(extrinsics[i]), jnp.asarray(intrinsics[i]),
            )
        )
        return a, b

    def process_scene(
        self, scene: str, extrinsics: np.ndarray, intrinsics: np.ndarray
    ) -> None:
        cfg = self.cfg
        v = len(extrinsics)
        for context_index in self.rng.permutation(v):
            valid = []
            for step in (1, -1):
                current = int(context_index) + step * cfg.min_distance
                while 0 <= current < v:
                    ov_a, ov_b = self._overlap(
                        extrinsics, intrinsics, int(context_index), current
                    )
                    overlap = min(ov_a, ov_b)
                    delta = abs(current - int(context_index))
                    if cfg.min_overlap <= overlap <= cfg.max_overlap:
                        valid.append(current)
                    if overlap < cfg.min_overlap or delta > cfg.max_distance:
                        break
                    current += step

            if valid:
                chosen = valid[int(self.rng.integers(len(valid)))]
                left = min(chosen, int(context_index))
                right = max(chosen, int(context_index))
                span = right - left + 1
                if span < cfg.num_target_views:
                    continue
                if cfg.dense_targets:
                    target = np.arange(left, right + 1)
                else:
                    target = self.rng.choice(
                        np.arange(left, right + 1),
                        cfg.num_target_views,
                        replace=False,
                    )
                self.index[scene] = {
                    "context": [left, right],
                    "target": sorted(int(t) for t in target),
                }
                return
        self.index[scene] = None

    def save(self, path: str | Path) -> None:
        path = Path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        with open(path, "w") as f:
            json.dump(self.index, f)
