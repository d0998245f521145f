"""View samplers: bounded (curriculum), evaluation (golden JSON), arbitrary, all.

Mirrors /root/reference/src/dataset/view_sampler/ in numpy. The reference's
StepTracker (shared-memory step for curriculum) becomes a plain `global_step`
argument threaded by the data loader.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from pathlib import Path

import numpy as np


@dataclass
class BoundedCfg:
    num_context_views: int = 2
    num_target_views: int = 4
    min_distance_between_context_views: int = 45
    max_distance_between_context_views: int = 192
    min_distance_to_context_views: int = 0
    warm_up_steps: int = 150_000
    initial_min_distance_between_context_views: int = 25
    initial_max_distance_between_context_views: int = 45


class ViewSamplerBounded:
    """Curriculum-scheduled context gap (view_sampler_bounded.py:24-121)."""

    def __init__(self, cfg: BoundedCfg, stage: str = "train", cameras_are_circular: bool = False):
        self.cfg = cfg
        self.stage = stage
        self.circular = cameras_are_circular

    def _schedule(self, initial: int, final: int, global_step: int) -> int:
        fraction = global_step / self.cfg.warm_up_steps
        return min(initial + int((final - initial) * fraction), final)

    def sample(self, scene: str, num_views: int, rng: np.random.Generator, global_step: int = 0):
        cfg = self.cfg
        if self.stage == "test":
            max_gap = min_gap = cfg.max_distance_between_context_views
        elif cfg.warm_up_steps > 0:
            max_gap = self._schedule(
                cfg.initial_max_distance_between_context_views,
                cfg.max_distance_between_context_views,
                global_step,
            )
            min_gap = self._schedule(
                cfg.initial_min_distance_between_context_views,
                cfg.min_distance_between_context_views,
                global_step,
            )
        else:
            max_gap = cfg.max_distance_between_context_views
            min_gap = cfg.min_distance_between_context_views

        # NOTE: reference keeps this pixelSplat quirk (clamping max_gap via
        # min_gap's variable) — preserved for identical sampling statistics.
        if not self.circular:
            max_gap = min(num_views - 1, min_gap)
        min_gap = max(2 * cfg.min_distance_to_context_views, min_gap)
        if max_gap < min_gap:
            raise ValueError("Example does not have enough frames!")

        context_gap = int(rng.integers(min_gap, max_gap + 1))
        hi = num_views if self.circular else num_views - context_gap
        left = int(rng.integers(hi))
        if self.stage == "test":
            left = 0
        right = left + context_gap

        if self.stage == "test":
            target = np.arange(left, right + 1)
        else:
            target = rng.integers(
                left + cfg.min_distance_to_context_views,
                right + 1 - cfg.min_distance_to_context_views,
                size=cfg.num_target_views,
            )
        if self.circular:
            target = target % num_views
            right = right % num_views
        return np.array([left, right]), np.asarray(target)

    @property
    def num_context_views(self):
        return 2

    @property
    def num_target_views(self):
        return self.cfg.num_target_views


class ViewSamplerEvaluation:
    """Fixed context/target indices from a golden JSON asset
    (view_sampler_evaluation.py:24-70; assets/evaluation_index_*.json)."""

    def __init__(self, index_path: str | Path, num_context_views: int = 2):
        with open(index_path) as f:
            self.index = json.load(f)
        self._num_context_views = num_context_views

    def sample(self, scene: str, num_views: int, rng=None, global_step: int = 0):
        entry = self.index.get(scene)
        if entry is None:
            raise ValueError(f"No evaluation entry for scene {scene}")
        return np.asarray(entry["context"]), np.asarray(entry["target"])

    def scenes(self):
        return [k for k, v in self.index.items() if v is not None]

    @property
    def num_context_views(self):
        return self._num_context_views

    @property
    def num_target_views(self):
        return 1


@dataclass
class ArbitraryCfg:
    num_context_views: int = 2
    num_target_views: int = 1
    context_views: list | None = None
    target_views: list | None = None


class ViewSamplerArbitrary:
    """Random (or fixed) arbitrary views (view_sampler_arbitrary.py)."""

    def __init__(self, cfg: ArbitraryCfg):
        self.cfg = cfg

    def sample(self, scene: str, num_views: int, rng: np.random.Generator, global_step: int = 0):
        if self.cfg.context_views is not None:
            context = np.asarray(self.cfg.context_views)
        else:
            context = rng.integers(num_views, size=self.cfg.num_context_views)
        if self.cfg.target_views is not None:
            target = np.asarray(self.cfg.target_views)
        else:
            target = rng.integers(num_views, size=self.cfg.num_target_views)
        return context, target

    @property
    def num_context_views(self):
        return self.cfg.num_context_views

    @property
    def num_target_views(self):
        return self.cfg.num_target_views


class ViewSamplerAll:
    """All views as both context and target (view_sampler_all.py)."""

    def sample(self, scene: str, num_views: int, rng=None, global_step: int = 0):
        idx = np.arange(num_views)
        return idx, idx

    @property
    def num_context_views(self):
        return 0

    @property
    def num_target_views(self):
        return 0


def get_view_sampler(name: str, stage: str = "train", **kwargs):
    if name == "bounded":
        return ViewSamplerBounded(BoundedCfg(**kwargs), stage=stage)
    if name == "evaluation":
        return ViewSamplerEvaluation(**kwargs)
    if name == "arbitrary":
        return ViewSamplerArbitrary(ArbitraryCfg(**kwargs))
    if name == "all":
        return ViewSamplerAll()
    raise ValueError(f"unknown view sampler {name}")
