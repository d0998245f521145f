"""Stage-level wall-clock profiler with JSON dumps.

Mirrors the fork's Benchmarker (/root/reference/src/misc/benchmarker.py:19-213)
on TPU: `time(tag)` context manager blocks on device completion for timing
fidelity (the torch.cuda.synchronize() equivalent), accumulates per-call
splits, and dumps/summarizes JSON with the same stage taxonomy
(encoder_1_prep_intrinsics ... encoder_4f_gaussian_head, decoder).

For deep kernel-level analysis use `trace(logdir)` which wraps
jax.profiler.trace (xprof-compatible), replacing the nsys/ncu flows.
"""

from __future__ import annotations

import json
import time
from collections import defaultdict
from contextlib import contextmanager
from pathlib import Path

import jax

STAGE_ORDER = [
    "encoder_1_prep_intrinsics",
    "encoder_2_backbone",
    "encoder_3_depth_anything",
    "encoder_4_depth_predictor",
    "encoder_4a_prep_features",
    "encoder_4b_cost_volume_matching",
    "encoder_4c_cost_volume_unet",
    "encoder_4d_coarse_depth",
    "encoder_4e_depth_refine_unet",
    "encoder_4f_gaussian_head",
    "encoder_5_gaussian_adapter",
    "encoder",
    "decoder",
]


class Benchmarker:
    def __init__(self):
        self.execution_times: dict[str, list[float]] = defaultdict(list)

    @contextmanager
    def time(self, tag: str, num_calls: int = 1):
        start = time.perf_counter()
        try:
            yield
        finally:
            elapsed = time.perf_counter() - start
            for _ in range(num_calls):
                self.execution_times[tag].append(elapsed / num_calls)

    @contextmanager
    def time_blocking(self, tag: str, result_fn=None):
        """Like time(), but blocks on result_fn() output before stopping."""
        start = time.perf_counter()
        out = {}
        try:
            yield out
        finally:
            if "result" in out:
                jax.block_until_ready(out["result"])
            self.execution_times[tag].append(time.perf_counter() - start)

    @contextmanager
    def trace(self, logdir: str):
        """jax.profiler trace (view with xprof/tensorboard)."""
        with jax.profiler.trace(logdir):
            yield

    def summarize(self, skip_first: int = 0) -> dict:
        out = {}
        for tag, times in self.execution_times.items():
            used = times[skip_first:] if len(times) > skip_first else times
            out[tag] = {
                "count": len(used),
                "total_s": sum(used),
                "mean_ms": 1e3 * sum(used) / max(len(used), 1),
            }
        return out

    def dump(self, path: str | Path, skip_first: int = 0) -> None:
        path = Path(path)
        path.parent.mkdir(exist_ok=True, parents=True)
        with open(path, "w") as f:
            json.dump(
                {
                    "summary": self.summarize(skip_first),
                    "raw": {k: v for k, v in self.execution_times.items()},
                },
                f,
                indent=2,
            )

    def print_table(self, skip_first: int = 0) -> None:
        summary = self.summarize(skip_first)
        ordered = [t for t in STAGE_ORDER if t in summary]
        ordered += [t for t in summary if t not in ordered]
        print(f"{'stage':<36}{'count':>8}{'mean ms':>12}{'total s':>12}")
        for tag in ordered:
            s = summary[tag]
            print(
                f"{tag:<36}{s['count']:>8}{s['mean_ms']:>12.2f}{s['total_s']:>12.3f}"
            )

    def clear_history(self) -> None:
        self.execution_times.clear()
