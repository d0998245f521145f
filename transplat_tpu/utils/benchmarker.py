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


def device_memory_stats(device=None) -> dict:
    """Raw allocator stats for one device (bytes_in_use, peak_bytes_in_use,
    ...); {} on backends without memory_stats (e.g. CPU, and the axon dev
    tunnel — a directly-attached TPU reports them). TPU analog of
    torch.cuda.memory_stats consumed by the reference's memory dumps
    (/root/reference/src/model/model_wrapper.py:427-515); the compiled
    per-stage breakdown (compiled_memory_analysis) fills the gap on
    backends where runtime stats are unavailable."""
    device = device or jax.local_devices()[0]
    try:
        stats = device.memory_stats()
    except Exception:
        stats = None
    return dict(stats) if stats else {}


def compiled_memory_analysis(compiled) -> dict:
    """XLA's static memory breakdown for a compiled executable (argument /
    output / temp / generated-code bytes) — the compile-time complement to
    the runtime peaks above."""
    try:
        ma = compiled.memory_analysis()
    except Exception:
        return {}
    out = {}
    for key in (
        "argument_size_in_bytes",
        "output_size_in_bytes",
        "temp_size_in_bytes",
        "alias_size_in_bytes",
        "generated_code_size_in_bytes",
    ):
        val = getattr(ma, key, None)
        if val is not None:
            out[key] = int(val)
    return out


class Benchmarker:
    def __init__(self):
        self.execution_times: dict[str, list[float]] = defaultdict(list)
        self.memory_stats: dict[str, dict] = {}

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

    @contextmanager
    def memory(self, tag: str, device=None):
        """Record device-memory deltas/peaks around a stage.

        Stores {before, after, cumulative peak, stage_peak_delta_est} for
        `tag` — the reference's per-stage peak_memory.json
        (/root/reference/src/misc/benchmarker.py:66-116) on the TPU
        allocator. No-op (empty record) on backends without memory_stats.
        NOTE: the stage must be synced (host transfer) inside the block for
        the after/peak numbers to cover its execution.
        """
        device = device or jax.local_devices()[0]
        before = device_memory_stats(device)
        try:
            yield
        finally:
            after = device_memory_stats(device)
            if after:
                # peak_bytes_in_use is a PROCESS-LIFETIME high-water mark
                # (never reset), so it only bounds THIS stage's peak when it
                # moved during the stage; otherwise the stage stayed under
                # an earlier global peak and the best stage-scoped bound is
                # its live-bytes delta.
                peak_before = before.get("peak_bytes_in_use", 0)
                peak_after = after.get("peak_bytes_in_use", 0)
                bytes_before = before.get("bytes_in_use", 0)
                bytes_after = after.get("bytes_in_use", 0)
                stage_peak = (
                    peak_after if peak_after > peak_before else bytes_after
                )
                self.memory_stats[tag] = {
                    "bytes_in_use_before": bytes_before,
                    "bytes_in_use_after": bytes_after,
                    "peak_bytes_in_use_cumulative": peak_after,
                    "stage_peak_delta_est": stage_peak - bytes_before,
                }
            else:
                self.memory_stats[tag] = {}

    def dump_memory(self, path: str | Path, extra: dict | None = None) -> None:
        """peak_memory.json: per-stage records + current device totals."""
        path = Path(path)
        path.parent.mkdir(exist_ok=True, parents=True)
        record = {
            "device": device_memory_stats(),
            "stages": self.memory_stats,
        }
        if extra:
            record.update(extra)
        with open(path, "w") as f:
            json.dump(record, f, indent=2)

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
