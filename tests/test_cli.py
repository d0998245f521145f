"""CLI entry-point coverage (python -m transplat_tpu.main).

Exercises the argument wiring and the offline modes that need no TPU or
full-size model: generate-index over fixture chunks, compute-metrics over
saved renders, the train-mode run-dir management, and the no-data guard."""

import json
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from tests.test_dataset import make_chunk


def run_cli(args, cwd):
    env = {"PYTHONPATH": "/root/repo", "PATH": "/usr/bin:/bin",
           "JAX_PLATFORM_NAME": "cpu", "JAX_PLATFORMS": "cpu",
           "HOME": str(cwd)}
    return subprocess.run(
        [sys.executable, "-m", "transplat_tpu.main", *args],
        capture_output=True, text=True, cwd=str(cwd), env=env,
    )


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli_data")
    (root / "test").mkdir()
    make_chunk(root / "test" / "000000.torch")
    return root


def test_generate_index_cli(data_root, tmp_path):
    out = tmp_path / "index.json"
    proc = run_cli(
        ["generate-index", "--dataset-root", str(data_root), "--output", str(out)],
        tmp_path,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    index = json.loads(out.read_text())
    assert len(index) >= 1
    # Scenes whose view overlap misses the configured bounds map to null
    # (reference evaluation_index_generator semantics); any concrete entry
    # must carry context/target index lists.
    for entry in index.values():
        if entry is not None:
            assert "context" in entry and "target" in entry


def test_compute_metrics_cli(tmp_path):
    from transplat_tpu.utils.image_io import save_image

    rng = np.random.default_rng(0)
    for scene in ("s0", "s1"):
        img = rng.random((32, 32, 3)).astype(np.float32)
        save_image(img, tmp_path / "gt" / scene / "color" / "0000.png")
        save_image(
            np.clip(img + 0.05, 0, 1), tmp_path / "m" / scene / "color" / "0000.png"
        )
    proc = run_cli(
        [
            "compute-metrics",
            "--ground-truth", str(tmp_path / "gt"),
            "--method", f"ours={tmp_path / 'm'}",
            "--output", str(tmp_path / "metrics"),
        ],
        tmp_path,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    summary = json.loads(proc.stdout[proc.stdout.index("{"):])
    assert "ours" in summary and summary["ours"]["psnr"] > 20


def test_train_without_data_fails_fast(tmp_path):
    proc = run_cli(
        ["train", "--dataset-root", str(tmp_path / "missing"), "--max-steps", "1"],
        tmp_path,
    )
    assert proc.returncode != 0
    assert "no training chunks" in (proc.stderr + proc.stdout)
    # Run-dir management ran before the guard: latest-run symlink exists.
    assert (tmp_path / "outputs" / "latest-run").is_symlink()
