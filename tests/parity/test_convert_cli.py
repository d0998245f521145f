"""End-to-end test of scripts/convert_weights.py on synthetic checkpoints
built from the reference modules' own random-init state dicts."""

from __future__ import annotations

import subprocess
import sys

import numpy as np
import pytest

from .refstub import import_ref

pytestmark = pytest.mark.slow


def _run(args):
    proc = subprocess.run(
        [sys.executable, "scripts/convert_weights.py", *args],
        capture_output=True,
        text=True,
        cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    return proc


def test_cli_dav2_unimatch_lpips(tmp_path):
    import torch

    # --- dav2 (vits keeps it quick)
    dpt = import_ref("src.depth_anything_v2.dpt")
    torch.manual_seed(61)
    dav2 = dpt.DepthAnythingV2(encoder="vits", features=64, out_channels=[48, 96, 192, 384])
    src = tmp_path / "dav2.pth"
    torch.save(dav2.state_dict(), src)
    out = tmp_path / "dav2.npy"
    _run([str(src), "--kind", "dav2", "--encoder", "vits", "--out", str(out)])
    tree = np.load(out, allow_pickle=True).item()
    assert "pretrained" in tree["params"] and "depth_head" in tree["params"]

    # --- unimatch partial (fake gmdepth checkpoint: backbone+transformer keys)
    bm = import_ref("src.model.encoder.backbone.backbone_multiview")
    torch.manual_seed(62)
    backbone = bm.BackboneMultiview(downscale_factor=4)
    gm = {
        "model": {
            k: v
            for k, v in backbone.state_dict().items()
            if k.split(".")[0] in ("backbone", "transformer")
        }
    }
    src = tmp_path / "gmdepth.pth"
    torch.save(gm, src)
    out = tmp_path / "unimatch.npy"
    _run([str(src), "--kind", "unimatch", "--out", str(out)])
    tree = np.load(out, allow_pickle=True).item()
    assert "backbone" in tree["params"] and "transformer" in tree["params"]

    # --- lpips-style flat dict
    lp_sd = {
        "net.slice1.0.weight": torch.randn(64, 3, 3, 3),
        "net.slice1.0.bias": torch.randn(64),
        "lin0.model.1.weight": torch.randn(1, 64, 1, 1),
    }
    src = tmp_path / "lpips.pth"
    torch.save(lp_sd, src)
    out = tmp_path / "lpips.npy"
    _run([str(src), "--kind", "lpips", "--out", str(out)])
    tree = np.load(out, allow_pickle=True).item()
    assert "lin0.model.1.weight" in tree
