"""Parity tests: reference PyTorch modules (CPU) vs transplat_tpu Flax modules.

Imports /root/reference/src with stubs for its missing heavyweight deps
(refstub.py). Every test: seed torch, instantiate the reference module,
convert its state_dict via transplat_tpu.convert, run both sides on the same
input, assert allclose.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

from .refstub import REFERENCE_ROOT, install_stubs

if not os.path.isdir(REFERENCE_ROOT):  # pragma: no cover
    collect_ignore_glob = ["test_*.py"]
else:
    install_stubs()


@pytest.fixture(autouse=True)
def _torch_determinism(monkeypatch):
    import torch

    torch.manual_seed(0)
    torch.use_deterministic_algorithms(True)
    # the reference forward calls torch.cuda.synchronize() unconditionally for
    # timing fences (depth_predictor_trans.py:349 etc.); no-op it on CPU torch
    monkeypatch.setattr(torch.cuda, "synchronize", lambda *a, **k: None)
    yield


def to_nhwc(x) -> np.ndarray:
    """(..., C, H, W) tensor/array -> numpy (..., H, W, C)."""
    arr = x.detach().cpu().numpy() if hasattr(x, "detach") else np.asarray(x)
    return np.moveaxis(arr, -3, -1)


def to_nchw(x) -> np.ndarray:
    arr = np.asarray(x)
    return np.moveaxis(arr, -1, -3)


def report(name: str, a: np.ndarray, b: np.ndarray, atol: float, rtol: float = 1e-5):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    assert a.shape == b.shape, f"{name}: shape {a.shape} vs {b.shape}"
    err = np.abs(a - b)
    denom = np.maximum(np.abs(b), 1e-6)
    msg = (
        f"{name}: max abs err {err.max():.3e}, max rel err {(err / denom).max():.3e},"
        f" ref scale {np.abs(b).mean():.3e}"
    )
    assert np.allclose(a, b, atol=atol, rtol=rtol), msg
