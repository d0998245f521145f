"""RE10K/ACID/DTU chunked dataset reader.

Mirrors /root/reference/src/dataset/dataset_re10k.py:43-287: iterates .torch
chunk files (lists of scenes with JPEG bytes + 18-float poses), samples
context/target views, decodes, applies shims. torch is used only for
torch.load on the host; everything downstream is numpy NHWC.
"""

from __future__ import annotations

import io
from dataclasses import dataclass, field
from pathlib import Path
from typing import Iterator

import numpy as np
from PIL import Image

from .shims import apply_augmentation_shim, apply_crop_shim
from .types import Example


@dataclass
class DatasetCfg:
    roots: list = field(default_factory=lambda: ["datasets/re10k"])
    image_shape: tuple[int, int] = (256, 256)
    near: float = 1.0
    far: float = 100.0
    baseline_epsilon: float = 1e-3
    max_fov: float = 100.0
    make_baseline_1: bool = False
    baseline_scale_bounds: bool = False
    augment: bool = True
    skip_bad_shape: bool = True
    expected_shape: tuple[int, int] | None = (360, 640)
    test_times_per_scene: int = 1
    overfit_to_scene: str | None = None
    cameras_are_circular: bool = False


def convert_poses(poses: np.ndarray):
    """18-float rows -> (c2w 4x4, normalized K 3x3) (dataset_re10k.py:212-233)."""
    b = poses.shape[0]
    intrinsics = np.tile(np.eye(3, dtype=np.float32), (b, 1, 1))
    fx, fy, cx, cy = poses[:, 0], poses[:, 1], poses[:, 2], poses[:, 3]
    intrinsics[:, 0, 0] = fx
    intrinsics[:, 1, 1] = fy
    intrinsics[:, 0, 2] = cx
    intrinsics[:, 1, 2] = cy
    w2c = np.tile(np.eye(4, dtype=np.float32), (b, 1, 1))
    w2c[:, :3] = poses[:, 6:].reshape(b, 3, 4)
    return np.linalg.inv(w2c), intrinsics


def _decode_images(image_bytes_list) -> np.ndarray:
    blobs = [np.asarray(b, dtype=np.uint8).tobytes() for b in image_bytes_list]
    # Native threaded libjpeg decoder (transplat_tpu/native); PIL fallback.
    from .. import native

    decoded = native.decode_jpeg_batch(blobs)
    if decoded is not None:
        return decoded.astype(np.float32) / 255.0
    out = []
    for data in blobs:
        img = Image.open(io.BytesIO(data)).convert("RGB")
        out.append(np.asarray(img, dtype=np.float32) / 255.0)
    return np.stack(out)


def _fov_deg(intrinsics: np.ndarray) -> np.ndarray:
    fx = intrinsics[:, 0, 0]
    fy = intrinsics[:, 1, 1]
    fov_x = 2.0 * np.arctan(0.5 / fx)
    fov_y = 2.0 * np.arctan(0.5 / fy)
    return np.degrees(np.stack([fov_x, fov_y], -1))


class ChunkDataset:
    """Iterable over examples from .torch chunks.

    stage: train | val | test. For multi-host training pass shard_id/num_shards
    to stripe chunks across hosts (mirrors the reference's per-rank striping,
    dataset_re10k.py:98-103).
    """

    def __init__(
        self,
        cfg: DatasetCfg,
        stage: str,
        view_sampler,
        seed: int = 1234,
        shard_id: int = 0,
        num_shards: int = 1,
    ):
        self.cfg = cfg
        self.stage = stage
        self.view_sampler = view_sampler
        self.rng = np.random.default_rng(seed + shard_id)
        self.chunks: list[Path] = []
        # RE10K ships train/ and test/ only; the val stage reads the test
        # chunks (held out from the optimizer) with val-stage sampling —
        # reference data_stage property, dataset_re10k.py:253-259.
        data_stage = "test" if stage == "val" else stage
        for root in cfg.roots:
            stage_dir = Path(root) / data_stage
            if stage_dir.exists():
                self.chunks.extend(sorted(stage_dir.glob("*.torch")))
        self.chunks = self.chunks[shard_id::num_shards]

    def __iter__(self) -> Iterator[Example]:
        return self.iter_examples()

    def iter_examples(self, global_step_fn=None) -> Iterator[Example]:
        import torch

        chunks = list(self.chunks)
        if self.stage == "train":
            self.rng.shuffle(chunks)

        for chunk_path in chunks:
            try:
                chunk = torch.load(chunk_path, weights_only=False)
            except (RuntimeError, EOFError):
                continue

            if self.cfg.overfit_to_scene is not None:
                item = [x for x in chunk if x["key"] == self.cfg.overfit_to_scene]
                chunk = item * len(chunk)

            if self.stage == "train":
                order = self.rng.permutation(len(chunk))
                chunk = [chunk[i] for i in order]

            tps = self.cfg.test_times_per_scene
            for run_idx in range(tps * len(chunk)):
                raw = chunk[run_idx // tps]
                example = self._build_example(
                    raw,
                    run_idx % tps,
                    0 if global_step_fn is None else global_step_fn(),
                )
                if example is not None:
                    yield example

    def _build_example(self, raw, run_sub_idx: int, global_step: int) -> Example | None:
        poses = np.asarray(raw["cameras"], dtype=np.float32)
        extrinsics, intrinsics = convert_poses(poses)
        scene = raw["key"]
        if self.cfg.test_times_per_scene > 1:
            scene = f"{scene}_{run_sub_idx:02d}"

        try:
            ctx_idx, tgt_idx = self.view_sampler.sample(
                scene, len(poses), self.rng, global_step
            )
        except ValueError:
            return None

        if (_fov_deg(intrinsics) > self.cfg.max_fov).any():
            return None

        context_images = _decode_images([raw["images"][i] for i in ctx_idx])
        target_images = _decode_images([raw["images"][i] for i in tgt_idx])

        if self.cfg.skip_bad_shape and self.cfg.expected_shape is not None:
            exp = self.cfg.expected_shape
            if context_images.shape[1:3] != exp or target_images.shape[1:3] != exp:
                return None

        scale = 1.0
        if len(ctx_idx) == 2 and self.cfg.make_baseline_1:
            a = extrinsics[ctx_idx[0], :3, 3]
            b = extrinsics[ctx_idx[1], :3, 3]
            scale = float(np.linalg.norm(a - b))
            if scale < self.cfg.baseline_epsilon:
                return None
            extrinsics = extrinsics.copy()
            extrinsics[:, :3, 3] /= scale

        nf_scale = scale if self.cfg.baseline_scale_bounds else 1.0

        def views(idx, images):
            n = len(idx)
            return {
                "extrinsics": extrinsics[idx],
                "intrinsics": intrinsics[idx],
                "image": images,
                "near": np.full((n,), self.cfg.near / nf_scale, np.float32),
                "far": np.full((n,), self.cfg.far / nf_scale, np.float32),
                "index": np.asarray(idx),
            }

        example: Example = {
            "context": views(ctx_idx, context_images),
            "target": views(tgt_idx, target_images),
            "scene": scene,
        }
        if self.stage == "train" and self.cfg.augment:
            example = apply_augmentation_shim(example, self.rng)
        return apply_crop_shim(example, tuple(self.cfg.image_shape))
