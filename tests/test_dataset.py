import io
import json

import numpy as np
import pytest
import torch
from PIL import Image

from transplat_tpu.dataset.loader import DataLoader, synthetic_batch
from transplat_tpu.dataset.re10k import ChunkDataset, DatasetCfg, convert_poses
from transplat_tpu.dataset.shims import (
    apply_augmentation_shim,
    apply_crop_shim,
    apply_patch_shim,
)
from transplat_tpu.dataset.view_samplers import (
    BoundedCfg,
    ViewSamplerBounded,
    ViewSamplerEvaluation,
)


def make_chunk(path, num_scenes=2, num_frames=30, hw=(360, 640)):
    """Write a .torch chunk in the reference format (JPEG bytes + 18-float poses)."""
    h, w = hw
    rng = np.random.default_rng(0)
    chunk = []
    for s in range(num_scenes):
        images = []
        for _ in range(num_frames):
            img = (rng.random((h, w, 3)) * 255).astype(np.uint8)
            buf = io.BytesIO()
            Image.fromarray(img).save(buf, format="JPEG")
            images.append(torch.frombuffer(bytearray(buf.getvalue()), dtype=torch.uint8))
        poses = np.zeros((num_frames, 18), np.float32)
        poses[:, 0] = 1.0  # fx
        poses[:, 1] = 1.0  # fy
        poses[:, 2] = 0.5
        poses[:, 3] = 0.5
        for f in range(num_frames):
            w2c = np.eye(4, dtype=np.float32)
            w2c[0, 3] = -0.1 * f
            poses[f, 6:] = w2c[:3].reshape(-1)
        chunk.append(
            {
                "key": f"scene_{s}",
                "cameras": torch.from_numpy(poses),
                "images": images,
            }
        )
    torch.save(chunk, path)


@pytest.fixture(scope="module")
def chunk_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("re10k")
    (root / "train").mkdir()
    (root / "test").mkdir()
    make_chunk(root / "train" / "000000.torch")
    make_chunk(root / "test" / "000000.torch")
    return root


class TestConvertPoses:
    def test_roundtrip(self):
        poses = np.zeros((1, 18), np.float32)
        poses[0, :4] = [0.9, 1.1, 0.5, 0.45]
        w2c = np.eye(4, dtype=np.float32)
        w2c[:3, 3] = [1, 2, 3]
        poses[0, 6:] = w2c[:3].reshape(-1)
        extr, intr = convert_poses(poses)
        np.testing.assert_allclose(extr[0], np.linalg.inv(w2c), atol=1e-5)
        assert intr[0, 0, 0] == np.float32(0.9)
        assert intr[0, 1, 2] == np.float32(0.45)


class TestChunkDataset:
    def test_train_iteration(self, chunk_dir):
        cfg = DatasetCfg(
            roots=[str(chunk_dir)],
            image_shape=(64, 64),
            make_baseline_1=False,
            expected_shape=(360, 640),
        )
        sampler = ViewSamplerBounded(
            BoundedCfg(
                min_distance_between_context_views=4,
                max_distance_between_context_views=10,
                warm_up_steps=0,
                num_target_views=2,
            ),
            stage="train",
        )
        ds = ChunkDataset(cfg, "train", sampler, seed=0)
        examples = list(ds)
        assert len(examples) == 2
        ex = examples[0]
        assert ex["context"]["image"].shape == (2, 64, 64, 3)
        assert ex["target"]["image"].shape == (2, 64, 64, 3)
        assert ex["context"]["extrinsics"].shape == (2, 4, 4)
        assert ex["context"]["near"][0] == 1.0

    def test_evaluation_sampler(self, chunk_dir, tmp_path):
        index = {"scene_0": {"context": [0, 8], "target": [4]}, "scene_1": None}
        index_path = tmp_path / "index.json"
        index_path.write_text(json.dumps(index))
        cfg = DatasetCfg(roots=[str(chunk_dir)], image_shape=(64, 64))
        sampler = ViewSamplerEvaluation(index_path)
        ds = ChunkDataset(cfg, "test", sampler, seed=0)
        examples = list(ds)
        assert len(examples) == 1  # scene_1 has a null entry
        np.testing.assert_array_equal(examples[0]["context"]["index"], [0, 8])
        np.testing.assert_array_equal(examples[0]["target"]["index"], [4])

    def test_loader_batching(self, chunk_dir):
        cfg = DatasetCfg(roots=[str(chunk_dir)], image_shape=(64, 64))
        sampler = ViewSamplerBounded(
            BoundedCfg(
                min_distance_between_context_views=4,
                max_distance_between_context_views=10,
                warm_up_steps=0,
                num_target_views=2,
            ),
            stage="train",
        )
        ds = ChunkDataset(cfg, "train", sampler, seed=0)
        batches = list(DataLoader(ds, batch_size=2))
        assert len(batches) == 1
        assert batches[0]["context"]["image"].shape == (2, 2, 64, 64, 3)
        assert len(batches[0]["scene"]) == 2

    def test_multi_worker_loader(self, chunk_dir):
        """Process-parallel loading produces well-formed batches from every
        worker's chunk shard (reference num_workers > 0 DataLoader)."""
        from transplat_tpu.dataset.loader import MultiWorkerLoader

        cfg = DatasetCfg(roots=[str(chunk_dir)], image_shape=(64, 64))

        def make_worker_iter(w):
            sampler = ViewSamplerBounded(
                BoundedCfg(
                    min_distance_between_context_views=4,
                    max_distance_between_context_views=10,
                    warm_up_steps=0,
                    num_target_views=2,
                ),
                stage="train",
            )
            # 1 chunk file: worker 0 gets it, worker 1's shard is empty.
            ds = ChunkDataset(
                cfg, "train", sampler, seed=w, shard_id=w, num_shards=2
            )
            return iter(ds)

        loader = MultiWorkerLoader(make_worker_iter, num_workers=2, batch_size=2)
        batches = list(loader)
        assert len(batches) >= 1
        for b in batches:
            assert b["context"]["image"].shape == (2, 2, 64, 64, 3)
            assert len(b["scene"]) == 2


class TestShims:
    def test_crop_shim_intrinsics(self):
        ex = {
            "context": {
                "image": np.random.default_rng(0).random((2, 360, 640, 3)).astype(np.float32),
                "intrinsics": np.tile(np.eye(3, dtype=np.float32), (2, 1, 1)),
            },
            "target": {
                "image": np.random.default_rng(1).random((1, 360, 640, 3)).astype(np.float32),
                "intrinsics": np.tile(np.eye(3, dtype=np.float32), (1, 1, 1)),
            },
        }
        out = apply_crop_shim(ex, (256, 256))
        assert out["context"]["image"].shape == (2, 256, 256, 3)
        # Landscape input: vertical fills (fy unchanged), horizontal crops (fx scaled).
        np.testing.assert_allclose(out["context"]["intrinsics"][0, 1, 1], 1.0, atol=1e-5)
        np.testing.assert_allclose(
            out["context"]["intrinsics"][0, 0, 0], 640 / 360, rtol=1e-2
        )

    def test_augmentation_preserves_projection(self):
        """Reflection must keep image-point correspondence: a point at x in the
        original projects to (1-x) after the flip."""
        rng_img = np.random.default_rng(0).random((1, 8, 8, 3)).astype(np.float32)
        extr = np.eye(4, dtype=np.float32)[None]
        ex = {
            "context": {"image": rng_img, "extrinsics": extr},
            "target": {"image": rng_img, "extrinsics": extr},
        }
        forced = {
            **ex,
            "context": ex["context"],
        }
        rng = np.random.default_rng(3)
        # Draw until the augmentation branch triggers.
        out = ex
        for _ in range(20):
            out = apply_augmentation_shim(ex, rng)
            if not np.allclose(out["context"]["image"], ex["context"]["image"]):
                break
        np.testing.assert_allclose(
            out["context"]["image"][0, :, ::-1], ex["context"]["image"][0], atol=1e-6
        )
        reflected = out["context"]["extrinsics"][0]
        assert reflected[0, 3] == -extr[0][0, 3]

    def test_patch_shim(self):
        batch = {
            "context": {
                "image": np.zeros((1, 2, 30, 30, 3), np.float32),
                "intrinsics": np.tile(np.eye(3, dtype=np.float32), (1, 2, 1, 1)),
            },
            "target": {
                "image": np.zeros((1, 1, 30, 30, 3), np.float32),
                "intrinsics": np.tile(np.eye(3, dtype=np.float32), (1, 1, 1, 1)),
            },
        }
        out = apply_patch_shim(batch, 16)
        assert out["context"]["image"].shape == (1, 2, 16, 16, 3)
        np.testing.assert_allclose(
            out["context"]["intrinsics"][0, 0, 0, 0], 30 / 16, rtol=1e-5
        )


class TestSyntheticBatch:
    def test_shapes(self):
        b = synthetic_batch(0, batch_size=3, num_context=2, num_target=4, image_shape=(32, 48))
        assert b["context"]["image"].shape == (3, 2, 32, 48, 3)
        assert b["target"]["extrinsics"].shape == (3, 4, 4, 4)
