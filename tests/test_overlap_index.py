import numpy as np
import jax.numpy as jnp

from transplat_tpu.evaluation.index_generator import (
    EvaluationIndexGenerator,
    IndexGeneratorCfg,
)
from transplat_tpu.geometry.overlap import view_overlap


def camera(tx=0.0, yaw_deg=0.0):
    e = np.eye(4, dtype=np.float32)
    th = np.radians(yaw_deg)
    e[:3, :3] = [
        [np.cos(th), 0, np.sin(th)],
        [0, 1, 0],
        [-np.sin(th), 0, np.cos(th)],
    ]
    e[0, 3] = tx
    return e


INTR = np.array([[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1.0]], np.float32)


class TestViewOverlap:
    def test_identical_views_full_overlap(self):
        e = jnp.asarray(camera())
        ov = float(view_overlap(e, jnp.asarray(INTR), e, jnp.asarray(INTR)))
        assert ov > 0.99

    def test_opposite_views_no_overlap(self):
        a = jnp.asarray(camera())
        b = jnp.asarray(camera(yaw_deg=180.0))
        ov = float(view_overlap(a, jnp.asarray(INTR), b, jnp.asarray(INTR)))
        assert ov < 0.05

    def test_partial_overlap_monotone_in_yaw(self):
        a = jnp.asarray(camera())
        prev = 1.0
        for yaw in [0.0, 20.0, 40.0, 60.0]:
            b = jnp.asarray(camera(yaw_deg=yaw))
            ov = float(view_overlap(a, jnp.asarray(INTR), b, jnp.asarray(INTR)))
            assert ov <= prev + 1e-3
            prev = ov


class TestIndexGenerator:
    def test_picks_pair_in_overlap_band(self):
        # Cameras panning steadily: overlap decays with index distance.
        n = 60
        extr = np.stack([camera(yaw_deg=1.2 * i) for i in range(n)])
        intr = np.tile(INTR, (n, 1, 1))
        gen = EvaluationIndexGenerator(
            IndexGeneratorCfg(
                num_target_views=3,
                min_overlap=0.4,
                max_overlap=0.8,
                min_distance=5,
                max_distance=50,
            )
        )
        gen.process_scene("s0", extr, intr)
        entry = gen.index["s0"]
        assert entry is not None
        left, right = entry["context"]
        assert right - left >= 5
        assert all(left <= t <= right for t in entry["target"])
        ov = float(
            view_overlap(
                jnp.asarray(extr[left]), jnp.asarray(intr[left]),
                jnp.asarray(extr[right]), jnp.asarray(intr[right]),
            )
        )
        assert 0.3 <= ov <= 0.9

    def test_impossible_scene_gives_none(self):
        # Two wildly different cameras only.
        extr = np.stack([camera(), camera(yaw_deg=180.0)])
        intr = np.tile(INTR, (2, 1, 1))
        gen = EvaluationIndexGenerator(
            IndexGeneratorCfg(min_distance=1, max_distance=5)
        )
        gen.process_scene("s1", extr, intr)
        assert gen.index["s1"] is None

    def test_save_roundtrip(self, tmp_path):
        gen = EvaluationIndexGenerator(IndexGeneratorCfg())
        gen.index = {"a": {"context": [0, 5], "target": [2]}, "b": None}
        gen.save(tmp_path / "index.json")
        import json

        data = json.loads((tmp_path / "index.json").read_text())
        assert data["a"]["context"] == [0, 5]
        assert data["b"] is None


class TestVideoIndex:
    def test_dense_targets_cover_interval(self):
        n = 60
        extr = np.stack([camera(yaw_deg=1.2 * i) for i in range(n)])
        intr = np.tile(INTR, (n, 1, 1))
        gen = EvaluationIndexGenerator(
            IndexGeneratorCfg(
                num_target_views=3,
                min_overlap=0.4,
                max_overlap=0.8,
                min_distance=5,
                max_distance=50,
                dense_targets=True,
            )
        )
        gen.process_scene("s0", extr, intr)
        entry = gen.index["s0"]
        assert entry is not None
        left, right = entry["context"]
        assert entry["target"] == list(range(left, right + 1))
