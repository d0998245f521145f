import numpy as np
import jax
import jax.numpy as jnp

from transplat_tpu.evaluation.metrics import compute_psnr, compute_ssim
from transplat_tpu.loss.losses import LossCfg, compute_losses, depth_smoothness_loss
from transplat_tpu.loss.vgg import LPIPS
from transplat_tpu.visualization.trajectory import (
    generate_wobble,
    interpolate_extrinsics,
    generate_spin,
)
from transplat_tpu.visualization.layout import hcat, vcat, add_border
from transplat_tpu.visualization.color_map import apply_color_map_to_image
from transplat_tpu.visualization.ply_export import export_ply


class TestMetrics:
    def test_psnr_identity_and_known(self):
        img = jax.random.uniform(jax.random.PRNGKey(0), (1, 16, 16, 3))
        assert float(compute_psnr(img, img)[0]) > 100
        noisy = jnp.clip(img + 0.1, 0, 1)
        expected = -10 * np.log10(np.mean((np.asarray(img) - np.asarray(noisy)) ** 2))
        np.testing.assert_allclose(float(compute_psnr(img, noisy)[0]), expected, rtol=1e-3)

    def test_ssim_properties(self):
        img = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3))
        same = compute_ssim(img, img)
        np.testing.assert_allclose(np.asarray(same), 1.0, atol=1e-4)
        noise = jnp.clip(img + 0.2 * jax.random.normal(jax.random.PRNGKey(2), img.shape), 0, 1)
        noisy_score = compute_ssim(img, noise)
        assert float(noisy_score.mean()) < 0.9

    def test_lpips_zero_for_identical(self):
        lpips = LPIPS()
        x = jax.random.uniform(jax.random.PRNGKey(3), (1, 32, 32, 3))
        params = lpips.init(jax.random.PRNGKey(4), x, x)["params"]
        d = lpips.apply({"params": params}, x, x)
        np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-6)
        y = jnp.clip(x + 0.3, 0, 1)
        assert float(lpips.apply({"params": params}, x, y)[0]) > 0.0


class TestLosses:
    def test_compute_losses_gating(self):
        cfg = LossCfg(lpips_weight=0.5, lpips_apply_after_step=100)
        pred = jnp.zeros((1, 1, 8, 8, 3))
        tgt = jnp.ones((1, 1, 8, 8, 3))

        def fake_lpips(a, b):
            return jnp.ones((a.shape[0],))

        total_before, parts = compute_losses(
            cfg, pred, tgt, jnp.asarray(0), lpips_fn=fake_lpips
        )
        total_after, _ = compute_losses(
            cfg, pred, tgt, jnp.asarray(200), lpips_fn=fake_lpips
        )
        np.testing.assert_allclose(float(total_before), 1.0, atol=1e-6)
        np.testing.assert_allclose(float(total_after), 1.5, atol=1e-6)

    def test_depth_smoothness(self):
        flat = jnp.ones((4, 8, 8))
        img = jnp.zeros((4, 8, 8, 3))
        assert float(depth_smoothness_loss(flat, img)) < 1e-6
        bumpy = flat.at[:, 4:, :].set(3.0)
        assert float(depth_smoothness_loss(bumpy, img)) > 0.01


class TestVisualization:
    def test_wobble_shapes(self):
        extr = np.eye(4, dtype=np.float32)
        t = np.linspace(0, 1, 10)
        out = generate_wobble(extr, np.asarray(0.5), t)
        assert out.shape == (10, 4, 4)
        np.testing.assert_allclose(out[0], extr, atol=1e-6)

    def test_interpolation_endpoints(self):
        a = np.eye(4, dtype=np.float32)
        b = np.eye(4, dtype=np.float32)
        b[:3, 3] = [1, 2, 3]
        th = np.radians(30)
        b[:3, :3] = [
            [np.cos(th), -np.sin(th), 0],
            [np.sin(th), np.cos(th), 0],
            [0, 0, 1],
        ]
        out = interpolate_extrinsics(a, b, np.array([0.0, 0.5, 1.0]))
        np.testing.assert_allclose(out[0], a, atol=1e-5)
        np.testing.assert_allclose(out[2], b, atol=1e-5)
        # Midpoint rotation angle should be 15 degrees.
        mid_cos = (np.trace(out[1][:3, :3]) - 1) / 2
        np.testing.assert_allclose(np.degrees(np.arccos(mid_cos)), 15.0, atol=0.1)

    def test_spin_looks_at_origin(self):
        out = generate_spin(8)
        assert out.shape == (8, 4, 4)
        for e in out:
            fwd = e[:3, 2]
            to_origin = -e[:3, 3] / np.linalg.norm(e[:3, 3])
            np.testing.assert_allclose(fwd, to_origin, atol=1e-5)

    def test_layout(self):
        a = np.zeros((8, 12, 3), np.float32)
        b = np.ones((10, 6, 3), np.float32)
        h = hcat(a, b)
        assert h.shape == (10, 8 + 12 + 6, 3)
        v = vcat(a, b)
        assert v.shape == (8 + 8 + 10, 12, 3)
        bo = add_border(a, 4)
        assert bo.shape == (16, 20, 3)

    def test_color_map(self):
        img = np.linspace(0, 1, 64).reshape(8, 8)
        out = apply_color_map_to_image(img)
        assert out.shape == (8, 8, 3)
        assert out.min() >= 0 and out.max() <= 1

    def test_ply_export(self, tmp_path):
        g = 16
        rng = np.random.default_rng(0)
        export_ply(
            rng.normal(size=(g, 3)),
            np.abs(rng.normal(size=(g, 3))) * 0.1,
            rng.normal(size=(g, 4)),
            rng.normal(size=(g, 3, 25)),
            rng.uniform(0.1, 0.9, g),
            tmp_path / "test.ply",
        )
        data = (tmp_path / "test.ply").read_bytes()
        assert data.startswith(b"ply\nformat binary_little_endian")
        header_end = data.index(b"end_header\n") + len(b"end_header\n")
        n_fields = 6 + 3 + 72 + 1 + 3 + 4
        assert len(data) - header_end == g * n_fields * 4


class TestMetricComputerCLI:
    def test_compute_metrics_cli(self, tmp_path):
        """End-to-end offline metric comparison through the CLI
        (reference: src/scripts/compute_metrics.py via MetricComputer)."""
        import json
        import subprocess
        import sys

        from transplat_tpu.utils.image_io import save_image

        rng = np.random.default_rng(0)
        gt_root = tmp_path / "gt"
        good_root = tmp_path / "good"
        noisy_root = tmp_path / "noisy"
        for scene in ("scene_a", "scene_b"):
            imgs = rng.uniform(0.2, 0.8, size=(2, 16, 16, 3)).astype(np.float32)
            for i, img in enumerate(imgs):
                save_image(img, gt_root / scene / "color" / f"{i}.png")
                save_image(img, good_root / scene / "color" / f"{i}.png")
                noisy = np.clip(img + rng.normal(0, 0.1, img.shape), 0, 1)
                save_image(
                    noisy.astype(np.float32),
                    noisy_root / scene / "color" / f"{i}.png",
                )

        out = subprocess.run(
            [
                sys.executable, "-m", "transplat_tpu.main", "compute-metrics",
                "--ground-truth", str(gt_root),
                "--method", f"good={good_root}",
                "--method", f"noisy={noisy_root}",
                "--output", str(tmp_path / "metrics"),
            ],
            capture_output=True, text=True, timeout=300,
        )
        assert out.returncode == 0, out.stderr
        summary = json.loads((tmp_path / "metrics" / "summary.json").read_text())
        assert summary["good"]["psnr"] > 45.0
        assert summary["noisy"]["psnr"] < summary["good"]["psnr"]
        assert summary["good"]["ssim"] > summary["noisy"]["ssim"]

    def test_side_by_side_animation(self, tmp_path):
        """--side-by-side --animate writes per-scene preview panels AND mp4s
        (reference animate_side_by_side, metric_computer.py:83-92)."""
        from transplat_tpu.evaluation.metric_computer import (
            MetricComputer,
            MetricComputerCfg,
        )
        from transplat_tpu.utils.image_io import save_image

        rng = np.random.default_rng(1)
        gt_root = tmp_path / "gt"
        m_root = tmp_path / "m"
        for i in range(3):
            img = rng.uniform(0, 1, size=(16, 16, 3)).astype(np.float32)
            save_image(img, gt_root / "s" / "color" / f"{i}.png")
            save_image(img, m_root / "s" / "color" / f"{i}.png")
        cfg = MetricComputerCfg(
            methods={"m": str(m_root)},
            ground_truth=str(gt_root),
            output_path=str(tmp_path / "out"),
            side_by_side=True,
            animate_side_by_side=True,
        )
        mc = MetricComputer(cfg)
        mc.process_scene("s")
        assert (tmp_path / "out" / "side_by_side" / "s.png").exists()
        video = tmp_path / "out" / "videos" / "s.mp4"
        assert video.exists() and video.stat().st_size > 0
