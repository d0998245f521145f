import numpy as np
import jax.numpy as jnp

from transplat_tpu.utils.analysis import (
    adjacent_gaussian_similarity,
    depth_pdf_stats,
    feature_depth_correlation,
    gaussian_contribution_stats,
)


class TestAnalysis:
    def test_contribution_stats(self):
        radii = jnp.asarray([0.0, 2.0, 5.0, 0.0])
        opac = jnp.asarray([0.5, 0.005, 0.5, 0.9])
        s = gaussian_contribution_stats(radii, opac, opacity_threshold=0.01)
        assert s["total_gaussians"] == 4
        assert s["visible_gaussians"] == 2
        assert s["high_contribution_gaussians"] == 1
        np.testing.assert_allclose(s["visible_ratio"], 0.5)

    def test_adjacent_similarity_flat_vs_noisy(self):
        flat = jnp.ones((1, 1, 8, 8)) * 5.0
        s_flat = adjacent_gaussian_similarity(flat, None)
        assert s_flat["similar_ratio"] > 0.99
        noisy = jnp.asarray(np.random.default_rng(0).uniform(1, 100, (1, 1, 8, 8)))
        s_noisy = adjacent_gaussian_similarity(noisy, None)
        assert s_noisy["similar_ratio"] < s_flat["similar_ratio"]

    def test_pdf_stats(self):
        d = 16
        sharp = jnp.zeros((1, 1, 2, 2, d)).at[..., 3].set(1.0)
        s = depth_pdf_stats(sharp)
        assert s["mean_entropy"] < 0.01
        assert s["sharp_fraction"] == 1.0
        uniform = jnp.full((1, 1, 2, 2, d), 1.0 / d)
        u = depth_pdf_stats(uniform)
        np.testing.assert_allclose(u["normalized_entropy"], 1.0, atol=1e-5)

    def test_feature_depth_correlation_keys(self):
        f = jnp.asarray(np.random.default_rng(1).normal(size=(1, 2, 8, 8, 4)))
        d = jnp.asarray(np.random.default_rng(2).uniform(1, 10, (1, 2, 32, 32)))
        out = feature_depth_correlation(f, d, num_pairs=256)
        for key in (
            "similar_pair_fraction",
            "depth_consistency_given_similar",
            "depth_consistency_overall",
        ):
            assert 0.0 <= out[key] <= 1.0


class TestStagedEncoder:
    def test_staged_encoder_matches_fused(self):
        """The stage-by-stage profiling driver (evaluation/staged.py) must
        produce exactly the fused encoder's Gaussians."""
        import jax

        from transplat_tpu.dataset.loader import synthetic_batch
        from transplat_tpu.evaluation.staged import StagedEncoder, STAGES
        from transplat_tpu.model.encoder import EncoderTranSplat
        from transplat_tpu.utils.benchmarker import Benchmarker
        import __graft_entry__ as entry

        cfg = entry._flagship_cfg(tiny=True)
        batch = synthetic_batch(0, batch_size=1, image_shape=(16, 16), num_target=1)
        ctx = {k: jnp.asarray(v) for k, v in batch["context"].items()}
        model = EncoderTranSplat(cfg)
        variables = jax.jit(lambda: model.init(
            jax.random.PRNGKey(0), ctx["image"], ctx["intrinsics"],
            ctx["extrinsics"], ctx["near"], ctx["far"],
        ))()
        fused = jax.jit(lambda: model.apply(
            variables, ctx["image"], ctx["intrinsics"], ctx["extrinsics"],
            ctx["near"], ctx["far"],
        ))()

        bench = Benchmarker()
        staged = StagedEncoder(cfg, variables)
        gaussians, aux = staged.run(ctx, benchmarker=bench)

        np.testing.assert_allclose(
            np.asarray(gaussians.means), np.asarray(fused.means), rtol=2e-5, atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(gaussians.opacities), np.asarray(fused.opacities),
            rtol=2e-5, atol=2e-5,
        )
        np.testing.assert_allclose(
            np.asarray(gaussians.harmonics), np.asarray(fused.harmonics),
            rtol=2e-5, atol=2e-5,
        )
        # Full reference taxonomy recorded (model_wrapper.py:381-395).
        for stage in STAGES:
            assert stage in bench.execution_times, stage


class TestPhaseSummary:
    def test_phase_summary_from_benchmark(self, tmp_path):
        """scripts/analyze_phase_summary groups the evaluator's taxonomy into
        the fork's 4 phases (generate_phase_summary.py equivalent)."""
        import importlib.util
        import json
        import sys

        spec = importlib.util.spec_from_file_location(
            "analyze_phase_summary", "scripts/analyze_phase_summary.py"
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)

        from transplat_tpu.evaluation.staged import STAGES
        from transplat_tpu.utils.benchmarker import Benchmarker

        bench = Benchmarker()
        for i, stage in enumerate(STAGES + ["decoder"]):
            with bench.time(stage):
                pass
            bench.execution_times[stage] = [0.001 * (i + 1)]

        dump = {"summary": bench.summarize()}
        phases = mod.summarize(dump)
        assert set(phases) == {
            "Feature Extraction", "Depth Prediction",
            "Gaussian Generation", "Decoder",
        }
        total_share = sum(p["share"] for p in phases.values())
        np.testing.assert_allclose(total_share, 1.0, atol=1e-6)
        assert phases["Depth Prediction"]["mean_ms"] > phases["Feature Extraction"]["mean_ms"]

    def test_hbm_share_from_stage_profile(self):
        """scripts/analyze_hbm_share groups per-stage XLA bytes-accessed into
        the 4-phase HBM-traffic share table (the fork's analyze_hbm_traffic
        DDR attribution, on compiled cost analysis instead of bus counters)."""
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "analyze_hbm_share", "scripts/analyze_hbm_share.py"
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)

        profile = {
            "rows": [
                {"stage": "encoder_2_backbone", "gb_accessed": 6.0,
                 "real_ms": 12.0, "gb_per_s": 500.0},
                {"stage": "encoder_4e_depth_refine_unet", "gb_accessed": 8.0,
                 "real_ms": 20.0, "gb_per_s": 400.0},
                {"stage": "encoder_4b_cost_volume_matching", "gb_accessed": 2.0,
                 "real_ms": 5.0, "gb_per_s": 400.0},
                {"stage": "decoder", "gb_accessed": 4.0,
                 "real_ms": 10.0, "gb_per_s": 400.0},
            ]
        }
        result = mod.summarize(profile)
        shares = {p: v["hbm_share"] for p, v in result["phases"].items()}
        np.testing.assert_allclose(sum(shares.values()), 1.0, atol=1e-9)
        np.testing.assert_allclose(shares["Depth Prediction"], 0.5, atol=1e-9)
        np.testing.assert_allclose(shares["Feature Extraction"], 0.3, atol=1e-9)
        np.testing.assert_allclose(shares["Decoder"], 0.2, atol=1e-9)
        assert result["total_gb_accessed"] == 20.0
        # Per-phase achieved bandwidth: bytes / real time.
        np.testing.assert_allclose(
            result["phases"]["Depth Prediction"]["gb_per_s"], 10.0 / 0.025,
        )
