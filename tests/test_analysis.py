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
