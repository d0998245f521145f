import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from transplat_tpu.ops.deform import deform_sample_scores, deform_sample_vectors
from transplat_tpu.ops.interpolate import grid_sample, resize_bilinear, upsample_nearest


def torch_grid_sample(values_hwc, loc01, align_corners):
    """values (H, W, C), loc01 (N, 2) -> (N, C) via torch."""
    v = torch.from_numpy(np.asarray(values_hwc)).permute(2, 0, 1)[None]
    grid = torch.from_numpy(np.asarray(loc01)) * 2.0 - 1.0
    grid = grid[None, :, None, :]  # (1, N, 1, 2)
    out = F.grid_sample(
        v, grid, mode="bilinear", padding_mode="zeros", align_corners=align_corners
    )
    return out[0, :, :, 0].permute(1, 0).numpy()


class TestGridSample:
    def test_matches_torch_align_false(self):
        key = jax.random.PRNGKey(0)
        values = jax.random.normal(key, (9, 13, 5))
        loc = jax.random.uniform(
            jax.random.PRNGKey(1), (200, 2), minval=-0.2, maxval=1.2
        )
        ours = grid_sample(values, loc, align_corners=False)
        ref = torch_grid_sample(values, loc, align_corners=False)
        np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)

    def test_matches_torch_align_true(self):
        values = jax.random.normal(jax.random.PRNGKey(2), (7, 8, 3))
        loc = jax.random.uniform(jax.random.PRNGKey(3), (100, 2))
        ours = grid_sample(values, loc, align_corners=True)
        ref = torch_grid_sample(values, loc, align_corners=True)
        np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)


class TestResize:
    def test_matches_torch_align_true(self):
        x = jax.random.normal(jax.random.PRNGKey(4), (2, 10, 14, 3))
        ours = resize_bilinear(x, (25, 37), align_corners=True)
        xt = torch.from_numpy(np.asarray(x)).permute(0, 3, 1, 2)
        ref = F.interpolate(xt, (25, 37), mode="bilinear", align_corners=True)
        ref = ref.permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)

    def test_matches_torch_align_false(self):
        x = jax.random.normal(jax.random.PRNGKey(5), (1, 8, 8, 2))
        ours = resize_bilinear(x, (5, 11), align_corners=False)
        xt = torch.from_numpy(np.asarray(x)).permute(0, 3, 1, 2)
        ref = F.interpolate(xt, (5, 11), mode="bilinear", align_corners=False)
        ref = ref.permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)

    def test_nearest(self):
        x = jax.random.normal(jax.random.PRNGKey(6), (2, 4, 4, 3))
        ours = upsample_nearest(x, 2)
        xt = torch.from_numpy(np.asarray(x)).permute(0, 3, 1, 2)
        ref = F.interpolate(xt, scale_factor=2, mode="nearest")
        ref = ref.permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-6)


class TestDeformSampling:
    def test_vectors_match_torch(self):
        h, w, c, q, p = 8, 8, 16, 32, 4
        value = jax.random.normal(jax.random.PRNGKey(7), (h * w, c))
        loc = jax.random.uniform(
            jax.random.PRNGKey(8), (q, p, 2), minval=-0.1, maxval=1.1
        )
        weights = jax.nn.softmax(jax.random.normal(jax.random.PRNGKey(9), (q, p)))
        ours = deform_sample_vectors(value, (h, w), loc, weights)

        vt = torch.from_numpy(np.asarray(value)).reshape(h, w, c)
        sampled = torch_grid_sample(vt.numpy(), np.asarray(loc).reshape(-1, 2), False)
        sampled = sampled.reshape(q, p, c)
        ref = (sampled * np.asarray(weights)[..., None]).sum(1)
        np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)

    def test_scores_equal_hoisted_dot(self):
        """Sampling scalars from K V^T == sampling vectors then dotting with K."""
        h, w, c, q, d, p = 8, 8, 16, 10, 6, 2
        value = jax.random.normal(jax.random.PRNGKey(10), (h * w, c))
        keys = jax.random.normal(jax.random.PRNGKey(11), (q, c))
        loc = jax.random.uniform(jax.random.PRNGKey(12), (q, d, p, 2))
        weights = jax.nn.softmax(
            jax.random.normal(jax.random.PRNGKey(13), (q, d, p)), axis=-1
        )
        scores = keys @ value.T  # (Q, HW)
        ours = deform_sample_scores(scores, (h, w), loc, weights)

        # Reference path: gather vectors, weight, then dot with key.
        sampled = jax.vmap(
            lambda l, wt: deform_sample_vectors(value, (h, w), l, wt),
            in_axes=(1, 1),
            out_axes=1,
        )(loc, weights)  # (Q, D, C)
        ref = jnp.einsum("qdc,qc->qd", sampled, keys)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=1e-4)


class TestScoresCustomVJP:
    def _inputs(self, q=512, d=6, p=2, h=8, w=8):
        scores = jax.random.normal(jax.random.PRNGKey(20), (q, h * w))
        loc = jax.random.uniform(
            jax.random.PRNGKey(21), (q, d, p, 2), minval=-0.1, maxval=1.1
        )  # includes out-of-bounds corners
        weights = jax.nn.softmax(
            jax.random.normal(jax.random.PRNGKey(22), (q, d, p)), axis=-1
        )
        return scores, loc, weights, (h, w)

    def test_gradients_match_gather_reference(self):
        from transplat_tpu.ops.deform import deform_sample_scores_gather

        scores, loc, weights, shape = self._inputs()
        cot = jax.random.normal(
            jax.random.PRNGKey(23), (scores.shape[0], loc.shape[1])
        )

        def loss(fn, s, l, a):
            return jnp.sum(fn(s, shape, l, a) * cot)

        g_ours = jax.grad(
            lambda s, l, a: loss(deform_sample_scores, s, l, a), argnums=(0, 1, 2)
        )(scores, loc, weights)
        g_ref = jax.grad(
            lambda s, l, a: loss(deform_sample_scores_gather, s, l, a),
            argnums=(0, 1, 2),
        )(scores, loc, weights)
        for ours, ref, name in zip(g_ours, g_ref, ["scores", "loc", "attn"]):
            np.testing.assert_allclose(
                np.asarray(ours), np.asarray(ref), atol=1e-4, err_msg=name
            )

    def test_gradients_match_gather_unchunked(self):
        from transplat_tpu.ops.deform import deform_sample_scores_gather

        scores, loc, weights, shape = self._inputs(q=64)

        def loss(fn, s, l, a):
            return jnp.sum(fn(s, shape, l, a) ** 2)

        g_ours = jax.grad(
            lambda s: loss(deform_sample_scores, s, loc, weights)
        )(scores)
        g_ref = jax.grad(
            lambda s: loss(deform_sample_scores_gather, s, loc, weights)
        )(scores)
        np.testing.assert_allclose(np.asarray(g_ours), np.asarray(g_ref), atol=1e-4)


class TestPallasScores:
    """Pallas deform-scores kernel (ops/deform_pallas.py) vs the gather
    oracle and the XLA chunked form — forward, all three gradients, vmap
    (the model's directed-pair axis), and OOB corner handling."""

    def _case(self, q=256, d=128, p=4, h=64, w=64, seed=0):
        k = jax.random.split(jax.random.PRNGKey(seed), 3)
        scores = jax.random.normal(k[0], (q, h * w))
        loc = jax.random.uniform(k[1], (q, d, p, 2), minval=-0.05, maxval=1.05)
        aw = jax.nn.softmax(jax.random.normal(k[2], (q, d, p)), axis=-1)
        return scores, loc, aw

    def test_forward_matches_gather_oracle(self):
        from transplat_tpu.ops.deform import (
            deform_sample_scores,
            deform_sample_scores_gather,
        )

        scores, loc, aw = self._case()
        ref = deform_sample_scores_gather(scores, (64, 64), loc, aw)
        pal = deform_sample_scores(scores, (64, 64), loc, aw, impl="pallas")
        np.testing.assert_allclose(np.asarray(pal), np.asarray(ref), atol=2e-5)

    def test_gradients_match_xla_vjp(self):
        from transplat_tpu.ops.deform import deform_sample_scores

        scores, loc, aw = self._case(q=128)

        def loss(s, l, a, impl):
            out = deform_sample_scores(s, (64, 64), l, a, impl=impl)
            return jnp.sum(jnp.sin(out))

        gx = jax.grad(loss, argnums=(0, 1, 2))(scores, loc, aw, "xla")
        gp = jax.grad(loss, argnums=(0, 1, 2))(scores, loc, aw, "pallas")
        for a, b in zip(gx, gp):
            scale = float(jnp.abs(a).max()) + 1e-9
            np.testing.assert_allclose(
                np.asarray(b) / scale, np.asarray(a) / scale, atol=2e-6
            )

    def test_vmapped_pair_axis(self):
        from transplat_tpu.ops.deform import deform_sample_scores

        scores, loc, aw = self._case(q=128)
        s2 = jnp.stack([scores, 0.5 * scores])
        l2 = jnp.stack([loc, 1.0 - loc])
        a2 = jnp.stack([aw, aw])
        pal = jax.vmap(
            lambda s, l, a: deform_sample_scores(s, (64, 64), l, a, impl="pallas")
        )(s2, l2, a2)
        xla = jax.vmap(
            lambda s, l, a: deform_sample_scores(s, (64, 64), l, a, impl="xla")
        )(s2, l2, a2)
        np.testing.assert_allclose(np.asarray(pal), np.asarray(xla), atol=2e-5)

    def test_coarse_p1_shape(self):
        from transplat_tpu.ops.deform import deform_sample_scores

        scores, loc, aw = self._case(q=64, d=128, p=1)
        pal = deform_sample_scores(scores, (64, 64), loc, aw, impl="pallas")
        xla = deform_sample_scores(scores, (64, 64), loc, aw, impl="xla")
        np.testing.assert_allclose(np.asarray(pal), np.asarray(xla), atol=2e-5)

    def test_unsupported_shapes_fall_back(self):
        from transplat_tpu.ops.deform import deform_sample_scores
        from transplat_tpu.ops.deform_pallas import supported

        # D*P not lane-aligned -> auto must fall back to the XLA path.
        assert not supported(64, 16, 4, 16, 16)
        scores, loc, aw = self._case(q=64, d=16, p=4, h=16, w=16)
        out = deform_sample_scores(scores, (16, 16), loc, aw, impl="auto")
        xla = deform_sample_scores(scores, (16, 16), loc, aw, impl="xla")
        np.testing.assert_allclose(np.asarray(out), np.asarray(xla), atol=1e-6)
        with pytest.raises(ValueError, match="pallas deform"):
            deform_sample_scores(scores, (16, 16), loc, aw, impl="pallas")


class TestPallasVectors:
    """Pallas deform-vectors kernel (UV self-attention sampling) vs the XLA
    one-hot matmul form — forward, all three gradients, vmap, OOB corners."""

    def _case(self, q=256, p=4, h=64, w=64, c=128, seed=0):
        k = jax.random.split(jax.random.PRNGKey(seed), 3)
        value = jax.random.normal(k[0], (h * w, c))
        # Deliberately includes out-of-range samples (zero-padding semantics).
        loc = jax.random.uniform(k[1], (q, p, 2), minval=-0.05, maxval=1.05)
        aw = jax.nn.softmax(jax.random.normal(k[2], (q, p)), axis=-1)
        return value, loc, aw

    def test_forward_matches_xla(self):
        from transplat_tpu.ops.deform import deform_sample_vectors

        value, loc, aw = self._case()
        xla = deform_sample_vectors(value, (64, 64), loc, aw, impl="xla")
        pal = deform_sample_vectors(value, (64, 64), loc, aw, impl="pallas")
        np.testing.assert_allclose(np.asarray(pal), np.asarray(xla), atol=2e-5)

    def test_gradients_match_xla_vjp(self):
        from transplat_tpu.ops.deform import deform_sample_vectors

        value, loc, aw = self._case(q=128)

        def loss(v, l, a, impl):
            out = deform_sample_vectors(v, (64, 64), l, a, impl=impl)
            return jnp.sum(jnp.sin(out))

        gx = jax.grad(loss, argnums=(0, 1, 2))(value, loc, aw, "xla")
        gp = jax.grad(loss, argnums=(0, 1, 2))(value, loc, aw, "pallas")
        for a, b in zip(gx, gp):
            scale = float(jnp.abs(a).max()) + 1e-9
            np.testing.assert_allclose(
                np.asarray(b) / scale, np.asarray(a) / scale, atol=2e-6
            )

    def test_vmapped_pair_axis(self):
        from transplat_tpu.ops.deform import deform_sample_vectors

        value, loc, aw = self._case(q=128)
        v2 = jnp.stack([value, 0.5 * value])
        l2 = jnp.stack([loc, 1.0 - loc])
        a2 = jnp.stack([aw, aw])
        pal = jax.vmap(
            lambda v, l, a: deform_sample_vectors(v, (64, 64), l, a, impl="pallas")
        )(v2, l2, a2)
        xla = jax.vmap(
            lambda v, l, a: deform_sample_vectors(v, (64, 64), l, a, impl="xla")
        )(v2, l2, a2)
        np.testing.assert_allclose(np.asarray(pal), np.asarray(xla), atol=2e-5)

    def test_unsupported_shapes_fall_back(self):
        from transplat_tpu.ops.deform import deform_sample_vectors
        from transplat_tpu.ops.deform_pallas import vectors_supported

        # C not lane-aligned -> auto must fall back to the XLA path.
        assert not vectors_supported(64, 4, 16, 16, 48)
        k = jax.random.split(jax.random.PRNGKey(0), 3)
        value = jax.random.normal(k[0], (16 * 16, 48))
        loc = jax.random.uniform(k[1], (64, 4, 2))
        aw = jax.nn.softmax(jax.random.normal(k[2], (64, 4)), axis=-1)
        out = deform_sample_vectors(value, (16, 16), loc, aw, impl="auto")
        xla = deform_sample_vectors(value, (16, 16), loc, aw, impl="xla")
        np.testing.assert_allclose(np.asarray(out), np.asarray(xla), atol=1e-6)
        with pytest.raises(ValueError, match="pallas deform vectors"):
            deform_sample_vectors(value, (16, 16), loc, aw, impl="pallas")
