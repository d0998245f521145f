"""Pallas composite kernel + fast binning: parity vs the oracle renderer.

Runs the kernels in interpreter mode on CPU; the same code path compiles with
Mosaic on TPU.
"""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from transplat_tpu.ops.rasterizer import render
from transplat_tpu.ops.rasterizer.api import RasterizeConfig

pytestmark = pytest.mark.slow

REF_CFG = RasterizeConfig(mode="reference")
TILED_FAST = RasterizeConfig(mode="tiled", binning="fast", capacity=512, chunk=64)
PALLAS_CFG = RasterizeConfig(
    mode="pallas", binning="fast", capacity=512, chunk=128, interpret=True
)


def make_camera(b=1):
    extr = jnp.broadcast_to(jnp.eye(4), (b, 4, 4))
    intr = jnp.broadcast_to(
        jnp.array([[1.0, 0.0, 0.5], [0.0, 1.0, 0.5], [0.0, 0.0, 1.0]]), (b, 3, 3)
    )
    near = jnp.full((b,), 0.5)
    far = jnp.full((b,), 100.0)
    bg = jnp.zeros((b, 3))
    return extr, intr, near, far, bg


def random_scene(key, b=1, g=256, sh_degree=2):
    keys = jax.random.split(key, 5)
    means = jnp.concatenate(
        [
            jax.random.uniform(keys[0], (b, g, 2), minval=-1.5, maxval=1.5),
            jax.random.uniform(keys[1], (b, g, 1), minval=2.0, maxval=8.0),
        ],
        axis=-1,
    )
    scales = jax.random.uniform(keys[2], (b, g, 3), minval=0.02, maxval=0.12)
    cov = jnp.einsum("bgi,ij->bgij", scales**2, jnp.eye(3))
    sh = jax.random.normal(keys[3], (b, g, 3, (sh_degree + 1) ** 2)) * 0.3
    opac = jax.random.uniform(keys[4], (b, g), minval=0.3, maxval=0.95)
    return means, cov, sh, opac


class TestFastBinning:
    def test_fast_matches_sort_binning(self):
        extr, intr, near, far, bg = make_camera()
        scene = random_scene(jax.random.PRNGKey(0), g=300)
        sort_cfg = RasterizeConfig(mode="tiled", binning="sort", capacity=512, chunk=64)
        a = render(extr, intr, near, far, (64, 64), bg, *scene, cfg=sort_cfg)
        b_ = render(extr, intr, near, far, (64, 64), bg, *scene, cfg=TILED_FAST)
        np.testing.assert_allclose(
            np.asarray(b_.color), np.asarray(a.color), atol=1e-5
        )

    def test_fast_matches_reference(self):
        extr, intr, near, far, bg = make_camera()
        scene = random_scene(jax.random.PRNGKey(1), g=200)
        a = render(extr, intr, near, far, (32, 64), bg, *scene, cfg=REF_CFG)
        b_ = render(extr, intr, near, far, (32, 64), bg, *scene, cfg=TILED_FAST)
        np.testing.assert_allclose(
            np.asarray(b_.color), np.asarray(a.color), atol=2e-5
        )


class TestPallasComposite:
    def test_forward_matches_reference(self):
        extr, intr, near, far, bg = make_camera(b=2)
        scene = random_scene(jax.random.PRNGKey(2), b=2, g=300)
        ref = render(extr, intr, near, far, (64, 64), bg, *scene, cfg=REF_CFG)
        pal = render(extr, intr, near, far, (64, 64), bg, *scene, cfg=PALLAS_CFG)
        np.testing.assert_allclose(
            np.asarray(pal.color), np.asarray(ref.color), atol=5e-5
        )

    def test_hierarchical_binning_matches_reference(self):
        """128x128 image -> 8x8 tiles triggers the multi-level tree path."""
        extr, intr, near, far, bg = make_camera()
        scene = random_scene(jax.random.PRNGKey(9), g=400)
        cfg = RasterizeConfig(
            mode="pallas", capacity=256, chunk=128, interpret=True,
            bin_chunk=128,
        )
        ref = render(extr, intr, near, far, (128, 128), bg, *scene, cfg=REF_CFG)
        pal = render(extr, intr, near, far, (128, 128), bg, *scene, cfg=cfg)
        np.testing.assert_allclose(
            np.asarray(pal.color), np.asarray(ref.color), atol=5e-5
        )

    def test_hierarchical_gradients(self):
        extr, intr, near, far, bg = make_camera()
        means, cov, sh, opac = random_scene(jax.random.PRNGKey(10), g=120)
        cfg = RasterizeConfig(
            mode="pallas", capacity=256, chunk=128, interpret=True,
            bin_chunk=128,
        )

        def loss(c):
            def fn(m, cv, s, o):
                out = render(extr, intr, near, far, (128, 128), bg, m, cv, s, o, cfg=c)
                w = jnp.cos(jnp.arange(out.color.size).reshape(out.color.shape) * 0.3)
                return jnp.sum(out.color * w)

            return fn

        g_ref = jax.grad(loss(REF_CFG), argnums=(0, 1, 2, 3))(means, cov, sh, opac)
        g_pal = jax.grad(loss(cfg), argnums=(0, 1, 2, 3))(means, cov, sh, opac)
        for a, b_, name in zip(g_ref, g_pal, ["means", "cov", "sh", "opac"]):
            np.testing.assert_allclose(
                np.asarray(b_), np.asarray(a), rtol=2e-3, atol=2e-4, err_msg=name
            )

    def test_hierarchical_window_not_dividing_capacity(self):
        """Regression: a stream window rounded from g_total need not divide
        the level capacities; deeper levels must fall back to a divisor
        window (the window_trips reshape used to raise at trace time)."""
        extr, intr, near, far, bg = make_camera()
        scene = random_scene(jax.random.PRNGKey(11), g=384)  # window -> 384
        cfg = RasterizeConfig(
            mode="pallas", capacity=256, chunk=128, interpret=True,
            bin_chunk=128,
        )
        ref = render(extr, intr, near, far, (128, 128), bg, *scene, cfg=REF_CFG)
        pal = render(extr, intr, near, far, (128, 128), bg, *scene, cfg=cfg)
        np.testing.assert_allclose(
            np.asarray(pal.color), np.asarray(ref.color), atol=5e-5
        )

    def test_saturated_tile_never_composites_overflow(self):
        """Regression: with capacity//chunk odd but width//chunk even, the
        paired sweep used to read the [capacity, width) overflow junk of a
        saturated tile. The composited result must depend only on the clean
        prefix — i.e. be identical across bin_chunk choices (which change the
        worklist width and junk content but not the clean prefix)."""
        key = jax.random.PRNGKey(12)
        extr, intr, near, far, bg = make_camera()
        # ~500 Gaussians concentrated on one 16px tile: saturates capacity.
        keys = jax.random.split(key, 3)
        g = 512
        means = jnp.concatenate(
            [
                jax.random.uniform(keys[0], (1, g, 2), minval=-0.08, maxval=0.08),
                jax.random.uniform(keys[1], (1, g, 1), minval=2.0, maxval=8.0),
            ],
            axis=-1,
        )
        cov = jnp.broadcast_to(jnp.eye(3) * 0.0004, (1, g, 3, 3))
        sh = jax.random.normal(keys[2], (1, g, 3, 9)) * 0.3
        opac = jnp.full((1, g), 0.6)
        base = dict(mode="pallas", capacity=384, chunk=128, interpret=True)
        # width = 384 + 256 + 128 = 768 -> 6 chunks (even), capacity 3 (odd):
        # the old pairing predicate paired and read chunk 3 (overflow junk).
        cfg_a = RasterizeConfig(**base, bin_chunk=256)
        # width = 640 -> odd chunk count either way; clean by construction.
        cfg_b = RasterizeConfig(**base, bin_chunk=128)
        out_a = render(extr, intr, near, far, (64, 64), bg, means, cov, sh, opac, cfg=cfg_a)
        out_b = render(extr, intr, near, far, (64, 64), bg, means, cov, sh, opac, cfg=cfg_b)
        assert int(out_a.overflow[0]) > 0  # the tile really saturated
        np.testing.assert_allclose(
            np.asarray(out_a.color), np.asarray(out_b.color), atol=1e-6
        )

    def test_forward_with_background(self):
        extr, intr, near, far, _ = make_camera()
        bg = jnp.array([[0.2, 0.4, 0.6]])
        scene = random_scene(jax.random.PRNGKey(3), g=64)
        ref = render(extr, intr, near, far, (32, 32), bg, *scene, cfg=REF_CFG)
        pal = render(extr, intr, near, far, (32, 32), bg, *scene, cfg=PALLAS_CFG)
        np.testing.assert_allclose(
            np.asarray(pal.color), np.asarray(ref.color), atol=5e-5
        )

    def test_gradients_match_reference(self):
        extr, intr, near, far, bg = make_camera()
        means, cov, sh, opac = random_scene(jax.random.PRNGKey(4), g=100)

        def loss(cfg):
            def fn(m, c, s, o):
                out = render(extr, intr, near, far, (32, 32), bg, m, c, s, o, cfg=cfg)
                w = jnp.sin(jnp.arange(out.color.size).reshape(out.color.shape) * 0.7)
                return jnp.sum(out.color * w)

            return fn

        g_ref = jax.grad(loss(REF_CFG), argnums=(0, 1, 2, 3))(means, cov, sh, opac)
        g_pal = jax.grad(loss(PALLAS_CFG), argnums=(0, 1, 2, 3))(means, cov, sh, opac)
        for a, b_, name in zip(g_ref, g_pal, ["means", "cov", "sh", "opac"]):
            np.testing.assert_allclose(
                np.asarray(b_), np.asarray(a), rtol=2e-3, atol=2e-4, err_msg=name
            )

    def test_gradient_with_background_term(self):
        """The backward's T_final/bg coupling: gradient of a bg-dominated pixel."""
        extr, intr, near, far, _ = make_camera()
        bg = jnp.array([[0.5, 0.5, 0.5]])
        means, cov, sh, opac = random_scene(jax.random.PRNGKey(5), g=32)

        def loss(cfg):
            def fn(o):
                out = render(
                    extr, intr, near, far, (32, 32), bg, means, cov, sh, o, cfg=cfg
                )
                return jnp.sum(out.color**2)

            return fn

        g_ref = jax.grad(loss(REF_CFG))(opac)
        g_pal = jax.grad(loss(PALLAS_CFG))(opac)
        np.testing.assert_allclose(
            np.asarray(g_pal), np.asarray(g_ref), rtol=2e-3, atol=2e-4
        )

    def test_depth_feature_rendering(self):
        from transplat_tpu.ops.rasterizer import render_depth

        extr, intr, near, far, _ = make_camera()
        n = 16
        xs = jnp.linspace(-2.0, 2.0, n)
        xx, yy = jnp.meshgrid(xs, xs)
        means = jnp.stack([xx.ravel(), yy.ravel(), jnp.full(n * n, 5.0)], -1)[None]
        cov = jnp.broadcast_to(jnp.eye(3) * 0.05, (1, n * n, 3, 3))
        opac = jnp.full((1, n * n), 0.999)
        depth = render_depth(
            extr, intr, near, far, (32, 32), means, cov, opac, cfg=PALLAS_CFG
        )
        np.testing.assert_allclose(float(depth[0, 16, 16]), 5.0, rtol=0.05)


class TestPackBases:
    def test_roundtrip_and_clamp(self):
        from transplat_tpu.ops.rasterizer.pallas_binning import pack_bases

        capacity = 1024
        bases = jnp.array([[0, 3, 700, 1024, 1025, 90000, 5]], jnp.int32)
        packed, is_packed = pack_bases(bases, capacity)
        assert is_packed
        packed = np.asarray(packed)
        # Unpack on the host exactly as _read_base does in-kernel.
        flat = []
        for word in packed:
            flat.append(int(word) & 0xFFFF)
            flat.append(int(word) >> 16)
        expect = np.minimum(np.asarray(bases).reshape(-1), capacity + 1)
        np.testing.assert_array_equal(np.asarray(flat[: expect.size]), expect)

    def test_odd_length_padding(self):
        from transplat_tpu.ops.rasterizer.pallas_binning import pack_bases

        bases = jnp.arange(7, dtype=jnp.int32)
        packed, is_packed = pack_bases(bases, 16384)
        assert is_packed
        assert np.asarray(packed).shape[0] == 4

    def test_large_capacity_stays_flat(self):
        """Capacities past the int16 range (tree upper levels) must fall back
        to flat int32 bases — the packed path would overflow."""
        from transplat_tpu.ops.rasterizer.pallas_binning import pack_bases

        bases = jnp.array([0, 40000, 70000], jnp.int32)
        flat, is_packed = pack_bases(bases, 50944)
        assert not is_packed
        np.testing.assert_array_equal(
            np.asarray(flat), [0, 40000, 50945]
        )


class TestBf16Tier:
    def test_bf16_inference_tier_close_and_grad_raises(self):
        """precision='bf16': single-pass routing + cumsum, image within
        ~bf16 tolerance of the exact path; jax.grad through it raises
        (inference-only tier)."""
        extr, intr, near, far, bg = make_camera()
        scene = random_scene(jax.random.PRNGKey(5), g=400)
        exact = RasterizeConfig(
            mode="pallas", capacity=256, chunk=128, interpret=True, bin_chunk=128
        )
        fast = RasterizeConfig(
            mode="pallas", capacity=256, chunk=128, interpret=True,
            bin_chunk=128, precision="bf16",
        )
        a = render(extr, intr, near, far, (128, 128), bg, *scene, cfg=exact)
        b_ = render(extr, intr, near, far, (128, 128), bg, *scene, cfg=fast)
        err = np.abs(np.asarray(a.color) - np.asarray(b_.color))
        assert err.max() < 3e-2, err.max()
        assert err.mean() < 3e-3, err.mean()

        def loss(m):
            out = render(
                extr, intr, near, far, (128, 128), bg, m, scene[1], scene[2],
                scene[3], cfg=fast,
            )
            return jnp.sum(out.color)

        with pytest.raises(NotImplementedError):
            jax.grad(loss)(scene[0])


class TestCapacityDropQuality:
    def test_drop_at_capacity_is_depth_ordered_lossless(self):
        """Drop-at-capacity drops the FARTHEST worklist entries (the stream
        is depth-sorted), which hide behind saturated transmittance: even
        with overflow on a dense clustered scene the image degrades
        gracefully. Calibrated on this scene (16k Gaussians, 64 tiles):
        capacity 256 -> ~36 dB vs the unbounded tiled oracle with ~14k
        drops; capacity 128 (deep under the saturation workload) -> ~22 dB.
        At the flagship ratio (capacity ~2x the mean per-tile coverage) the
        on-chip sweep measures >= 94 dB at EVERY capacity x headroom in the
        grid (scripts/capacity_sweep.py, artifacts/testsuite_r4) — the
        depth-sorted drops hide behind saturated transmittance. Reference
        CUDA drops nothing (dynamic tile lists, cuda_splatting.py); at the
        shipped defaults the fixed-capacity formulation matches it in
        practice."""
        import sys as _s, os as _o
        _s.path.insert(0, _o.path.join(_o.path.dirname(__file__), "..", "scripts"))
        from capacity_sweep import clustered_scene

        extr, intr, near, far, bg = make_camera()
        means, cov, sh, opac = clustered_scene(jax.random.PRNGKey(0), 1, 16384)
        oracle_cfg = RasterizeConfig(mode="tiled", capacity=16384, chunk=128)
        tight = RasterizeConfig(
            mode="pallas", capacity=256, chunk=128, bin_chunk=128,
            interpret=True,
        )
        a = render(extr, intr, near, far, (128, 128), bg, means, cov, sh, opac,
                   cfg=oracle_cfg)
        b_ = render(extr, intr, near, far, (128, 128), bg, means, cov, sh, opac,
                    cfg=tight)
        assert int(np.asarray(b_.overflow).sum()) > 0, "scene must overflow"
        err = np.abs(np.asarray(a.color) - np.asarray(b_.color))
        mse = float(np.mean((np.asarray(a.color) - np.asarray(b_.color)) ** 2))
        psnr = -10.0 * np.log10(mse + 1e-12)
        assert psnr > 30.0, (psnr, err.max())


class TestLaneCumsum:
    """Unit coverage for the triangular-matmul prefix-sum helpers, including
    the multi-input stacking path (fusing several row blocks into one matmul
    stream) that the kernel bodies currently call only via the single-input
    wrapper."""

    def test_single_matches_numpy(self):
        from transplat_tpu.ops.rasterizer.pallas_composite import _lane_cumsum

        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(4, 256).astype(np.float32))
        for exclusive in (True, False):
            got = np.asarray(_lane_cumsum(x, 256, exclusive=exclusive, parts=3))
            want = np.cumsum(np.asarray(x), axis=1)
            if exclusive:
                want = want - np.asarray(x)
            np.testing.assert_allclose(got, want, rtol=0, atol=1e-4)

    def test_multi_stacking_bit_identical_to_single(self):
        from transplat_tpu.ops.rasterizer.pallas_composite import (
            _lane_cumsum,
            _lane_cumsum_multi,
        )

        rng = np.random.RandomState(1)
        a = jnp.asarray(rng.randn(3, 256).astype(np.float32))
        b = jnp.asarray(rng.uniform(-2, 0, (5, 256)).astype(np.float32))
        for exclusive in (True, False):
            multi_a, multi_b = _lane_cumsum_multi(
                [a, b], 256, [3, 2], exclusive=exclusive
            )
            single_a = _lane_cumsum(a, 256, exclusive=exclusive, parts=3)
            single_b = _lane_cumsum(b, 256, exclusive=exclusive, parts=2)
            # dot_general output rows are independent -> stacking must not
            # change results at the bit level (the docstring's guarantee).
            np.testing.assert_array_equal(np.asarray(multi_a), np.asarray(single_a))
            np.testing.assert_array_equal(np.asarray(multi_b), np.asarray(single_b))
            want = np.cumsum(np.asarray(a), axis=1)
            if exclusive:
                want = want - np.asarray(a)
            np.testing.assert_allclose(np.asarray(multi_a), want, atol=1e-4)
