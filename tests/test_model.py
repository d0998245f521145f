import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transplat_tpu.model.adapter import GaussianAdapterCfg
from transplat_tpu.model.decoder import decode_splatting, DecoderCfg
from transplat_tpu.model.encoder import EncoderCfg, EncoderTranSplat, map_pdf_to_opacity, OpacityMappingCfg
from transplat_tpu.model.types import Gaussians
from transplat_tpu.ops.rasterizer.api import RasterizeConfig

pytestmark = pytest.mark.slow


def tiny_cfg():
    return EncoderCfg(
        d_feature=32,
        num_depth_candidates=32,
        num_context_views=2,
        costvolume_unet_feat_dim=32,
        costvolume_unet_channel_mult=(1, 1),
        costvolume_unet_attn_res=(2,),
        depth_unet_feat_dim=8,
        depth_unet_attn_res=(4,),
        depth_unet_channel_mult=(1, 1, 1),
        dav2_encoder="vits",
        dav2_input_size=28,
        gaussian_adapter=GaussianAdapterCfg(sh_degree=2),
    )


def tiny_batch(key, b=1, v=2, h=32, w=32):
    k1 = jax.random.split(key, 4)
    images = jax.random.uniform(k1[0], (b, v, h, w, 3))
    intrinsics = jnp.broadcast_to(
        jnp.array([[1.0, 0.0, 0.5], [0.0, 1.0, 0.5], [0.0, 0.0, 1.0]]), (b, v, 3, 3)
    )
    extr = jnp.broadcast_to(jnp.eye(4), (b, v, 4, 4))
    extr = extr.at[:, 1, 0, 3].set(0.2)  # second view shifted in x
    near = jnp.full((b, v), 1.0)
    far = jnp.full((b, v), 100.0)
    return images, intrinsics, extr, near, far


class TestEncoder:
    @pytest.fixture(scope="class")
    def encoder_apply(self):
        cfg = tiny_cfg()
        model = EncoderTranSplat(cfg)
        batch = tiny_batch(jax.random.PRNGKey(0))
        variables = model.init(jax.random.PRNGKey(1), *batch, train=False)
        return model, variables, batch, cfg

    def test_forward_shapes(self, encoder_apply):
        model, variables, batch, cfg = encoder_apply
        gaussians, aux = model.apply(*(variables,), *batch, return_aux=True)
        b, v, h, w = 1, 2, 32, 32
        g = v * h * w
        assert gaussians.means.shape == (b, g, 3)
        assert gaussians.covariances.shape == (b, g, 3, 3)
        assert gaussians.harmonics.shape == (b, g, 3, 9)
        assert gaussians.opacities.shape == (b, g)
        assert aux["depths"].shape == (b, v, h, w)
        assert np.all(np.isfinite(np.asarray(gaussians.means)))
        # Depths must lie in [near, far].
        d = np.asarray(aux["depths"])
        assert d.min() >= 1.0 - 1e-5 and d.max() <= 100.0 + 1e-3

    def test_opacities_in_range(self, encoder_apply):
        model, variables, batch, _ = encoder_apply
        gaussians = model.apply(variables, *batch)
        o = np.asarray(gaussians.opacities)
        assert o.min() >= 0.0 and o.max() <= 1.0

    def test_end_to_end_render(self, encoder_apply):
        model, variables, batch, _ = encoder_apply
        images, intrinsics, extr, near, far = batch
        gaussians = model.apply(variables, *batch)
        out = decode_splatting(
            gaussians,
            extr,
            intrinsics,
            near,
            far,
            (32, 32),
            cfg=DecoderCfg(
                rasterize=RasterizeConfig(capacity=256, chunk=64, max_tiles_per_gaussian=16)
            ),
        )
        assert out.color.shape == (1, 2, 32, 32, 3)
        assert np.all(np.isfinite(np.asarray(out.color)))


class TestOpacityMapping:
    def test_identity_when_flat(self):
        cfg = OpacityMappingCfg(0.0, 0.0, 1)
        pdf = jnp.linspace(0.0, 1.0, 11)
        out = map_pdf_to_opacity(pdf, cfg, jnp.asarray(100))
        np.testing.assert_allclose(np.asarray(out), np.asarray(pdf), atol=1e-6)

    def test_warmup_curve(self):
        cfg = OpacityMappingCfg(-2.0, 2.0, 100)
        out0 = map_pdf_to_opacity(jnp.asarray(0.3), cfg, jnp.asarray(0))
        out1 = map_pdf_to_opacity(jnp.asarray(0.3), cfg, jnp.asarray(100))
        assert not np.allclose(float(out0), float(out1))


class TestS2DUNet:
    @pytest.mark.parametrize(
        "channel_mult,attn_res",
        [((1, 1, 1), (4,)), ((1, 2), (2,))],
    )
    def test_s2d_unet_equivalent(self, channel_mult, attn_res):
        """UNetModel(s2d=True) computes the same function with the same
        parameter tree as the fine-domain path (level-scope space-to-depth
        tower, ops/s2d.py) — outputs and gradients agree to fp
        reassociation. Covers in-domain attention boundaries, skip concats
        via splits-aware kernels (uniform mult), and channel-changing
        mults. Zero-init norms make the chains vanish at init, so params
        are randomized first."""
        import numpy as np

        from transplat_tpu.model.unet import UNetModel

        kw = dict(
            model_channels=16, out_channels=16, num_res_blocks=1,
            attention_resolutions=attn_res, channel_mult=channel_mult,
            num_frames=2,
        )
        a = UNetModel(**kw)
        b = UNetModel(**kw, s2d=True)
        x = jnp.asarray(
            np.random.default_rng(0).standard_normal((2, 32, 32, 12)),
            jnp.float32,
        )
        va = a.init(jax.random.PRNGKey(0), x)
        vb = b.init(jax.random.PRNGKey(0), x)
        assert jax.tree_util.tree_structure(va) == jax.tree_util.tree_structure(vb)
        leaves, tree = jax.tree_util.tree_flatten(va)
        rng = np.random.default_rng(1)
        leaves = [
            jnp.asarray(rng.standard_normal(l.shape) * 0.2, l.dtype)
            for l in leaves
        ]
        va = jax.tree_util.tree_unflatten(tree, leaves)
        ya = a.apply(va, x)
        yb = b.apply(va, x)
        # Per-op equivalence is ~2e-6 (ops/s2d.py tests); through a full
        # tower with softmax attention the reassociation differences
        # accumulate — network-level tolerances like the other parity
        # suites.
        np.testing.assert_allclose(np.asarray(ya), np.asarray(yb), atol=5e-4)
        ga = jax.grad(lambda v: jnp.sum(a.apply(v, x) ** 2))(va)
        gb = jax.grad(lambda v: jnp.sum(b.apply(v, x) ** 2))(va)
        for p, q in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
            np.testing.assert_allclose(
                np.asarray(p), np.asarray(q),
                atol=5e-4, rtol=2e-3,
            )
