import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transplat_tpu.dataset.loader import synthetic_batch
from transplat_tpu.loss.losses import LossCfg
from transplat_tpu.model.adapter import GaussianAdapterCfg
from transplat_tpu.model.decoder import DecoderCfg
from transplat_tpu.model.encoder import EncoderCfg
from transplat_tpu.ops.rasterizer.api import RasterizeConfig
from transplat_tpu.parallel.mesh import make_mesh, shard_batch
from transplat_tpu.training.schedule import make_lr_schedule
from transplat_tpu.training.step import (
    create_train_state,
    make_optimizer,
    make_train_step,
)

pytestmark = pytest.mark.slow

H = W = 16


def tiny_encoder_cfg():
    return EncoderCfg(
        d_feature=16,
        num_depth_candidates=16,
        num_context_views=2,
        costvolume_unet_feat_dim=16,
        costvolume_unet_channel_mult=(1, 1),
        costvolume_unet_attn_res=(2,),
        depth_unet_feat_dim=8,
        depth_unet_attn_res=(4,),
        depth_unet_channel_mult=(1, 1, 1),
        dav2_encoder="vits",
        dav2_input_size=28,
        gaussian_adapter=GaussianAdapterCfg(sh_degree=1),
    )


def tiny_decoder_cfg():
    return DecoderCfg(
        rasterize=RasterizeConfig(capacity=128, chunk=64, max_tiles_per_gaussian=8)
    )


def to_device_batch(batch):
    return {
        "context": {k: jnp.asarray(v) for k, v in batch["context"].items()},
        "target": {k: jnp.asarray(v) for k, v in batch["target"].items()},
    }


@pytest.fixture(scope="module")
def setup():
    enc_cfg = tiny_encoder_cfg()
    batch = synthetic_batch(0, batch_size=2, image_shape=(H, W), num_target=2)
    schedule = make_lr_schedule(2e-4, 1000)
    optimizer = make_optimizer(schedule, grad_clip=0.5)
    state = create_train_state(jax.random.PRNGKey(0), enc_cfg, optimizer, batch)
    step_fn = make_train_step(
        enc_cfg,
        LossCfg(lpips_weight=0.05),
        tiny_decoder_cfg(),
        optimizer,
        (H, W),
        donate=False,
    )
    return enc_cfg, optimizer, state, step_fn, batch


class TestTrainStep:
    def test_two_steps_update_params(self, setup):
        _, _, state, step_fn, batch = setup
        db = to_device_batch(batch)
        p0 = jax.tree.leaves(state.params)[0].copy()
        state1, metrics1 = step_fn(state, db, jax.random.PRNGKey(1))
        state2, metrics2 = step_fn(state1, db, jax.random.PRNGKey(2))
        assert np.isfinite(float(metrics1["loss"]))
        assert np.isfinite(float(metrics2["loss"]))
        assert float(metrics1["grad_norm"]) > 0.0
        assert int(state2.step) == 2
        p2 = jax.tree.leaves(state2.params)[0]
        assert not np.allclose(np.asarray(p0), np.asarray(p2))

    def test_metrics_keys(self, setup):
        _, _, state, step_fn, batch = setup
        _, metrics = step_fn(state, to_device_batch(batch), jax.random.PRNGKey(3))
        for key in ("loss", "mse", "psnr", "grad_norm"):
            assert key in metrics
        # LPIPS is gated until calibrated weights are loaded: no random-init
        # noise gradient in the loss, no fake "lpips" metric.
        assert "lpips" not in metrics


class TestShardedTraining:
    def test_dp_sp_mesh_step(self):
        """Full train step over a (dp=4, sp=2) mesh of 8 virtual devices."""
        assert len(jax.devices()) == 8
        mesh = make_mesh(dp=4, sp=2)
        enc_cfg = tiny_encoder_cfg()
        batch = synthetic_batch(1, batch_size=4, image_shape=(H, W), num_target=1)
        schedule = make_lr_schedule(2e-4, 100)
        optimizer = make_optimizer(schedule)
        state = create_train_state(jax.random.PRNGKey(0), enc_cfg, optimizer, batch)
        step_fn = make_train_step(
            enc_cfg,
            LossCfg(lpips_weight=0.0),
            tiny_decoder_cfg(),
            optimizer,
            (H, W),
            donate=False,
            mesh=mesh,
        )
        db = shard_batch(to_device_batch(batch), mesh)
        new_state, metrics = step_fn(state, db, jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics["loss"]))
        assert int(new_state.step) == 1


class TestGoldenOverfit:
    def test_golden_overfit_cpu(self):
        """Reduced CI tier of the golden-scene gate (scripts/overfit_golden.py):
        the tiny model must fit the parallax-consistent 4-plane scene
        measurably in 100 steps — a structural check that encoder ->
        Gaussians -> rasterizer -> loss -> Adam can drive real multi-view
        supervision downhill (the full gate runs on-chip at 256^2/500 steps
        and requires > 25 dB)."""
        from transplat_tpu.dataset.loader import golden_scene_batch

        enc_cfg = tiny_encoder_cfg()
        batch = golden_scene_batch(image_shape=(32, 32), num_target=2)
        db = to_device_batch(
            {
                k: {kk: vv for kk, vv in batch[k].items() if kk != "index"}
                for k in ("context", "target")
            }
        )
        schedule = make_lr_schedule(2e-3, 200, cosine=False, warm_up_steps=1)
        optimizer = make_optimizer(schedule, grad_clip=0.5)
        state = create_train_state(jax.random.PRNGKey(0), enc_cfg, optimizer, batch)
        step_fn = make_train_step(
            enc_cfg, LossCfg(lpips_weight=0.0), tiny_decoder_cfg(), optimizer,
            (32, 32), donate=False,
        )
        rng = jax.random.PRNGKey(1)
        first_psnr = None
        psnr = 0.0
        for i in range(100):
            state, metrics = step_fn(state, db, rng)
            if first_psnr is None:
                first_psnr = float(metrics["psnr"])
            psnr = float(metrics["psnr"])
        assert np.isfinite(psnr)
        # Calibrated on this scene: starts ~12.9 dB, reaches ~15+ dB by 100
        # steps (tiny d_feature=16 model; the full model goes much higher).
        assert psnr > 13.8, f"final psnr {psnr} (start {first_psnr})"
        assert psnr - first_psnr > 1.0, f"no improvement: {first_psnr} -> {psnr}"
