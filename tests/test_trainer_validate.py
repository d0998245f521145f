import dataclasses

import jax
import pytest

from transplat_tpu.parallel.mesh import make_mesh


def small_mesh():
    """dp=2 mesh so the batch of 2 shards cleanly."""
    return make_mesh(dp=2, sp=1, devices=jax.devices()[:2])

from transplat_tpu.config import RootCfg
from transplat_tpu.dataset.loader import synthetic_batch
from transplat_tpu.dataset.re10k import DatasetCfg
from transplat_tpu.model.adapter import GaussianAdapterCfg
from transplat_tpu.model.decoder import DecoderCfg
from transplat_tpu.model.encoder import EncoderCfg
from transplat_tpu.ops.rasterizer.api import RasterizeConfig
from transplat_tpu.training.trainer import Trainer

pytestmark = pytest.mark.slow


def tiny_root_cfg(tmp_path):
    cfg = RootCfg()
    cfg.dataset = DatasetCfg(image_shape=(16, 16))
    cfg.encoder = EncoderCfg(
        d_feature=16,
        num_depth_candidates=16,
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
    cfg.decoder = DecoderCfg(
        rasterize=RasterizeConfig(capacity=128, chunk=64, max_tiles_per_gaussian=8)
    )
    cfg.loss = dataclasses.replace(cfg.loss, lpips_weight=0.0)
    cfg.trainer.batch_size = 2
    cfg.checkpointing.save_dir = str(tmp_path / "ckpt")
    return cfg


class TestTrainerLoop:
    def test_fit_and_validate_synthetic(self, tmp_path):
        cfg = tiny_root_cfg(tmp_path)
        trainer = Trainer(cfg, mesh=small_mesh(), log_fn=lambda *a: None)

        def batches():
            while True:
                yield synthetic_batch(0, batch_size=2, image_shape=(16, 16), num_target=1)

        state = trainer.fit(data_iter=batches(), max_steps=2)
        assert int(state.step) == 2
        assert trainer.ckpt.latest_step() == 2

        metrics = trainer.validate(
            state,
            synthetic_batch(1, batch_size=1, image_shape=(16, 16), num_target=2),
            out_dir=str(tmp_path / "local"),
        )
        assert "val_psnr" in metrics
        assert (tmp_path / "local" / "validation_00000002.png").exists()
        # Rich media (ortho projections + wobble video) is saved per val.
        assert (tmp_path / "local" / "projections_00000002.png").exists()
        assert (tmp_path / "local" / "wobble_00000002.mp4").exists()

    def test_resume_from_checkpoint(self, tmp_path):
        cfg = tiny_root_cfg(tmp_path)
        trainer = Trainer(cfg, mesh=small_mesh(), log_fn=lambda *a: None)

        def batches():
            while True:
                yield synthetic_batch(0, batch_size=2, image_shape=(16, 16), num_target=1)

        trainer.fit(data_iter=batches(), max_steps=2)

        trainer2 = Trainer(cfg, mesh=small_mesh(), log_fn=lambda *a: None)
        state2 = trainer2.fit(data_iter=batches(), max_steps=3)
        assert trainer2.global_step == 3
        assert int(state2.step) == 3
