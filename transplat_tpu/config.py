"""Typed configuration tree + experiment presets.

Mirrors the reference's hydra/dacite config system
(/root/reference/src/config.py, config/*.yaml) with plain dataclasses and
optional YAML overrides — no hydra dependency.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any

from .dataset.re10k import DatasetCfg
from .dataset.view_samplers import BoundedCfg
from .loss.losses import LossCfg
from .model.adapter import GaussianAdapterCfg
from .model.decoder import DecoderCfg
from .model.encoder import EncoderCfg, OpacityMappingCfg
from .ops.rasterizer.api import RasterizeConfig


@dataclass
class OptimizerCfg:
    lr: float = 2e-4
    warm_up_steps: int = 2000
    cosine_lr: bool = True
    gradient_clip_val: float = 0.5


@dataclass
class TrainerCfg:
    max_steps: int = 300_001
    # <=1: fraction of max_steps between validations; >1: absolute steps.
    val_check_interval: float = 0.05
    num_sanity_val_steps: int = 2
    val_save_media: bool = True  # ortho projections + wobble video per val
    batch_size: int = 2  # per device
    # Data-loading worker processes per host (reference trains with 10,
    # config/main.yaml:23); 0 = single prefetch thread.
    num_workers: int = 4
    seed: int = 111123


@dataclass
class CheckpointingCfg:
    load: str | None = None
    every_n_train_steps: int = 20_000
    save_dir: str = "outputs/checkpoints"
    pretrained_model: str | None = None
    dav2_weights: str | None = None
    lpips_weights: str | None = None


@dataclass
class TestCfg:
    output_path: str = "outputs/test"
    compute_scores: bool = True
    eval_time_skip_steps: int = 5
    save_image: bool = False
    save_video: bool = False
    save_ply: bool = False  # per-scene 3DGS .ply export in test mode
    evaluation_index: str | None = None
    # Stage-resolved timing (encoder_1..4f taxonomy) via per-stage jits.
    stage_timing: bool = False
    # Workload analysis per scene (Gaussian contribution/redundancy, depth-PDF
    # sharpness, feature-depth correlation) dumped to analysis_*.json —
    # reference TestCfg analyze_* flags (model_wrapper.py:223-276).
    analyze: bool = False


@dataclass
class RootCfg:
    mode: str = "train"
    dataset: DatasetCfg = field(default_factory=DatasetCfg)
    view_sampler: BoundedCfg = field(default_factory=BoundedCfg)
    encoder: EncoderCfg = field(default_factory=EncoderCfg)
    decoder: DecoderCfg = field(default_factory=DecoderCfg)
    loss: LossCfg = field(default_factory=LossCfg)
    optimizer: OptimizerCfg = field(default_factory=OptimizerCfg)
    trainer: TrainerCfg = field(default_factory=TrainerCfg)
    checkpointing: CheckpointingCfg = field(default_factory=CheckpointingCfg)
    test: TestCfg = field(default_factory=TestCfg)


def re10k_config() -> RootCfg:
    """The flagship experiment (config/experiment/re10k.yaml)."""
    return RootCfg(
        dataset=DatasetCfg(
            roots=["datasets/re10k"],
            image_shape=(256, 256),
            near=1.0,
            far=100.0,
            make_baseline_1=False,
            baseline_scale_bounds=False,
        ),
        view_sampler=BoundedCfg(),
        encoder=EncoderCfg(
            d_feature=128,
            num_depth_candidates=128,
            costvolume_unet_feat_dim=128,
            costvolume_unet_channel_mult=(1, 1, 1),
            costvolume_unet_attn_res=(4,),
            depth_unet_feat_dim=32,
            depth_unet_attn_res=(16,),
            depth_unet_channel_mult=(1, 1, 1, 1, 1),
            gaussian_adapter=GaussianAdapterCfg(0.5, 15.0, 4),
            opacity_mapping=OpacityMappingCfg(0.0, 0.0, 1),
            # compute_dtype stays "float32": bf16 activations MEASURED SLOWER
            # on v5e for these U-Nets (refine fwd 7.0 -> 14.3 ms real,
            # cost_unet fwd+bwd 7.9 -> 11.9; scripts/bench_dp_stages.py) —
            # f32 convs already run one-pass bf16 on the MXU, so the casts
            # around every f32 GroupNorm only add converts and break fusions.
            # Level-scope space-to-depth refine U-Net (ops/s2d.py): same
            # function/params, refine fwd+bwd measured 28.7 -> 23.6 ms real
            # (the thin-channel conv backward is XLA's pathological case;
            # s2d gives it full MXU lanes).
            s2d_unet=True,
        ),
        # capacity=4096: worklist drops starve TRAINING GRADIENTS (every
        # dropped pair contributes zero gradient; the reference CUDA
        # rasterizer drops nothing). Measured on the golden 500-step overfit:
        # 22.8 dB at 1024 (~1.2M drops/step, and sitting on a bifurcation —
        # same-seed runs land at 15.5 or 22.8 depending on compilation
        # roundings) vs 36.7 dB at 4096 (zero drops, stable), for +4.5 ms
        # on the 138 ms train step (the composite sweep is count-bounded,
        # so capacity costs memory, not compute). artifacts/testsuite_r5/
        # run_cap*.json. The >=94.8 dB RENDERING-fidelity sweep had masked
        # this: forward drops hide behind saturated transmittance, gradient
        # drops do not.
        decoder=DecoderCfg(rasterize=RasterizeConfig(capacity=4096)),
        loss=LossCfg(mse_weight=1.0, lpips_weight=0.05, lpips_apply_after_step=0),
    )


def acid_config() -> RootCfg:
    cfg = re10k_config()
    cfg.dataset.roots = ["datasets/acid"]
    return cfg


def dtu_config(num_context_views: int = 2) -> RootCfg:
    cfg = re10k_config()
    cfg.dataset.roots = ["datasets/dtu"]
    cfg.dataset.test_times_per_scene = 1
    cfg.encoder = dataclasses.replace(cfg.encoder, num_context_views=num_context_views)
    return cfg


EXPERIMENTS = {
    "re10k": re10k_config,
    "acid": acid_config,
    "dtu": dtu_config,
}


def _apply_overrides(obj: Any, overrides: dict) -> Any:
    """Recursively apply a nested dict of overrides to a dataclass tree."""
    if not dataclasses.is_dataclass(obj):
        return overrides
    updates = {}
    for key, value in overrides.items():
        current = getattr(obj, key)
        if isinstance(value, dict) and dataclasses.is_dataclass(current):
            updates[key] = _apply_overrides(current, value)
        else:
            updates[key] = tuple(value) if isinstance(value, list) and isinstance(
                current, tuple
            ) else value
    return dataclasses.replace(obj, **updates)


def load_config(
    experiment: str = "re10k", yaml_path: str | Path | None = None, **overrides
) -> RootCfg:
    """Build a config from an experiment preset + optional YAML + kw overrides."""
    cfg = EXPERIMENTS[experiment]()
    if yaml_path is not None:
        import yaml

        with open(yaml_path) as f:
            cfg = _apply_overrides(cfg, yaml.safe_load(f) or {})
    if overrides:
        cfg = _apply_overrides(cfg, overrides)
    return cfg
