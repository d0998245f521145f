"""CLI entry point: python -m transplat_tpu.main <mode> [options].

TPU equivalent of the reference's hydra launcher (/root/reference/src/main.py):
  train           — fit on the configured dataset over the device mesh
  test            — golden-index evaluation with metrics + timing dumps
  generate-index  — build an evaluation index by view overlap
  bench           — rasterizer throughput benchmark (same as bench.py)
  compute-metrics — offline PSNR/SSIM/LPIPS comparison over saved renders
                    (reference: src/scripts/compute_metrics.py)
"""

from __future__ import annotations

import argparse
import json


def main():
    parser = argparse.ArgumentParser(description="transplat_tpu")
    parser.add_argument(
        "mode",
        choices=["train", "test", "generate-index", "bench", "compute-metrics"],
    )
    parser.add_argument("--experiment", default="re10k")
    parser.add_argument("--config", default=None, help="YAML override file")
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--max-steps", type=int, default=None)
    parser.add_argument("--max-scenes", type=int, default=None)
    parser.add_argument("--evaluation-index", default=None)
    parser.add_argument("--output", default=None)
    parser.add_argument("--dp", type=int, default=None, help="data-parallel size")
    parser.add_argument("--sp", type=int, default=1, help="splat-parallel size")
    parser.add_argument("--dataset-root", default=None)
    parser.add_argument(
        "--method",
        action="append",
        default=[],
        help="compute-metrics: name=render_dir (repeatable)",
    )
    parser.add_argument(
        "--ground-truth", default=None, help="compute-metrics: GT render dir"
    )
    parser.add_argument(
        "--side-by-side",
        action="store_true",
        help="compute-metrics: write comparison panels",
    )
    parser.add_argument(
        "--animate",
        action="store_true",
        help="compute-metrics: stitch per-frame side-by-side rows into an "
        "mp4 per scene (reference animate_side_by_side)",
    )
    parser.add_argument(
        "--video-index",
        action="store_true",
        help="generate-index: dense targets for video rendering",
    )
    parser.add_argument(
        "--save-image", action="store_true", help="test: save rendered targets"
    )
    parser.add_argument(
        "--save-video",
        action="store_true",
        help="test: wobble + interpolation trajectory videos per scene",
    )
    parser.add_argument(
        "--save-ply", action="store_true", help="test: per-scene 3DGS .ply"
    )
    parser.add_argument(
        "--analyze",
        action="store_true",
        help="test: per-scene workload analysis (contribution/redundancy/"
        "pdf/feature-depth) dumped as analysis_*.json",
    )
    parser.add_argument(
        "--stage-timing",
        action="store_true",
        help="test: encoder_1..4f stage-resolved timing",
    )
    args = parser.parse_args()

    from .config import load_config

    cfg = load_config(args.experiment, yaml_path=args.config)
    if args.dataset_root:
        cfg.dataset.roots = [args.dataset_root]
    if args.evaluation_index:
        cfg.test.evaluation_index = args.evaluation_index
    if args.checkpoint:
        cfg.checkpointing.load = args.checkpoint
    if args.output:
        cfg.test.output_path = args.output
    for flag in ("save_image", "save_video", "save_ply", "analyze", "stage_timing"):
        if getattr(args, flag):
            setattr(cfg.test, flag, True)

    if args.mode == "train":
        import datetime
        from pathlib import Path

        from .parallel.mesh import make_mesh
        from .training.trainer import Trainer

        # Per-run output dir + latest-run symlink (reference main.py:60-70):
        # --output resumes into an existing run dir; the default is a fresh
        # timestamped dir under outputs/runs. `--checkpoint latest` follows
        # the symlink.
        if args.output:
            run_dir = Path(args.output)
        else:
            stamp = datetime.datetime.now().strftime("%Y-%m-%d_%H-%M-%S")
            run_dir = Path("outputs/runs") / stamp
        run_dir.mkdir(parents=True, exist_ok=True)
        cfg.checkpointing.save_dir = str(run_dir / "checkpoints")
        latest = Path("outputs/latest-run")
        latest.parent.mkdir(parents=True, exist_ok=True)
        # Resolve `--checkpoint latest` BEFORE re-pointing the symlink: it
        # must follow the PREVIOUS run, not the fresh (empty) one.
        if cfg.checkpointing.load == "latest":
            cfg.checkpointing.load = (
                str(latest.resolve() / "checkpoints") if latest.exists() else None
            )
        if latest.is_symlink() or latest.exists():
            latest.unlink()
        latest.symlink_to(run_dir.resolve())
        print(f"run dir: {run_dir}")

        mesh = make_mesh(dp=args.dp, sp=args.sp)
        trainer = Trainer(cfg, mesh=mesh)
        trainer.fit(max_steps=args.max_steps)

    elif args.mode == "test":
        import jax

        from .evaluation.evaluator import Evaluator
        from .model.encoder import EncoderTranSplat
        from .training.checkpointing import CheckpointManager
        from .training.schedule import make_lr_schedule
        from .training.step import create_train_state, make_optimizer

        from .dataset.loader import synthetic_batch

        optimizer = make_optimizer(make_lr_schedule(cfg.optimizer.lr, 1000))
        init_batch = synthetic_batch(
            0, batch_size=1, image_shape=tuple(cfg.dataset.image_shape)
        )
        state = create_train_state(
            jax.random.PRNGKey(0), cfg.encoder, optimizer, init_batch,
            ckpt_cfg=cfg.checkpointing,
        )
        if cfg.checkpointing.pretrained_model or cfg.checkpointing.dav2_weights:
            print(
                "loaded pretrained weights: "
                f"model={cfg.checkpointing.pretrained_model} "
                f"dav2={cfg.checkpointing.dav2_weights}"
            )
        if cfg.checkpointing.load:
            manager = CheckpointManager(cfg.checkpointing.load)
            restored = manager.restore(state)
            if restored is not None:
                state = restored
                print(f"loaded checkpoint at step {int(state.step)}")
        lpips_params = state.lpips_params  # Lightning ckpts embed LPIPS
        if cfg.checkpointing.lpips_weights:
            import numpy as np

            from .training.step import init_lpips_params

            lpips_params = init_lpips_params(
                tuple(cfg.dataset.image_shape),
                np.load(cfg.checkpointing.lpips_weights, allow_pickle=True).item(),
            )
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        evaluator = Evaluator(cfg, variables, lpips_params=lpips_params)
        scores = evaluator.run(max_scenes=args.max_scenes, save_images=cfg.test.save_image)
        print(json.dumps({k: v for k, v in list(scores.items())[:5]}, indent=2))

    elif args.mode == "generate-index":
        from .dataset.re10k import ChunkDataset, convert_poses
        from .dataset.view_samplers import ViewSamplerAll
        from .evaluation.index_generator import (
            EvaluationIndexGenerator,
            IndexGeneratorCfg,
        )
        import numpy as np
        import torch
        from pathlib import Path

        gen = EvaluationIndexGenerator(
            IndexGeneratorCfg(dense_targets=args.video_index)
        )
        for root in cfg.dataset.roots:
            for chunk_path in sorted((Path(root) / "test").glob("*.torch")):
                chunk = torch.load(chunk_path, weights_only=False)
                for raw in chunk:
                    extr, intr = convert_poses(
                        np.asarray(raw["cameras"], np.float32)
                    )
                    gen.process_scene(raw["key"], extr, intr)
        out = args.output or "outputs/evaluation_index.json"
        gen.save(out)
        print(f"wrote {out} with {len(gen.index)} scenes")

    elif args.mode == "compute-metrics":
        from pathlib import Path

        from .evaluation.metric_computer import MetricComputer, MetricComputerCfg

        if not args.ground_truth or not args.method:
            parser.error(
                "compute-metrics requires --ground-truth and at least one "
                "--method name=dir"
            )
        methods = dict(m.split("=", 1) for m in args.method)
        mc_cfg = MetricComputerCfg(
            methods=methods,
            ground_truth=args.ground_truth,
            output_path=args.output or "outputs/metrics",
            side_by_side=args.side_by_side,
            animate_side_by_side=args.animate,
        )
        computer = MetricComputer(mc_cfg)
        scenes = sorted(
            p.name for p in Path(args.ground_truth).iterdir() if p.is_dir()
        )
        for scene in scenes:
            computer.process_scene(scene)
        print(json.dumps(computer.summarize(), indent=2))

    elif args.mode == "bench":
        import importlib.util
        from pathlib import Path

        spec = importlib.util.spec_from_file_location(
            "bench", Path(__file__).parents[1] / "bench.py"
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        mod.main()


if __name__ == "__main__":
    main()
