"""Training loop: data -> sharded train step -> logging -> checkpoints.

TPU equivalent of /root/reference/src/main.py + model_wrapper training loop:
the Lightning Trainer/DDP machinery becomes a plain loop over a jitted,
mesh-sharded step; the StepTracker curriculum becomes a shared step closure
handed to the data iterator.
"""

from __future__ import annotations

import time
from pathlib import Path

import jax
import numpy as np

from ..config import RootCfg
from ..dataset.loader import DataLoader
from ..dataset.re10k import ChunkDataset
from ..dataset.view_samplers import ViewSamplerBounded
from ..parallel.mesh import make_mesh, shard_batch
from .checkpointing import CheckpointManager
from .schedule import make_lr_schedule
from .step import create_train_state, make_optimizer, make_train_step


class Trainer:
    def __init__(self, cfg: RootCfg, mesh=None, log_fn=print):
        self.cfg = cfg
        self.mesh = mesh if mesh is not None else make_mesh(sp=1)
        self.log = log_fn
        self.global_step = 0

        schedule = make_lr_schedule(
            cfg.optimizer.lr,
            cfg.trainer.max_steps,
            cosine=cfg.optimizer.cosine_lr,
            warm_up_steps=cfg.optimizer.warm_up_steps,
        )
        self.optimizer = make_optimizer(schedule, cfg.optimizer.gradient_clip_val)
        self.step_fn = make_train_step(
            cfg.encoder,
            cfg.loss,
            cfg.decoder,
            self.optimizer,
            tuple(cfg.dataset.image_shape),
            mesh=self.mesh,
            lr_schedule=schedule,
        )
        self.ckpt = CheckpointManager(
            cfg.checkpointing.save_dir, cfg.checkpointing.every_n_train_steps
        )
        self._val_fn = None

    def validate(
        self, state, batch, out_dir: str = "outputs/local", save_media: bool | None = None
    ) -> dict:
        """Render a validation batch; save the context | GT | prediction grid
        plus the rich media set (ortho Gaussian projection with camera frusta
        and a wobble-trajectory video), mirroring the reference's validation
        logging (model_wrapper.py:532-613, 713-790)."""
        import jax.numpy as jnp
        import numpy as np

        from ..evaluation.metrics import compute_psnr
        from ..model.decoder import decode_splatting
        from ..model.encoder import EncoderTranSplat
        from ..utils.image_io import save_image
        from ..visualization.layout import add_label, hcat, vcat

        if save_media is None:
            save_media = self.cfg.trainer.val_save_media
        image_shape = tuple(self.cfg.dataset.image_shape)
        if self._val_fn is None:
            model = EncoderTranSplat(self.cfg.encoder)

            def fn(params, batch_stats, ctx, tgt):
                variables = {"params": params, "batch_stats": batch_stats}
                gaussians = model.apply(
                    variables, ctx["image"], ctx["intrinsics"], ctx["extrinsics"],
                    ctx["near"], ctx["far"],
                )
                color = decode_splatting(
                    gaussians, tgt["extrinsics"], tgt["intrinsics"],
                    tgt["near"], tgt["far"], image_shape, cfg=self.cfg.decoder,
                ).color
                return color, gaussians

            def render_fn(params, batch_stats, ctx, extr, intr, near, far):
                variables = {"params": params, "batch_stats": batch_stats}
                gaussians = model.apply(
                    variables, ctx["image"], ctx["intrinsics"], ctx["extrinsics"],
                    ctx["near"], ctx["far"],
                )
                return decode_splatting(
                    gaussians, extr, intr, near, far, image_shape, cfg=self.cfg.decoder,
                ).color

            self._val_fn = jax.jit(fn)
            self._val_render_fn = jax.jit(render_fn)

        ctx = {k: jnp.asarray(v) for k, v in batch["context"].items() if k != "index"}
        tgt = {k: jnp.asarray(v) for k, v in batch["target"].items() if k != "index"}
        color, gaussians = self._val_fn(state.params, state.batch_stats, ctx, tgt)
        psnr = float(jnp.mean(compute_psnr(tgt["image"].reshape(-1, *tgt["image"].shape[-3:]),
                                           color.reshape(-1, *color.shape[-3:]))))

        context_row = hcat(*[np.asarray(ctx["image"][0, i]) for i in range(ctx["image"].shape[1])])
        gt_row = hcat(*[np.asarray(tgt["image"][0, i]) for i in range(tgt["image"].shape[1])])
        pred_row = hcat(*[np.asarray(color[0, i]) for i in range(color.shape[1])])
        grid = vcat(
            add_label(context_row, "context"),
            add_label(gt_row, "target (gt)"),
            add_label(pred_row, f"prediction (psnr {psnr:.2f})"),
        )
        save_image(grid, Path(out_dir) / f"validation_{self.global_step:08d}.png")
        if save_media:
            self._save_validation_media(state, ctx, gaussians, out_dir)
        return {"val_psnr": psnr}

    def _save_validation_media(self, state, ctx, gaussians, out_dir: str) -> None:
        """Ortho projections with camera frusta + a wobble video
        (reference validation_in_3d.py:25-115, wobble.py)."""
        import jax.numpy as jnp
        import numpy as np

        from ..model.types import Gaussians
        from ..utils.image_io import save_image, save_video
        from ..visualization.layout import add_label, hcat
        from ..visualization.trajectory import generate_wobble
        from ..visualization.validation_3d import draw_cameras, render_orthographic

        g0 = Gaussians(
            means=gaussians.means[:1],
            covariances=gaussians.covariances[:1],
            harmonics=gaussians.harmonics[:1],
            opacities=gaussians.opacities[:1],
        )
        means = np.asarray(g0.means[0])
        lo, hi = np.percentile(means, [2, 98], axis=0)
        center, extent = (lo + hi) / 2, float((hi - lo).max()) + 1e-3

        # Three axis-aligned orthographic views through the cloud center.
        looks = []
        for name, rot in (
            ("xy", np.eye(3)),
            ("xz", np.array([[1, 0, 0], [0, 0, -1], [0, 1, 0.0]])),
            ("yz", np.array([[0, 0, 1], [0, 1, 0], [-1, 0, 0.0]])),
        ):
            e = np.eye(4)
            e[:3, :3] = rot
            e[:3, 3] = center - rot[:, 2] * extent
            looks.append((name, e))
        extr = jnp.asarray(np.stack([e for _, e in looks]))
        ortho = np.asarray(
            render_orthographic(
                Gaussians(
                    means=jnp.broadcast_to(g0.means, (3, *g0.means.shape[1:])),
                    covariances=jnp.broadcast_to(g0.covariances, (3, *g0.covariances.shape[1:])),
                    harmonics=jnp.broadcast_to(g0.harmonics, (3, *g0.harmonics.shape[1:])),
                    opacities=jnp.broadcast_to(g0.opacities, (3, *g0.opacities.shape[1:])),
                ),
                extr,
                width=extent,
                height=extent,
                near=0.0,
                far=2.0 * extent,
                image_shape=(128, 128),
                cfg=self.cfg.decoder.rasterize,
            )
        )
        cams = np.asarray(ctx["extrinsics"][0])
        fx = 0.5 / np.tan(np.radians(0.05))
        view_intr = np.array([[fx, 0, 0.5], [0, fx, 0.5], [0, 0, 1.0]])
        panels = []
        for i, (name, e) in enumerate(looks):
            img = draw_cameras(ortho[i], cams, e, view_intr, frustum_depth=0.2 * extent)
            panels.append(add_label(img, f"ortho {name}"))
        save_image(
            hcat(*panels), Path(out_dir) / f"projections_{self.global_step:08d}.png"
        )

        # Wobble-trajectory video around context camera 0.
        n_frames = 14
        t = np.sin(np.linspace(0.0, 2.0 * np.pi, n_frames, endpoint=False)) * 0.5 + 0.5
        origin_a = np.asarray(ctx["extrinsics"][0, 0, :3, 3])
        origin_b = np.asarray(ctx["extrinsics"][0, -1, :3, 3])
        radius = float(np.linalg.norm(origin_a - origin_b)) * 0.25 + 1e-3
        wobble = generate_wobble(np.asarray(ctx["extrinsics"][0, 0]), radius, t)
        ctx0 = {k: v[:1] for k, v in ctx.items()}
        frames = []
        for f in range(n_frames):
            extr_f = jnp.asarray(wobble[f])[None, None]
            frame = self._val_render_fn(
                state.params,
                state.batch_stats,
                ctx0,
                extr_f,
                ctx0["intrinsics"][:, :1],
                ctx0["near"][:, :1],
                ctx0["far"][:, :1],
            )
            frames.append(np.asarray(frame[0, 0]))
        save_video(frames, Path(out_dir) / f"wobble_{self.global_step:08d}.mp4", fps=7)

    def _log_metrics(self, record: dict, path: str = "outputs/metrics.jsonl") -> None:
        """Append-only JSONL metric log (the wandb-less observability path)."""
        import json

        p = Path(path)
        p.parent.mkdir(parents=True, exist_ok=True)
        with open(p, "a") as f:
            f.write(json.dumps(record) + "\n")

    def make_dataset(self, stage: str = "train"):
        sampler = ViewSamplerBounded(
            self.cfg.view_sampler,
            stage=stage,
            cameras_are_circular=self.cfg.dataset.cameras_are_circular,
        )
        return ChunkDataset(
            self.cfg.dataset,
            stage,
            sampler,
            seed=self.cfg.trainer.seed,
            shard_id=jax.process_index(),
            num_shards=jax.process_count(),
        )

    def fit(self, data_iter=None, max_steps: int | None = None):
        cfg = self.cfg
        max_steps = max_steps if max_steps is not None else cfg.trainer.max_steps

        # Run-config snapshot (the reference dumps the resolved config to the
        # wandb run, main.py:74-94; this is the tracker-less equivalent).
        # Written next to the run's checkpoints so concurrent runs with
        # distinct save_dirs never clobber each other's snapshots.
        import dataclasses, json as _json

        p = Path(cfg.checkpointing.save_dir) / "config.json"
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_text(_json.dumps(dataclasses.asdict(cfg), default=str, indent=1))

        self._shared_step = None
        if data_iter is None:
            probe = self.make_dataset("train")
            if not probe.chunks:
                raise FileNotFoundError(
                    f"no training chunks found under {cfg.dataset.roots} "
                    "(expected <root>/train/*.torch in the RE10K chunk "
                    "format) — without this guard the loader would block "
                    "forever waiting for data"
                )
            nw = getattr(cfg.trainer, "num_workers", 0)
            if nw > 0:
                # Multi-process loading (reference: 10 train workers,
                # config/main.yaml:23). Curriculum state crosses the fork via
                # a shared Value (the reference's StepTracker shared-memory
                # tensor, src/misc/step_tracker.py).
                import multiprocessing as mp

                from ..dataset.loader import MultiWorkerLoader

                self._shared_step = mp.Value("l", self.global_step)
                shared = self._shared_step

                def make_worker_iter(worker_id, _nw=nw):
                    sampler = ViewSamplerBounded(
                        cfg.view_sampler,
                        stage="train",
                        cameras_are_circular=cfg.dataset.cameras_are_circular,
                    )
                    ds = ChunkDataset(
                        cfg.dataset,
                        "train",
                        sampler,
                        seed=cfg.trainer.seed + worker_id,
                        shard_id=jax.process_index() * _nw + worker_id,
                        num_shards=jax.process_count() * _nw,
                    )

                    def epochs():
                        while True:
                            yield from ds.iter_examples(lambda: shared.value)

                    return epochs()

                data_iter = iter(
                    MultiWorkerLoader(make_worker_iter, nw, cfg.trainer.batch_size)
                )
            else:
                dataset = self.make_dataset("train")

                def epochs():
                    while True:
                        # Curriculum: the sampler reads the live global step.
                        yield from dataset.iter_examples(lambda: self.global_step)

                loader = DataLoader(epochs(), cfg.trainer.batch_size)
                data_iter = iter(loader)

        # Held-out validation stream (the reference's ValidationWrapper'd val
        # dataset, data_module.py:90-103: val reads the test split, 1 sample
        # per validation). Falls back to the current training batch only when
        # no held-out chunks exist (synthetic-data drives).
        val_iter = None
        val_dataset = self.make_dataset("val")
        if val_dataset.chunks:
            def val_epochs():
                while True:
                    yield from val_dataset.iter_examples(lambda: self.global_step)

            val_iter = iter(DataLoader(val_epochs(), 1))

        # Initialize from the first batch. LPIPS joins the loss only with
        # calibrated converted weights (random-init LPIPS is a noise term).
        lpips_params = None
        if cfg.checkpointing.lpips_weights:
            from .step import init_lpips_params

            torch_state = np.load(
                cfg.checkpointing.lpips_weights, allow_pickle=True
            ).item()
            lpips_params = init_lpips_params(
                tuple(cfg.dataset.image_shape), torch_state
            )
            self.log(f"loaded LPIPS weights from {cfg.checkpointing.lpips_weights}")

        first = next(data_iter)
        state = create_train_state(
            jax.random.PRNGKey(cfg.trainer.seed),
            cfg.encoder,
            self.optimizer,
            first,
            lpips_params=lpips_params,
            ckpt_cfg=cfg.checkpointing,
        )
        if cfg.checkpointing.pretrained_model or cfg.checkpointing.dav2_weights:
            self.log(
                "loaded pretrained weights: "
                f"model={cfg.checkpointing.pretrained_model} "
                f"dav2={cfg.checkpointing.dav2_weights}"
            )
        restored = self.ckpt.restore(state)
        if restored is None and cfg.checkpointing.load:
            # Warm-start from another run's checkpoint dir (the reference's
            # checkpointing.load, src/main.py:112) when this run dir is fresh.
            restored = CheckpointManager(cfg.checkpointing.load).restore(state)
        if restored is not None:
            # Restored arrays land on a single device; re-replicate over the mesh.
            from ..parallel.mesh import replicated

            state = jax.device_put(restored, replicated(self.mesh))
            self.global_step = int(state.step)
            if self._shared_step is not None:
                self._shared_step.value = self.global_step
            self.log(f"resumed from step {self.global_step}")

        # Sanity validation + interval schedule (the reference's Lightning
        # num_sanity_val_steps / val_check_interval, main.yaml:69-70).
        def next_val_batch(fallback):
            return next(val_iter) if val_iter is not None else fallback

        v = cfg.trainer.val_check_interval
        val_interval = max(1, int(v if v > 1 else v * max_steps))
        for _ in range(max(0, cfg.trainer.num_sanity_val_steps)):
            metrics = self.validate(state, next_val_batch(first))
            self.log(f"sanity validation: psnr={metrics['val_psnr']:.2f}")

        rng = jax.random.PRNGKey(cfg.trainer.seed + 1)
        batch = first
        t_last = time.perf_counter()
        while self.global_step < max_steps:
            device_batch = shard_batch(
                {
                    "context": {k: v for k, v in batch["context"].items() if k != "index"},
                    "target": {k: v for k, v in batch["target"].items() if k != "index"},
                },
                self.mesh,
            )
            rng, step_rng = jax.random.split(rng)
            state, metrics = self.step_fn(state, device_batch, step_rng)
            self.global_step += 1
            if self._shared_step is not None:
                self._shared_step.value = self.global_step

            if self.global_step % 50 == 0:
                metrics = {k: float(v) for k, v in metrics.items()}
                dt = time.perf_counter() - t_last
                t_last = time.perf_counter()
                self.log(
                    f"step {self.global_step}: loss={metrics['loss']:.4f} "
                    f"psnr={metrics.get('psnr', 0):.2f} ({dt / 50:.3f}s/it)"
                )
                self._log_metrics({"step": self.global_step, "s_per_it": dt / 50, **metrics})
            if self.global_step % val_interval == 0:
                val_metrics = self.validate(state, next_val_batch(batch))
                self._log_metrics({"step": self.global_step, **val_metrics})
            self.ckpt.maybe_save(self.global_step, state)

            try:
                batch = next(data_iter)
            except StopIteration:
                break

        self.ckpt.save(self.global_step, state)
        return state
