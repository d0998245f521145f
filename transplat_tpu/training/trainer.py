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
        )
        self.ckpt = CheckpointManager(
            cfg.checkpointing.save_dir, cfg.checkpointing.every_n_train_steps
        )
        self._val_fn = None

    def validate(self, state, batch, out_dir: str = "outputs/local") -> dict:
        """Render a validation batch and save a context | GT | prediction grid
        (the LocalLogger media path, model_wrapper.py:532-613)."""
        import jax.numpy as jnp
        import numpy as np

        from ..evaluation.metrics import compute_psnr
        from ..model.decoder import decode_splatting
        from ..model.encoder import EncoderTranSplat
        from ..utils.image_io import save_image
        from ..visualization.layout import add_label, hcat, vcat

        if self._val_fn is None:
            model = EncoderTranSplat(self.cfg.encoder)
            image_shape = tuple(self.cfg.dataset.image_shape)

            def fn(params, batch_stats, ctx, tgt):
                variables = {"params": params, "batch_stats": batch_stats}
                gaussians = model.apply(
                    variables, ctx["image"], ctx["intrinsics"], ctx["extrinsics"],
                    ctx["near"], ctx["far"],
                )
                return decode_splatting(
                    gaussians, tgt["extrinsics"], tgt["intrinsics"],
                    tgt["near"], tgt["far"], image_shape, cfg=self.cfg.decoder,
                ).color

            self._val_fn = jax.jit(fn)

        ctx = {k: jnp.asarray(v) for k, v in batch["context"].items() if k != "index"}
        tgt = {k: jnp.asarray(v) for k, v in batch["target"].items() if k != "index"}
        color = self._val_fn(state.params, state.batch_stats, ctx, tgt)
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
        return {"val_psnr": psnr}

    def _log_metrics(self, record: dict, path: str = "outputs/metrics.jsonl") -> None:
        """Append-only JSONL metric log (the wandb-less observability path)."""
        import json

        p = Path(path)
        p.parent.mkdir(parents=True, exist_ok=True)
        with open(p, "a") as f:
            f.write(json.dumps(record) + "\n")

    def make_dataset(self, stage: str = "train"):
        sampler = ViewSamplerBounded(self.cfg.view_sampler, stage=stage)
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

        if data_iter is None:
            dataset = self.make_dataset("train")

            def epochs():
                while True:
                    # Curriculum: the sampler reads the live global step.
                    yield from dataset.iter_examples(lambda: self.global_step)

            loader = DataLoader(epochs(), cfg.trainer.batch_size)
            data_iter = iter(loader)

        # Initialize from the first batch.
        first = next(data_iter)
        state = create_train_state(
            jax.random.PRNGKey(cfg.trainer.seed), cfg.encoder, self.optimizer, first
        )
        restored = self.ckpt.restore(state)
        if restored is not None:
            # Restored arrays land on a single device; re-replicate over the mesh.
            from ..parallel.mesh import replicated

            state = jax.device_put(restored, replicated(self.mesh))
            self.global_step = int(state.step)
            self.log(f"resumed from step {self.global_step}")

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

            if self.global_step % 50 == 0:
                metrics = {k: float(v) for k, v in metrics.items()}
                dt = time.perf_counter() - t_last
                t_last = time.perf_counter()
                self.log(
                    f"step {self.global_step}: loss={metrics['loss']:.4f} "
                    f"psnr={metrics.get('psnr', 0):.2f} ({dt / 50:.3f}s/it)"
                )
                self._log_metrics({"step": self.global_step, "s_per_it": dt / 50, **metrics})
            self.ckpt.maybe_save(self.global_step, state)

            try:
                batch = next(data_iter)
            except StopIteration:
                break

        self.ckpt.save(self.global_step, state)
        return state
