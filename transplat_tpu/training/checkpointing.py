"""Orbax checkpointing: step-tagged saves + restore, pretrained partial loads.

TPU equivalent of the reference's Lightning ModelCheckpoint + wandb artifact
resolution (SURVEY.md §5.4; /root/reference/src/main.py:98-112).
"""

from __future__ import annotations

from pathlib import Path

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str | Path, every_n_steps: int = 20_000, max_to_keep: int | None = None):
        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        self.every_n_steps = every_n_steps
        options = ocp.CheckpointManagerOptions(
            save_interval_steps=every_n_steps,
            max_to_keep=max_to_keep,  # None == save_top_k=-1 (keep all)
        )
        self.manager = ocp.CheckpointManager(self.directory, options=options)

    def maybe_save(self, step: int, state) -> bool:
        return self.manager.save(step, args=ocp.args.StandardSave(state))

    def save(self, step: int, state) -> None:
        if self.manager.latest_step() == step:
            # Resuming at max_steps (or a re-entrant final save) would
            # otherwise raise StepAlreadyExistsError.
            return
        self.manager.save(step, args=ocp.args.StandardSave(state), force=True)
        self.manager.wait_until_finished()

    def restore(self, state_like, step: int | None = None):
        step = self.latest_step() if step is None else step
        if step is None:
            return None
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, state_like)
        return self.manager.restore(step, args=ocp.args.StandardRestore(abstract))

    def latest_step(self) -> int | None:
        return self.manager.latest_step()

    def wait(self) -> None:
        self.manager.wait_until_finished()
