"""Golden-index evaluation harness.

Mirrors /root/reference/src/model/model_wrapper.py test_step/on_test_end:
iterate fixed evaluation indices, render target views, accumulate
PSNR/SSIM/LPIPS per scene, dump per-scene + averaged score JSONs and the
stage-timing table (timing skips the first `eval_time_skip_steps` scenes).
"""

from __future__ import annotations

import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..config import RootCfg
from ..dataset.loader import DataLoader
from ..dataset.re10k import ChunkDataset
from ..dataset.view_samplers import ViewSamplerEvaluation
from ..loss.vgg import LPIPS
from ..model.decoder import decode_splatting
from ..model.encoder import EncoderTranSplat
from ..utils.benchmarker import Benchmarker
from .metrics import compute_psnr, compute_ssim


class Evaluator:
    def __init__(self, cfg: RootCfg, variables, lpips_params=None):
        self.cfg = cfg
        self.variables = variables
        self.lpips_params = lpips_params
        self.model = EncoderTranSplat(cfg.encoder)
        self.lpips = LPIPS()
        self.benchmarker = Benchmarker()
        self.scores: dict[str, dict] = {}

        image_shape = tuple(cfg.dataset.image_shape)

        def encode(ctx_image, ctx_intr, ctx_extr, ctx_near, ctx_far):
            return self.model.apply(
                self.variables, ctx_image, ctx_intr, ctx_extr, ctx_near, ctx_far
            )

        def decode(gaussians, extr, intr, near, far):
            return decode_splatting(
                gaussians, extr, intr, near, far, image_shape, cfg=cfg.decoder
            ).color

        self._encode = jax.jit(encode)
        self._decode = jax.jit(decode)

        # Stage-resolved profiling (reference taxonomy encoder_1..4f..5,
        # model_wrapper.py:381-395) via separately-jitted stage functions.
        self._staged = None
        if getattr(cfg.test, "stage_timing", False):
            from .staged import StagedEncoder

            self._staged = StagedEncoder(cfg.encoder, variables)

    def make_dataset(self, stage: str = "test"):
        index_path = self.cfg.test.evaluation_index
        sampler = ViewSamplerEvaluation(index_path)
        return ChunkDataset(self.cfg.dataset, stage, sampler)

    def evaluate_batch(self, batch: dict) -> dict:
        ctx, tgt = batch["context"], batch["target"]
        with self.benchmarker.time("encoder"):
            if self._staged is not None:
                gaussians, _ = self._staged.run(ctx, benchmarker=self.benchmarker)
            else:
                gaussians = self._encode(
                    jnp.asarray(ctx["image"]),
                    jnp.asarray(ctx["intrinsics"]),
                    jnp.asarray(ctx["extrinsics"]),
                    jnp.asarray(ctx["near"]),
                    jnp.asarray(ctx["far"]),
                )
            jax.block_until_ready(gaussians.means)
        tv = tgt["image"].shape[1]
        with self.benchmarker.time("decoder", num_calls=tv):
            color = self._decode(
                gaussians,
                jnp.asarray(tgt["extrinsics"]),
                jnp.asarray(tgt["intrinsics"]),
                jnp.asarray(tgt["near"]),
                jnp.asarray(tgt["far"]),
            )
            jax.block_until_ready(color)

        target = jnp.asarray(tgt["image"])
        flat_p = color.reshape(-1, *color.shape[-3:])
        flat_t = target.reshape(-1, *target.shape[-3:])
        result = {
            "psnr": np.asarray(compute_psnr(flat_t, flat_p)).mean().item(),
            "ssim": np.asarray(compute_ssim(flat_t, flat_p)).mean().item(),
        }
        if self.lpips_params is not None:
            lp = self.lpips.apply({"params": self.lpips_params}, flat_p, flat_t)
            result["lpips"] = np.asarray(lp).mean().item()
        return result, np.asarray(color)

    def run(self, max_scenes: int | None = None, save_images: bool = False):
        cfg = self.cfg
        out_dir = Path(cfg.test.output_path)
        out_dir.mkdir(parents=True, exist_ok=True)
        dataset = self.make_dataset()
        loader = DataLoader(dataset, batch_size=1, drop_last=False)

        for i, batch in enumerate(loader):
            if max_scenes is not None and i >= max_scenes:
                break
            scores, color = self.evaluate_batch(batch)
            scene = batch["scene"][0]
            self.scores[scene] = scores
            if save_images:
                from ..utils.image_io import save_image

                for t in range(color.shape[1]):
                    save_image(
                        color[0, t], out_dir / scene / f"color/{t:04d}.png"
                    )
            if cfg.test.save_video:
                self.render_video(batch, out_dir / scene / "video.mp4")

        self.finalize(out_dir)
        return self.scores

    def render_video(self, batch: dict, path, num_frames: int = 30) -> None:
        """Wobble-trajectory video from the first context view
        (model_wrapper.py:713-790 equivalent)."""
        import numpy as np

        from ..utils.image_io import save_video
        from ..visualization.trajectory import generate_wobble, interpolate_intrinsics

        ctx = batch["context"]
        gaussians = self._encode(
            jnp.asarray(ctx["image"]),
            jnp.asarray(ctx["intrinsics"]),
            jnp.asarray(ctx["extrinsics"]),
            jnp.asarray(ctx["near"]),
            jnp.asarray(ctx["far"]),
        )
        extr = np.asarray(ctx["extrinsics"][0])
        delta = np.linalg.norm(extr[0, :3, 3] - extr[-1, :3, 3]) * 0.25 + 1e-3
        t = np.linspace(0, 1, num_frames)
        cams = generate_wobble(extr[0], np.asarray(delta), t)  # (T, 4, 4)
        intr = np.repeat(np.asarray(ctx["intrinsics"][0, :1]), num_frames, 0)
        near = np.full((1, num_frames), float(ctx["near"][0, 0]), np.float32)
        far = np.full((1, num_frames), float(ctx["far"][0, 0]), np.float32)
        color = self._decode(
            gaussians,
            jnp.asarray(cams)[None],
            jnp.asarray(intr)[None],
            jnp.asarray(near),
            jnp.asarray(far),
        )
        frames = [np.asarray(color[0, i]) for i in range(num_frames)]
        save_video(frames, path)

    def finalize(self, out_dir: Path):
        if not self.scores:
            return
        keys = next(iter(self.scores.values())).keys()
        avg = {
            k: float(np.mean([s[k] for s in self.scores.values()])) for k in keys
        }
        with open(out_dir / "scores_per_scene.json", "w") as f:
            json.dump(self.scores, f, indent=2)
        with open(out_dir / "scores_all_avg.json", "w") as f:
            json.dump(avg, f, indent=2)
        self.benchmarker.dump(
            out_dir / "benchmark.json", skip_first=self.cfg.test.eval_time_skip_steps
        )
        self.benchmarker.print_table(
            skip_first=self.cfg.test.eval_time_skip_steps
        )
        print("averaged scores:", avg)
