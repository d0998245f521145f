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
        self.analysis_stats: dict[str, dict] = {}

        image_shape = tuple(cfg.dataset.image_shape)

        def encode(ctx_image, ctx_intr, ctx_extr, ctx_near, ctx_far):
            return self.model.apply(
                self.variables, ctx_image, ctx_intr, ctx_extr, ctx_near, ctx_far
            )

        def decode(gaussians, extr, intr, near, far):
            return decode_splatting(
                gaussians, extr, intr, near, far, image_shape, cfg=cfg.decoder
            )

        self._encode = jax.jit(encode)
        self._decode = jax.jit(decode)
        self._encode_aux = None  # built lazily for PLY export

        # Stage-resolved profiling (reference taxonomy encoder_1..4f..5,
        # model_wrapper.py:381-395) via separately-jitted stage functions.
        self._staged = None
        if getattr(cfg.test, "stage_timing", False):
            from .staged import StagedEncoder

            self._staged = StagedEncoder(cfg.encoder, variables)

    def make_dataset(self, stage: str = "test"):
        index_path = self.cfg.test.evaluation_index
        if index_path is None:
            raise ValueError(
                "cfg.test.evaluation_index is not set: evaluation uses fixed "
                "context/target indices (reference assets/evaluation_index_*"
                ".json). Point it at an index JSON, or create one with "
                "`python -m transplat_tpu.main generate-index`."
            )
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
            out = self._decode(
                gaussians,
                jnp.asarray(tgt["extrinsics"]),
                jnp.asarray(tgt["intrinsics"]),
                jnp.asarray(tgt["near"]),
                jnp.asarray(tgt["far"]),
            )
            color, overflow = out.color, out.overflow
            jax.block_until_ready(color)

        target = jnp.asarray(tgt["image"])
        flat_p = color.reshape(-1, *color.shape[-3:])
        flat_t = target.reshape(-1, *target.shape[-3:])
        result = {
            "psnr": np.asarray(compute_psnr(flat_t, flat_p)).mean().item(),
            "ssim": np.asarray(compute_ssim(flat_t, flat_p)).mean().item(),
            "render_overflow": int(np.asarray(overflow).sum()),
        }
        if self.lpips_params is not None:
            lp = self.lpips.apply({"params": self.lpips_params}, flat_p, flat_t)
            result["lpips"] = np.asarray(lp).mean().item()
        if self.cfg.test.analyze:
            self.analysis_stats[batch["scene"][0]] = self._analyze(
                ctx, gaussians, out.radii
            )
        return result, np.asarray(color)

    def _analyze(self, ctx, gaussians, radii) -> dict:
        """Per-scene workload analysis (the fork's research layer): Gaussian
        contribution/visibility from rasterizer radii, adjacent-depth
        redundancy, depth-PDF sharpness, feature-depth correlation —
        reference hooks model_wrapper.py:223-276 backed by
        scripts/analyze_*.py; math in utils/analysis.py."""
        from ..utils.analysis import (
            adjacent_gaussian_similarity,
            depth_pdf_stats,
            feature_depth_correlation,
            gaussian_contribution_stats,
        )

        if self._encode_aux is None:
            self._build_encode_aux()
        _, aux = self._encode_aux(
            jnp.asarray(ctx["image"]),
            jnp.asarray(ctx["intrinsics"]),
            jnp.asarray(ctx["extrinsics"]),
            jnp.asarray(ctx["near"]),
            jnp.asarray(ctx["far"]),
        )
        opac = jnp.broadcast_to(
            gaussians.opacities[:, None], radii.shape
        )
        return {
            "contribution": gaussian_contribution_stats(radii, opac),
            "adjacent": adjacent_gaussian_similarity(
                aux["depths"], gaussians.opacities
            ),
            "pdf": depth_pdf_stats(aux["pdf"]),
            "feature_depth": feature_depth_correlation(
                aux["features"], aux["depths"]
            ),
        }

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
                self.render_video(batch, out_dir / scene)
            if cfg.test.save_ply:
                self.export_ply(batch, out_dir / scene / "gaussians.ply")

        self.finalize(out_dir)
        return self.scores

    def render_video(self, batch: dict, out_dir, num_frames: int = 30) -> None:
        """Wobble AND interpolation trajectory videos from the context views
        (reference render_video_wobble / render_video_interpolation,
        model_wrapper.py:617-666)."""
        import numpy as np

        from ..utils.image_io import save_video
        from ..visualization.trajectory import (
            generate_wobble,
            interpolate_extrinsics,
            interpolate_intrinsics,
        )

        ctx = batch["context"]
        gaussians = self._encode(
            jnp.asarray(ctx["image"]),
            jnp.asarray(ctx["intrinsics"]),
            jnp.asarray(ctx["extrinsics"]),
            jnp.asarray(ctx["near"]),
            jnp.asarray(ctx["far"]),
        )
        extr = np.asarray(ctx["extrinsics"][0])
        intr0 = np.asarray(ctx["intrinsics"][0])
        t = np.linspace(0, 1, num_frames)

        delta = np.linalg.norm(extr[0, :3, 3] - extr[-1, :3, 3]) * 0.25 + 1e-3
        trajectories = {
            "wobble": (
                generate_wobble(extr[0], np.asarray(delta), t),
                np.repeat(intr0[:1], num_frames, 0),
            ),
            "interpolation": (
                interpolate_extrinsics(extr[0], extr[-1], t),
                interpolate_intrinsics(intr0[0], intr0[-1], t),
            ),
        }
        near = np.full((1, num_frames), float(ctx["near"][0, 0]), np.float32)
        far = np.full((1, num_frames), float(ctx["far"][0, 0]), np.float32)
        out_dir = Path(out_dir)
        for name, (cams, intr) in trajectories.items():
            color = self._decode(
                gaussians,
                jnp.asarray(cams)[None],
                jnp.asarray(np.asarray(intr, np.float32))[None],
                jnp.asarray(near),
                jnp.asarray(far),
            ).color
            frames = [np.asarray(color[0, i]) for i in range(num_frames)]
            save_video(frames, out_dir / f"{name}.mp4")

    def _build_encode_aux(self):
        def encode_aux(image, intr, extr, near, far):
            return self.model.apply(
                self.variables, image, intr, extr, near, far, return_aux=True
            )

        self._encode_aux = jax.jit(encode_aux)

    def export_ply(self, batch: dict, path) -> None:
        """Per-scene 3DGS-standard .ply of the predicted Gaussians (reference
        test artifacts; ply_export.py)."""
        from ..visualization.ply_export import export_ply

        ctx = batch["context"]
        if self._encode_aux is None:
            self._build_encode_aux()
        gaussians, aux = self._encode_aux(
            jnp.asarray(ctx["image"]),
            jnp.asarray(ctx["intrinsics"]),
            jnp.asarray(ctx["extrinsics"]),
            jnp.asarray(ctx["near"]),
            jnp.asarray(ctx["far"]),
        )
        export_ply(
            np.asarray(gaussians.means[0]),
            np.asarray(aux["scales"][0]),
            np.asarray(aux["rotations"][0]),
            np.asarray(gaussians.harmonics[0]),
            np.asarray(gaussians.opacities[0]),
            path,
        )

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
        if self.analysis_stats:
            per = self.analysis_stats
            groups = next(iter(per.values())).keys()
            analysis_avg = {
                g: {
                    k: float(np.mean([per[s][g][k] for s in per]))
                    for k in next(iter(per.values()))[g]
                    if isinstance(next(iter(per.values()))[g][k], (int, float))
                }
                for g in groups
            }
            with open(out_dir / "analysis_per_scene.json", "w") as f:
                json.dump(per, f, indent=2)
            with open(out_dir / "analysis_avg.json", "w") as f:
                json.dump(analysis_avg, f, indent=2)
            print("analysis averages:", json.dumps(analysis_avg, indent=1))
        self.benchmarker.dump(
            out_dir / "benchmark.json", skip_first=self.cfg.test.eval_time_skip_steps
        )
        self.benchmarker.print_table(
            skip_first=self.cfg.test.eval_time_skip_steps
        )
        print("averaged scores:", avg)
