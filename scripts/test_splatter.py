"""Visual smoke test: spin a camera around random Gaussians and save frames.

Equivalent of the reference's src/scripts/test_splatter.py:22-101 — renders a
few random Gaussians along a spinning trajectory through the differentiable
rasterizer and exercises SH rotation along the way. Writes PNG frames (and an
MP4 when ffmpeg is available) under --output.

Usage: python scripts/test_splatter.py [--frames 24] [--output outputs/splatter]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from transplat_tpu.geometry.gaussians import build_covariance
from transplat_tpu.geometry.sh import rotate_sh
from transplat_tpu.ops.rasterizer import render
from transplat_tpu.ops.rasterizer.api import RasterizeConfig
from transplat_tpu.utils.image_io import save_image, save_video
from transplat_tpu.visualization.trajectory import generate_spin


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--frames", type=int, default=24)
    parser.add_argument("--gaussians", type=int, default=8)
    parser.add_argument("--resolution", type=int, default=128)
    parser.add_argument("--output", default="outputs/splatter")
    args = parser.parse_args()

    rng = np.random.default_rng(0)
    g = args.gaussians
    means = jnp.asarray(rng.uniform(-0.5, 0.5, (g, 3)), jnp.float32)
    scales = jnp.asarray(rng.uniform(0.05, 0.15, (g, 3)), jnp.float32)
    quats = jnp.asarray(rng.normal(size=(g, 4)), jnp.float32)
    quats = quats / jnp.linalg.norm(quats, axis=-1, keepdims=True)
    cov = build_covariance(scales, quats)
    sh = jnp.asarray(rng.normal(size=(g, 3, 25)) * 0.2, jnp.float32)
    sh = sh.at[:, :, 0].set(rng.uniform(0.5, 2.0, (g, 3)))
    opac = jnp.asarray(rng.uniform(0.6, 1.0, g), jnp.float32)

    # Exercise SH rotation (the reference smoke test does the same).
    rot = jnp.eye(3)
    sh_rot = rotate_sh(sh.reshape(g * 3, 25), jnp.broadcast_to(rot, (g * 3, 3, 3)))
    np.testing.assert_allclose(np.asarray(sh_rot), np.asarray(sh.reshape(g * 3, 25)), atol=1e-4)

    extr = jnp.asarray(generate_spin(args.frames, radius=2.0))  # (T, 4, 4)
    t = extr.shape[0]
    intr = jnp.broadcast_to(
        jnp.asarray([[1.2, 0.0, 0.5], [0.0, 1.2, 0.5], [0.0, 0.0, 1.0]]), (t, 3, 3)
    )
    near = jnp.full((t,), 0.1)
    far = jnp.full((t,), 10.0)
    bg = jnp.zeros((t, 3))
    res = (args.resolution, args.resolution)

    out = jax.jit(
        lambda: render(
            extr, intr, near, far, res, bg,
            jnp.broadcast_to(means, (t, g, 3)),
            jnp.broadcast_to(cov, (t, g, 3, 3)),
            jnp.broadcast_to(sh, (t, g, 3, 25)),
            jnp.broadcast_to(opac, (t, g)),
            scale_invariant=False,
            cfg=RasterizeConfig(capacity=128, chunk=128),
        )
    )()
    frames = np.clip(np.asarray(out.color), 0.0, 1.0)

    outdir = Path(args.output)
    outdir.mkdir(parents=True, exist_ok=True)
    for i, frame in enumerate(frames):
        save_image(frame, outdir / f"frame_{i:03d}.png")
    try:
        save_video(frames, outdir / "spin.mp4")
    except Exception as e:  # ffmpeg optional in this environment
        print(f"video skipped: {e}")
    print(f"wrote {t} frames to {outdir}, mean luminance "
          f"{float(frames.mean()):.3f}, radii>0: {int((out.radii > 0).sum())}")


if __name__ == "__main__":
    main()
