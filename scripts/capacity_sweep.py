"""Capacity-drop quality sweep: pallas (drop-at-capacity) vs exact tiled.

The Pallas binning DROPS the farthest worklist entries when a tile exceeds
its capacity (observable via RenderOutput.overflow); the reference CUDA
rasterizer drops nothing (dynamic per-tile lists, cuda_splatting.py). This
sweep quantifies the quality cost on a DENSE CLUSTERED scene (Gaussians
concentrated on planes — skewed tile occupancy, the adversarial case for
fixed capacities) across capacity x level_headroom, against the exact
`tiled` oracle at unbounded capacity.

Writes a table: capacity, headroom, overflow count, max|mean abs image
error, PSNR vs oracle. Defaults are chosen from (and asserted against) this
table — see tests/test_rasterizer_pallas.py::test_capacity_drop_quality and
artifacts/testsuite_r4/capacity_sweep.txt.

Usage: python scripts/capacity_sweep.py [--views 4] [--gaussians 131072]
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import jax.numpy as jnp
import numpy as np

from transplat_tpu.ops.rasterizer import render
from transplat_tpu.ops.rasterizer.api import RasterizeConfig


def clustered_scene(key, b, g, n_planes: int = 4):
    """Gaussians clustered on fronto-parallel planes: dense tiles where the
    planes project, empty elsewhere — the skewed-occupancy case."""
    ks = jax.random.split(key, 6)
    plane_z = jnp.asarray([2.2, 3.5, 6.0, 12.0])[:n_planes]
    assign = jax.random.randint(ks[0], (b, g), 0, n_planes)
    z = plane_z[assign] + 0.05 * jax.random.normal(ks[1], (b, g))
    # Per-plane xy extents shrink with depth so screen density stays high.
    xy_scale = 0.35 * plane_z[assign][..., None]
    xy = jax.random.normal(ks[2], (b, g, 2)) * xy_scale
    means = jnp.concatenate([xy, z[..., None]], axis=-1)
    scales = jax.random.uniform(ks[3], (b, g, 3), minval=0.01, maxval=0.05)
    cov = jnp.einsum("bgi,ij->bgij", scales**2, jnp.eye(3))
    sh = jax.random.normal(ks[4], (b, g, 3, 25)) * 0.3
    opac = jax.random.uniform(ks[5], (b, g), minval=0.4, maxval=0.95)
    return means, cov, sh, opac


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--views", type=int, default=4)
    ap.add_argument("--gaussians", type=int, default=131072)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--out", default="outputs/capacity_sweep.json")
    args = ap.parse_args()

    b, g = args.views, args.gaussians
    h = w = args.size
    means, cov, sh, opac = clustered_scene(jax.random.PRNGKey(0), b, g)
    extr = jnp.broadcast_to(jnp.eye(4), (b, 4, 4))
    extr = extr.at[:, 0, 3].set(jnp.linspace(-0.2, 0.2, b))
    intr = jnp.broadcast_to(
        jnp.array([[1.0, 0.0, 0.5], [0.0, 1.0, 0.5], [0.0, 0.0, 1.0]]), (b, 3, 3)
    )
    near = jnp.ones((b,))
    far = jnp.full((b,), 100.0)
    bg = jnp.zeros((b, 3))

    def run(cfg):
        out = jax.jit(
            lambda m, c, s, o: render(
                extr, intr, near, far, (h, w), bg, m, c, s, o, cfg=cfg
            )
        )(means, cov, sh, opac)
        img = np.asarray(out.color)
        float(img.ravel()[0])
        return img, int(np.asarray(out.overflow).sum())

    # Exact oracle: tiled mode with capacity >= worst tile (no drops).
    oracle_cfg = RasterizeConfig(mode="tiled", capacity=16384, chunk=256)
    oracle, _ = run(oracle_cfg)
    print("oracle (tiled, cap 16384) done")

    rows = []
    for capacity in (512, 1024, 2048):
        for headroom in (1.25, 1.5, 2.0):
            cfg = RasterizeConfig(
                mode="pallas", capacity=capacity, chunk=256, bin_chunk=128,
                level_headroom=headroom,
            )
            img, overflow = run(cfg)
            err = np.abs(img - oracle)
            mse = float(np.mean((img - oracle) ** 2))
            psnr = -10.0 * np.log10(mse + 1e-12)
            rows.append({
                "capacity": capacity,
                "headroom": headroom,
                "overflow": overflow,
                "max_err": float(err.max()),
                "mean_err": float(err.mean()),
                "psnr_vs_oracle": round(psnr, 2),
            })
            print(
                f"cap {capacity:5d} headroom {headroom:4.2f}: overflow "
                f"{overflow:8d} max_err {err.max():.4f} psnr_vs_oracle "
                f"{psnr:7.2f} dB",
                flush=True,
            )

    _os.makedirs(_os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({"views": b, "gaussians": g, "rows": rows}, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
