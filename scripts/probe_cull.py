"""Measure worklist-occupancy headroom from EXACT significance culling.

The binning coverage test (pallas_binning._covers) bins a Gaussian into every
tile its bounding CIRCLE (radius = ceil(3*sqrt(lambda_max)), projection.py)
touches. But the composite zeroes every alpha < 1/255 (gaussian_alpha), so a
(tile, gaussian) pair whose MAX alpha over the tile is < 1/255 contributes
exactly zero to the image AND to every gradient — dropping it at binning time
is bit-exact. Three nested exact culls, from cheap to sharp:

  circle    — current behavior (baseline)
  per-axis  — |dx| <= rx and |dy| <= ry with rx = sqrt(2 ln(255 op) Sigma_xx)
              (marginal variances: min over dy of the conic quadratic at fixed
              dx is dx^2 / Sigma_xx), intersected with the circle
  quadratic — exact min of the conic quadratic over the tile pixel rect
              (clamped 1D minimizers on the 4 edges), the sharpest exact cull

This probe trains the golden scene for --steps, projects the final Gaussians
into the target views, and reports total pairs + per-tile count quantiles per
cull, i.e. what bottom-level capacity would give zero drops under each. The
answer decides whether building the cull into the production binning is worth
it (capacity 4096 -> 2048/1024 is ~12-23 ms/step, ROUND5_NOTES).
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


def per_tile_counts(proj, image_shape, tile_size, alpha_min=1.0 / 255.0):
    """Per-tile pair counts under the three exact culls. Returns dict of (T,)."""
    h, w = image_shape
    ntx, nty = w // tile_size, h // tile_size
    mx, my = proj.mean2d[:, 0], proj.mean2d[:, 1]
    a, bq, c = proj.conic[:, 0], proj.conic[:, 1], proj.conic[:, 2]
    r = jnp.where(proj.valid, proj.radius, 0.0)
    op = proj.opacity

    # Tile pixel-center rects: pixels [tx*ts, tx*ts + ts - 1] (integer centers).
    tx = jnp.arange(ntx, dtype=jnp.float32) * tile_size
    ty = jnp.arange(nty, dtype=jnp.float32) * tile_size
    x0 = jnp.tile(tx, nty)[None, :]          # (1, T)
    y0 = jnp.repeat(ty, ntx)[None, :]
    x1, y1 = x0 + (tile_size - 1), y0 + (tile_size - 1)

    def interval(m, rad, lo, hi):
        return (m[:, None] + rad[:, None] >= lo) & (m[:, None] - rad[:, None] <= hi)

    circle = interval(mx, r, x0, x1) & interval(my, r, y0, y1) & (r > 0)[:, None]

    # Per-axis exact: alpha >= alpha_min needs q <= 2 ln(op/alpha_min);
    # min_dy q(dx, dy) = dx^2 * det / c = dx^2 / Sigma_xx.
    det = jnp.maximum(a * c - bq * bq, 1e-20)
    tau = 2.0 * jnp.log(jnp.maximum(op / alpha_min, 1e-20))
    live = (op > alpha_min) & (r > 0)
    rx = jnp.sqrt(jnp.maximum(tau * c / det, 0.0))
    ry = jnp.sqrt(jnp.maximum(tau * a / det, 0.0))
    rx, ry = jnp.minimum(rx, r), jnp.minimum(ry, r)
    axis = interval(mx, rx, x0, x1) & interval(my, ry, y0, y1) & live[:, None] & circle

    # Quadratic exact: min of q(d) = a dx^2 + 2 b dx dy + c dy^2 over the rect.
    dx0, dx1 = x0 - mx[:, None], x1 - mx[:, None]
    dy0, dy1 = y0 - my[:, None], y1 - my[:, None]
    inside_x = (dx0 <= 0) & (dx1 >= 0)
    inside_y = (dy0 <= 0) & (dy1 >= 0)
    cx = jnp.where(inside_x, 0.0, jnp.where(dx0 > 0, dx0, dx1))  # clamp 0 to rect
    cy = jnp.where(inside_y, 0.0, jnp.where(dy0 > 0, dy0, dy1))

    def q(dx, dy):
        return a[:, None] * dx * dx + 2 * bq[:, None] * dx * dy + c[:, None] * dy * dy

    # Edge minimizers: on dx = const, dy* = -b dx / c clamped.
    def edge_x(dxc):
        dy = jnp.clip(-bq[:, None] * dxc / c[:, None], dy0, dy1)
        return q(dxc, dy)

    def edge_y(dyc):
        dx = jnp.clip(-bq[:, None] * dyc / a[:, None], dx0, dx1)
        return q(dx, dyc)

    qmin = jnp.minimum(
        jnp.minimum(edge_x(dx0), edge_x(dx1)),
        jnp.minimum(edge_y(dy0), edge_y(dy1)),
    )
    qmin = jnp.where(inside_x & inside_y, 0.0, qmin)
    quad = (qmin <= tau[:, None]) & live[:, None] & circle

    return {
        "circle": jnp.sum(circle, axis=0),
        "axis": jnp.sum(axis, axis=0),
        "quad": jnp.sum(quad, axis=0),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=150)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--lr", type=float, default=4e-4)
    ap.add_argument("--out", default="outputs/probe_cull.json")
    args = ap.parse_args()

    import dataclasses

    from transplat_tpu.config import load_config
    from transplat_tpu.dataset.loader import golden_scene_batch
    from transplat_tpu.model.encoder import EncoderTranSplat
    from transplat_tpu.ops.rasterizer.projection import project_gaussians
    from transplat_tpu.geometry.projection import get_fov
    from transplat_tpu.training.schedule import make_lr_schedule
    from transplat_tpu.training.step import (
        create_train_state, make_optimizer, make_train_step,
    )

    cfg = load_config("re10k")
    shape = (args.size, args.size)
    batch = golden_scene_batch(image_shape=shape)
    device_batch = {
        "context": {k: jnp.asarray(v) for k, v in batch["context"].items() if k != "index"},
        "target": {k: jnp.asarray(v) for k, v in batch["target"].items() if k != "index"},
    }
    schedule = make_lr_schedule(args.lr, args.steps, cosine=True, warm_up_steps=1)
    optimizer = make_optimizer(schedule, cfg.optimizer.gradient_clip_val)
    state = create_train_state(jax.random.PRNGKey(0), cfg.encoder, optimizer, batch)
    step_fn = make_train_step(
        cfg.encoder, cfg.loss, cfg.decoder, optimizer, shape, donate=False
    )
    rng = jax.random.PRNGKey(1)
    for i in range(args.steps):
        state, metrics = step_fn(state, device_batch, rng)
        if i % 50 == 0:
            print(f"step {i}: psnr {float(metrics['psnr']):.2f}", flush=True)

    model = EncoderTranSplat(cfg.encoder)
    ctx = device_batch["context"]
    (gaussians, _aux), _ = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        ctx["image"], ctx["intrinsics"], ctx["extrinsics"], ctx["near"],
        ctx["far"], global_step=jnp.int32(args.steps), train=False,
        deterministic=True, return_aux=True, mutable=["batch_stats"],
        rngs={"dropout": rng},
    )

    ts = cfg.decoder.rasterize.tile_size
    extr = device_batch["target"]["extrinsics"][0]
    intr = device_batch["target"]["intrinsics"][0]
    near = device_batch["target"]["near"][0]

    @jax.jit
    def counts_for_view(e, i, n, means, covs, sh, opac):
        scale = 1.0 / n
        e = e.at[:3, 3].multiply(scale)
        covs = covs * scale**2
        means = means * scale
        fov = get_fov(i[None])[0]
        proj = project_gaussians(
            means, covs, sh, opac, e, jnp.tan(0.5 * fov[0]), jnp.tan(0.5 * fov[1]),
            shape,
        )
        stats = per_tile_counts(proj, shape, ts)
        # Diagnostics: opacity + anisotropy distribution of live splats.
        live = proj.valid & (proj.radius > 0)
        det = proj.conic[:, 0] * proj.conic[:, 2] - proj.conic[:, 1] ** 2
        sxx = proj.conic[:, 2] / jnp.maximum(det, 1e-20)
        syy = proj.conic[:, 0] / jnp.maximum(det, 1e-20)
        aniso = jnp.maximum(sxx, syy) / jnp.maximum(jnp.minimum(sxx, syy), 1e-20)
        return stats, proj.opacity, jnp.where(live, aniso, 1.0), live

    g = gaussians.means[0]
    report = {"steps": args.steps}
    all_counts = {k: [] for k in ("circle", "axis", "quad")}
    for v in range(extr.shape[0]):
        stats, opac, aniso, live = counts_for_view(
            extr[v], intr[v], near[v], g,
            gaussians.covariances[0], gaussians.harmonics[0], gaussians.opacities[0],
        )
        for k in all_counts:
            all_counts[k].append(np.asarray(stats[k]))
        if v == 0:
            o = np.asarray(opac)[np.asarray(live)]
            an = np.asarray(aniso)[np.asarray(live)]
            report["opacity_quantiles"] = {
                str(q): round(float(np.quantile(o, q)), 4)
                for q in (0.1, 0.25, 0.5, 0.75, 0.9)
            }
            report["frac_opacity_below_1_255"] = round(float((o < 1 / 255).mean()), 4)
            report["aniso_quantiles"] = {
                str(q): round(float(np.quantile(an, q)), 2)
                for q in (0.5, 0.75, 0.9, 0.99)
            }
    for k, per_view in all_counts.items():
        cat = np.stack(per_view)  # (V, T)
        report[k] = {
            "total_pairs": int(cat.sum()),
            "tile_max": int(cat.max()),
            "tile_p99": int(np.quantile(cat, 0.99)),
            "tile_median": int(np.median(cat)),
        }
    _os.makedirs(_os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
