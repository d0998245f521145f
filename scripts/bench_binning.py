"""Micro-benchmark: rasterizer stage timings on the real chip.

Times projection+sort, hierarchical binning (fwd and fwd+bwd), and composite
(fwd and fwd+bwd) separately at the flagship workload (131072 Gaussians,
256x256, 8 views/dispatch) so kernel work can be attributed. ~25 ms axon
dispatch latency is reported alongside and subtracted in the "real" column.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import argparse
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import jax.numpy as jnp

from transplat_tpu.geometry.projection import get_fov
from transplat_tpu.ops.rasterizer.api import RasterizeConfig
from transplat_tpu.ops.rasterizer.pallas_binning import (
    bin_tree,
    build_sorted_features,
    chunk_bases,
    level_caps,
    tree_plan,
)
from transplat_tpu.ops.rasterizer.pallas_composite import composite_pallas
from transplat_tpu.ops.rasterizer.projection import project_gaussians

TUNNEL_MS = 25.0


def sync(tree):
    return float(jax.tree.leaves(tree)[0].ravel()[0])


def timeit(fn, *args, iters=10):
    sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        sync(out)
    ms = (time.perf_counter() - t0) / iters * 1e3
    return ms, ms - TUNNEL_MS


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--views", type=int, default=8)
    ap.add_argument("--gaussians", type=int, default=131072)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--ablate", action="store_true")
    ap.add_argument("--bin-chunk", type=int, default=128)
    ap.add_argument("--chunk", type=int, default=256)
    ap.add_argument("--window", type=int, default=4096)
    ap.add_argument(
        "--clustered",
        action="store_true",
        help="plane-clustered scene (skewed tile occupancy) instead of the "
        "uniform random cloud — kernel decisions tuned on the uniform scene "
        "alone miss real scenes' occupancy skew (capacity_sweep.py scene)",
    )
    args = ap.parse_args()

    b, g = args.views, args.gaussians
    h = w = 256
    cfg = RasterizeConfig(
        capacity=1024, chunk=args.chunk, bin_chunk=args.bin_chunk,
    )
    key = jax.random.PRNGKey(0)
    if args.clustered:
        from capacity_sweep import clustered_scene

        means, cov, sh, opac = clustered_scene(key, b, g)
    else:
        k = jax.random.split(key, 6)
        means = jnp.concatenate(
            [
                jax.random.uniform(k[0], (b, g, 2), minval=-3.0, maxval=3.0),
                jax.random.uniform(k[1], (b, g, 1), minval=1.0, maxval=12.0),
            ],
            axis=-1,
        )
        scales = jax.random.uniform(k[2], (b, g, 3), minval=0.005, maxval=0.03)
        cov = jnp.einsum("bgi,ij->bgij", scales**2, jnp.eye(3))
        sh = jax.random.normal(k[3], (b, g, 3, 25)) * 0.3
        opac = jax.random.uniform(k[4], (b, g), minval=0.3, maxval=0.95)
    extr = jnp.broadcast_to(jnp.eye(4), (b, 4, 4))
    intr = jnp.broadcast_to(
        jnp.array([[1.0, 0.0, 0.5], [0.0, 1.0, 0.5], [0.0, 0.0, 1.0]]), (b, 3, 3)
    )

    ts = cfg.tile_size
    ntx = nty = 256 // ts
    num_tiles = ntx * nty
    levels = tree_plan(nty, ntx)
    caps = level_caps(levels, g, ts, nty, ntx, cfg.capacity, cfg.bin_chunk)
    print("levels:", levels, "caps:", caps)

    def project_sort(means, cov, sh, opac):
        def one(e, i, m, c, s, o):
            fov = get_fov(i[None])[0]
            proj = project_gaussians(
                m, c, s, o, e, jnp.tan(0.5 * fov[0]), jnp.tan(0.5 * fov[1]), (h, w)
            )
            return build_sorted_features(proj)

        return jax.vmap(one)(extr, intr, means, cov, sh, opac)

    project_sort_j = jax.jit(project_sort)
    feat = project_sort_j(means, cov, sh, opac)
    window = args.window

    def binning(feat):
        gdat, counts, _ovf = bin_tree(
            feat, ts, ntx, nty, levels, caps, cfg.bin_chunk, window, False,
            feat.shape[1],
        )
        return gdat, counts

    binning_j = jax.jit(binning)
    gdat, counts = jax.block_until_ready(binning_j(feat))

    def bin_grad(feat):
        def loss(feat):
            gd, _ = binning(feat)
            return jnp.sum(gd ** 2)

        return jax.grad(loss)(feat)

    def comp(gdat, counts):
        return composite_pallas(
            gdat,
            jnp.minimum(counts, cfg.capacity).reshape(-1),
            ts, ntx, levels, num_tiles, cfg.chunk, False, 3, cfg.capacity,
        )

    def comp_grad(gdat, counts):
        def loss(gdat):
            acc, tfin = comp(gdat, counts)
            return jnp.sum(acc**2) + jnp.sum(tfin**2)

        return jax.grad(loss)(gdat)

    if args.ablate:
        import transplat_tpu.ops.rasterizer.pallas_binning as pb

        print(f"{'binning fwd ablation':24s} {'ms/call':>9s} {'real ms':>9s}")

        # XLA prep only: stub out the Pallas call entirely.
        orig_bin_targets = pb.bin_targets

        def fake_bin_targets(stream, bases, trips, interpret, static):
            kw = dict(static)
            width = kw["capacity"] + kw["cg"] + 128
            return jnp.zeros(
                (stream.shape[0] * kw["ng"] * kw["group"], stream.shape[1], width),
                jnp.float32,
            )

        pb.bin_targets = fake_bin_targets
        ms, real = timeit(jax.jit(lambda f: binning(f)), feat, iters=args.iters)
        print(f"  {'xla-prep':22s} {ms:9.2f} {real:9.2f}")
        pb.bin_targets = orig_bin_targets

        for stage in ("empty", "dma", "plan", "onehot", "full"):
            pb.ABLATE = stage
            fn = jax.jit(lambda f, _s=stage: binning(f))
            ms, real = timeit(fn, feat, iters=args.iters)
            print(f"  {stage:22s} {ms:9.2f} {real:9.2f}")
        pb.ABLATE = "full"
        return

    rows = []
    rows.append(("project+sort fwd", *timeit(project_sort_j, means, cov, sh, opac, iters=args.iters)))

    def ps_grad(means, cov, sh, opac):
        def loss(means, cov, sh, opac):
            return jnp.sum(project_sort(means, cov, sh, opac) ** 2)

        return jax.grad(loss, argnums=(0, 1, 2, 3))(means, cov, sh, opac)

    rows.append(("project+sort fwd+bwd", *timeit(jax.jit(ps_grad), means, cov, sh, opac, iters=args.iters)))

    def bc_grad(feat):
        def loss(feat):
            gd, counts = binning(feat)
            acc, tfin = comp(gd, counts)
            return jnp.sum(acc**2) + jnp.sum(tfin**2)

        return jax.grad(loss)(feat)

    rows.append(("bin+comp fwd+bwd", *timeit(jax.jit(bc_grad), feat, iters=args.iters)))
    rows.append(("binning fwd", *timeit(binning_j, feat, iters=args.iters)))
    rows.append(("binning fwd+bwd", *timeit(jax.jit(bin_grad), feat, iters=args.iters)))
    rows.append(("composite fwd", *timeit(jax.jit(comp), gdat, counts, iters=args.iters)))
    rows.append(("composite fwd+bwd", *timeit(jax.jit(comp_grad), gdat, counts, iters=args.iters)))

    def full(means, cov, sh, opac):
        feat = project_sort(means, cov, sh, opac)
        gd, counts = binning(feat)
        acc, tfin = comp(gd, counts)
        return acc

    def full_grad(means, cov, sh, opac):
        def loss(means, cov, sh, opac):
            return jnp.sum(full(means, cov, sh, opac) ** 2)

        return jax.grad(loss, argnums=(0, 1, 2, 3))(means, cov, sh, opac)

    rows.append(("full fwd", *timeit(jax.jit(full), means, cov, sh, opac, iters=args.iters)))
    rows.append(("full fwd+bwd", *timeit(jax.jit(full_grad), means, cov, sh, opac, iters=args.iters)))

    print(f"{'stage':24s} {'ms/call':>9s} {'real ms':>9s}")
    for name, ms, real in rows:
        print(f"{name:24s} {ms:9.2f} {real:9.2f}")
    mpix = b * h * w / 1e6
    full_real = rows[-1][2]
    print(f"\nfull fwd+bwd: {mpix / full_real * 1e3:.2f} Mpix/s real ({b} views)")


if __name__ == "__main__":
    main()
