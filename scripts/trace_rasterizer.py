"""Device-trace attribution of the rasterizer pipeline (xprof, on-chip).

Captures a jax.profiler trace of each rasterizer stage dispatch (binning fwd,
composite fwd, composite fwd+bwd, binning fwd+bwd, full fwd+bwd) at the
flagship workload and parses the xplane trace.json into a per-HLO-op
attribution table: device time, HBM bytes, FLOPs, achieved bandwidth, and —
the number timing alone can't give — the IDLE GAPS between consecutive device
ops (scheduling / DMA-wait holes inside one dispatch).

This is the TPU analog of the reference fork's nsys/ncu kernel attribution
(/root/reference/scripts/profile_hbm_by_stage.py) for the rasterizer that the
CUDA package keeps opaque. Pallas kernels appear as one `tpu_custom_call`
each; XLA ops around them are fully resolved.

Usage (real chip):
  python scripts/trace_rasterizer.py [--views 8] [--gaussians 131072] \
      [--out-dir outputs/raster_trace]
Writes <out-dir>/attribution.txt + attribution.json.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))

import argparse
import collections
import glob
import gzip
import json
import os

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import jax.numpy as jnp


def build_stages(views=8, gaussians=131072, chunk=256, bin_chunk=128,
                 window=4096):
    """Flagship-workload stage closures (same construction as
    bench_binning.py)."""
    from transplat_tpu.geometry.projection import get_fov
    from transplat_tpu.ops.rasterizer.api import RasterizeConfig
    from transplat_tpu.ops.rasterizer.pallas_binning import (
        bin_tree, build_sorted_features, level_caps, tree_plan,
    )
    from transplat_tpu.ops.rasterizer.pallas_composite import composite_pallas
    from transplat_tpu.ops.rasterizer.projection import project_gaussians

    b, g = views, gaussians
    h = w = 256
    cfg = RasterizeConfig(capacity=1024, chunk=chunk, bin_chunk=bin_chunk)
    key = jax.random.PRNGKey(0)
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
        jnp.array([[1.0, 0.0, 0.5], [0.0, 1.0, 0.5], [0.0, 0.0, 1.0]]),
        (b, 3, 3),
    )

    ts = cfg.tile_size
    ntx = nty = 256 // ts
    num_tiles = ntx * nty
    levels = tree_plan(nty, ntx)
    caps = level_caps(levels, g, ts, nty, ntx, cfg.capacity, cfg.bin_chunk)

    def project_sort(means, cov, sh, opac):
        def one(e, i, m, c, s, o):
            fov = get_fov(i[None])[0]
            proj = project_gaussians(
                m, c, s, o, e, jnp.tan(0.5 * fov[0]), jnp.tan(0.5 * fov[1]),
                (h, w),
            )
            return build_sorted_features(proj)

        return jax.vmap(one)(extr, intr, means, cov, sh, opac)

    def binning(feat):
        gdat, counts, _ovf = bin_tree(
            feat, ts, ntx, nty, levels, caps, cfg.bin_chunk, window, False,
            feat.shape[1],
        )
        return gdat, counts

    def comp(gdat, counts):
        return composite_pallas(
            gdat, jnp.minimum(counts, cfg.capacity).reshape(-1),
            ts, ntx, levels, num_tiles, cfg.chunk, False, 3, cfg.capacity,
        )

    feat = jax.jit(project_sort)(means, cov, sh, opac)
    gdat, counts = jax.jit(binning)(feat)

    def comp_grad(gdat, counts):
        def loss(gdat):
            acc, tfin = comp(gdat, counts)
            return jnp.sum(acc**2) + jnp.sum(tfin**2)

        return jax.grad(loss)(gdat)

    def bin_grad(feat):
        def loss(feat):
            gd, _ = binning(feat)
            return jnp.sum(gd**2)

        return jax.grad(loss)(feat)

    def full_grad(means, cov, sh, opac):
        def loss(means, cov, sh, opac):
            feat = project_sort(means, cov, sh, opac)
            gd, counts = binning(feat)
            acc, tfin = comp(gd, counts)
            return jnp.sum(acc**2) + jnp.sum(tfin**2)

        return jax.grad(loss, argnums=(0, 1, 2, 3))(means, cov, sh, opac)

    return {
        "binning_fwd": (jax.jit(binning), (feat,)),
        "binning_fwd_bwd": (jax.jit(bin_grad), (feat,)),
        "composite_fwd": (jax.jit(comp), (gdat, counts)),
        "composite_fwd_bwd": (jax.jit(comp_grad), (gdat, counts)),
        "full_fwd_bwd": (jax.jit(full_grad), (means, cov, sh, opac)),
    }


def sync(tree):
    return float(jnp.ravel(jax.tree.leaves(tree)[0])[0])


def parse_trace(trace_dir):
    """Newest trace.json.gz under trace_dir -> device op event list."""
    paths = sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                  recursive=True),
        key=os.path.getmtime,
    )
    if not paths:
        return None
    data = json.load(gzip.open(paths[-1]))
    events = data.get("traceEvents", [])
    device_pids = {
        e["pid"]
        for e in events
        if e.get("ph") == "M"
        and e.get("name") == "process_name"
        and "TPU" in e.get("args", {}).get("name", "")
    }
    ops, modules = [], []
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        args = e.get("args", {})
        if "hlo_category" in args:
            ops.append(e)
        elif e.get("name", "").startswith("jit_"):
            modules.append(e)
    return {"ops": ops, "modules": modules}


def attribute(parsed):
    """Per-op aggregation + inter-op gap analysis for one traced dispatch."""
    ops = sorted(parsed["ops"], key=lambda e: e["ts"])
    rows = collections.defaultdict(
        lambda: {"us": 0.0, "count": 0, "bytes": 0, "flops": 0}
    )
    for e in ops:
        a = e["args"]
        # Strip SSA indices: fusion.123 -> fusion; keep custom-call targets.
        name = e["name"].split("(")[0]
        base = name.rsplit(".", 1)
        if len(base) == 2 and base[1].isdigit():
            name = base[0]
        cat = a.get("hlo_category", "?")
        key = (name, cat)
        rows[key]["us"] += e["dur"]
        rows[key]["count"] += 1
        rows[key]["bytes"] += int(a.get("bytes_accessed", 0))
        rows[key]["flops"] += int(a.get("model_flops", 0))

    # Gap analysis: idle time between consecutive ops inside the module span.
    gaps = []
    for prev, nxt in zip(ops, ops[1:]):
        gap = nxt["ts"] - (prev["ts"] + prev["dur"])
        if gap > 0.5:  # only gaps > 0.5 us
            gaps.append({
                "after": prev["name"], "before": nxt["name"],
                "us": round(gap, 2),
            })
    total_op_us = sum(e["dur"] for e in ops)
    span_us = (
        ops[-1]["ts"] + ops[-1]["dur"] - ops[0]["ts"] if ops else 0.0
    )
    mod_us = sum(m["dur"] for m in parsed["modules"])
    gaps.sort(key=lambda g: -g["us"])
    return {
        "rows": {f"{k[0]} [{k[1]}]": v for k, v in sorted(
            rows.items(), key=lambda kv: -kv[1]["us"])},
        "total_op_us": round(total_op_us, 1),
        "span_us": round(span_us, 1),
        "idle_us": round(max(span_us - total_op_us, 0.0), 1),
        "module_us": round(mod_us, 1),
        "top_gaps": gaps[:12],
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--views", type=int, default=8)
    ap.add_argument("--gaussians", type=int, default=131072)
    ap.add_argument("--chunk", type=int, default=256)
    ap.add_argument("--bin-chunk", type=int, default=128)
    ap.add_argument("--out-dir", default="outputs/raster_trace")
    args = ap.parse_args()

    os.makedirs(args.out_dir, exist_ok=True)
    stages = build_stages(args.views, args.gaussians, args.chunk,
                          args.bin_chunk)

    report = {}
    lines = []
    for name, (fn, fargs) in stages.items():
        sync(fn(*fargs))  # compile + warm
        tdir = os.path.join(args.out_dir, f"trace_{name}")
        with jax.profiler.trace(tdir):
            sync(fn(*fargs))
        parsed = parse_trace(tdir)
        if parsed is None or not parsed["ops"]:
            lines.append(f"== {name}: no device ops captured ==")
            continue
        att = attribute(parsed)
        report[name] = att
        lines.append(
            f"\n== {name}: device {att['span_us']:.0f} us span, "
            f"{att['total_op_us']:.0f} us in ops, {att['idle_us']:.0f} us idle "
            f"({att['idle_us'] / max(att['span_us'], 1e-9):.0%}) =="
        )
        lines.append(f"{'op [category]':<46}{'us':>9}{'n':>5}{'GB':>8}{'GB/s':>8}{'GFLOP/s':>9}")
        for op, r in list(att["rows"].items())[:14]:
            gb = r["bytes"] / 1e9
            gbps = gb / (r["us"] / 1e6) if r["us"] > 0 else 0.0
            gfps = r["flops"] / 1e9 / (r["us"] / 1e6) if r["us"] > 0 else 0.0
            lines.append(
                f"{op[:45]:<46}{r['us']:>9.1f}{r['count']:>5}{gb:>8.3f}"
                f"{gbps:>8.1f}{gfps:>9.1f}"
            )
        if att["top_gaps"]:
            lines.append("top inter-op gaps:")
            for g in att["top_gaps"][:6]:
                lines.append(
                    f"  {g['us']:>8.1f} us  after {g['after'][:34]:<35} "
                    f"before {g['before'][:34]}"
                )

    text = "\n".join(lines)
    print(text)
    with open(os.path.join(args.out_dir, "attribution.txt"), "w") as f:
        f.write(text + "\n")
    with open(os.path.join(args.out_dir, "attribution.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(f"\nwritten: {args.out_dir}/attribution.{{txt,json}}")


if __name__ == "__main__":
    main()
