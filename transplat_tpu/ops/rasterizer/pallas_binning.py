"""Pallas tile-binning kernels: depth-ordered worklist compaction on the MXU.

Replaces the tile binning + per-tile depth sort of the reference CUDA
rasterizer (diff-gaussian-rasterization; see SURVEY.md §2.9 and
/root/reference/src/model/decoder/cuda_splatting.py:100-136) with a
scatter-free, gather-free formulation that maps onto TPU matmul hardware:

  * the depth-sorted Gaussian stream [F, G] (feature-major: F = 7 + C
    sublanes x G lanes) is swept in chunks of CG lanes; a chunk's coverage
    mask against a GROUP of cells is turned into per-cell compaction offsets
    by a triangular-matrix matmul — ONE (2CG, cpw*group) matmul per WINDOW
    plans all cpw chunks at once — and the compacted write becomes a one-hot
    matmul into a 128-aligned window of each cell's worklist
  * per-(cell, chunk) worklist base offsets are precomputed in XLA (one
    coverage reduce + cumsum over chunks) and passed via scalar prefetch;
    the cpw chunk bodies per window are STATICALLY UNROLLED (every slice
    offset is compile-time), so Mosaic schedules MXU routing against VPU
    one-hot staging across chunks with no loop-carried state
  * the tile grid is subdivided as a TREE (default: quadtree levels of 2x2):
    routing MACs scale with the per-level fan-out summed over levels, so
    L levels of 2x2 cost ~L*4 target-lanes per stream element where a flat
    16x16 grid costs 256
  * entries that would land at or beyond a cell's capacity are DROPPED at
    the one-hot stage (their routing slot matches no lane), so a worklist's
    [capacity, width) tail is always zero: child levels and the composite
    can consume worklists full-width with no slicing and no junk

Numerical exactness on the MXU (which computes f32 matmuls as bf16 passes):
  * 0/1 matrices (coverage, triangular, identity, one-hots) and integer
    counts <= 256 are exactly representable in bf16, so the compaction-offset
    matmuls are exact at native speed (hence CG <= 256)
  * geometry rows (means, conic, radius) are routed via an exact 3-way bf16
    decomposition (hi + mid + lo reconstructs any binary32 exactly; each
    part multiplies a 0/1 one-hot, accumulated in f32) — coverage tests and
    the conic quadratic form see bit-exact values at every level; opacity
    and color rows use the 2-way split (<= 2^-18 relative error per level)

The backward pass re-runs the sweep with the one-hot matmul transposed,
routing worklist cotangents back onto stream features — zero scatters.
Feature rows match pallas_composite.gdat (mean, conic, radius, opacity, rgb).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .mxu import split2_bf16, split3_bf16

_ALIGN = 128  # Mosaic lane alignment for dynamic worklist windows

# Mosaic's default scoped-vmem limit is 16 MB; v5e has 128 MB of physical
# VMEM. The unrolled kernels' live temporaries (routing scratches + the
# worklist group block) need headroom beyond the default.
_VMEM_LIMIT = 100 * 1024 * 1024

# Rows 0..N_EXACT-1 of the feature stream (mean_x, mean_y, conic a/b/c,
# radius) are routed with the exact 3-way bf16 split: positions and radius
# feed coverage tests and the conic quadratic form, where errors compound
# across tree levels. Rows >= N_EXACT (opacity, colors) tolerate the 2-way
# split's <= 2^-18 relative error per level — trimming the routing matmul
# from 3F to 2F + N_EXACT rows (MXU cycles scale with M).
N_EXACT = 6

# Debug/profiling hook (scripts/bench_binning.py): truncate the forward chunk
# body after a given stage to attribute kernel time. Trace-time constant;
# production value is "full". Stages: "dma" (stream read only), "plan"
# (+coverage & compaction offsets), "onehot" (+one-hot staging), "full".
ABLATE = "full"


def _covers(mx, my, rx, ry, x0, y0, cw, ch):
    """Cell-coverage predicate; MUST match between XLA (chunk_bases) and the
    kernels — both evaluate it in f32 elementwise on the same cull_radii
    values, so results are identical.

    Covers iff the cell's pixel range [x0, x0+cw) x [y0, y0+ch) intersects
    [mx - rx, mx + rx] x [my - ry, my + ry]: the per-axis significance
    radii from cull_radii (exact cover of every pixel the composite keeps)."""
    return (
        (mx + rx >= x0)
        & (mx - rx < x0 + jnp.float32(cw))
        & (my + ry >= y0)
        & (my - ry < y0 + jnp.float32(ch))
        & (rx > 0.0)
    )


def cull_radii(feat):
    """Per-entry per-axis significance radii for the exact binning cull.

    A (cell, gaussian) pair whose peak alpha over the cell is < 1/255
    contributes exactly zero to the composite — gaussian_alpha zeroes every
    alpha below 1/255 (and the pixels outside the circular radius cutoff),
    and zeroed alphas carry zero gradient — so binning may drop the pair
    with bit-identical rendering and gradients. Per-axis exact bound: the
    min over dy of the conic quadratic q(d) at fixed dx is
    dx^2 * det(conic) / c = dx^2 / Sigma_xx (the marginal variance), so
    alpha = op * exp(-q/2) >= 1/255 requires
    |dx| <= rx = sqrt(2 ln(255 op) Sigma_xx) and symmetrically |dy| <= ry.
    Intersected with the projection radius r (the composite's circular
    cutoff). This is where anisotropic splats win: r is 3 sqrt(lambda_max),
    so an elongated Gaussian's minor axis sheds most of its bounding-circle
    cells (the reference's CUDA rasterizer bins the full bounding rect,
    cuda_splatting.py getRect — it can afford to, with dynamic tile lists).

    The +1e-3 tau margin keeps boundary pairs through the <= 2^-18 relative
    drift the 2-way bf16 routing split puts between the cull-side values
    and the worklist values the composite finally sees.

    feat: (N, F, G) feature-major stream (rows 2..6 = conic a/b/c, radius,
    opacity). Returns (rx, ry), each (N, G) f32, 0 for fully-culled entries
    (opacity < 1/255 or radius 0).
    """
    a, b, c = feat[:, 2], feat[:, 3], feat[:, 4]
    r, op = feat[:, 5], feat[:, 6]
    det = jnp.maximum(a * c - b * b, 1e-20)
    tau = 2.0 * jnp.log(jnp.maximum(op, 1e-20) * 255.0) + 1e-3
    tau = jnp.maximum(tau, 0.0)
    rx = jnp.minimum(jnp.sqrt(jnp.maximum(tau * c, 0.0) / det), r)
    ry = jnp.minimum(jnp.sqrt(jnp.maximum(tau * a, 0.0) / det), r)
    keep = (r > 0.0) & (op * 255.0 >= 1.0 - 1e-3)
    zero = jnp.zeros_like(r)
    return jnp.where(keep, rx, zero), jnp.where(keep, ry, zero)


# --------------------------------------------------------------------------
# XLA side: per-(target, chunk) base offsets, counts and window trip counts
# --------------------------------------------------------------------------


def chunk_bases(feat, tx0, ty0, extent, cg):
    """Exclusive per-(target, chunk) worklist offsets, computed in XLA.

    feat: (N, F, G) feature-major streams; tx0/ty0: (T,) or (N, T) cell
    origins in pixels; extent: (cw, ch) cell size in pixels. Returns bases
    (N, T, NC + 1) int32 where bases[n, t, c] = number of stream entries in
    chunks < c covering target t and bases[n, t, NC] = total coverage.
    """
    cw, ch = extent
    n, _, g = feat.shape
    nc = g // cg
    mx = feat[:, 0, :].reshape(n, nc, cg)[..., None]
    my = feat[:, 1, :].reshape(n, nc, cg)[..., None]
    rxa, rya = cull_radii(feat)
    rx = rxa.reshape(n, nc, cg)[..., None]
    ry = rya.reshape(n, nc, cg)[..., None]
    if tx0.ndim == 1:
        x0 = tx0[None, None, None, :]
        y0 = ty0[None, None, None, :]
    else:
        x0 = tx0[:, None, None, :]
        y0 = ty0[:, None, None, :]
    cov = _covers(mx, my, rx, ry, x0, y0, cw, ch)  # (N, NC, CG, T)
    counts = jnp.sum(cov, axis=2, dtype=jnp.int32)  # (N, NC, T)
    incl = jnp.cumsum(counts, axis=1)
    bases = jnp.concatenate([jnp.zeros_like(incl[:, :1]), incl], axis=1)
    return jnp.moveaxis(bases, 1, 2)  # (N, T, NC + 1)


def pack_bases(bases, capacity):
    """Clamp + (when they fit 15 bits) pack base offsets into int16 pairs
    for SMEM prefetch.

    The kernels only ever use min(b, capacity) and the gate b1 > b0, so
    offsets are clamped to capacity + 1 and, for capacity < 32k, packed
    two-per-int32 — halving the scalar-prefetch footprint (SMEM is 1 MB).
    Levels with larger capacities (few cells -> small bases arrays anyway)
    stay flat int32. Clamping also shortens window_trips: chunks that would
    only write the dropped overflow region are skipped entirely.

    Returns (array, packed: bool); thread `packed` into the kernel statics.
    """
    flat = jnp.minimum(bases.reshape(-1), capacity + 1).astype(jnp.int32)
    if capacity + 1 >= (1 << 15):
        return flat, False
    if flat.shape[0] % 2:
        flat = jnp.concatenate([flat, jnp.zeros((1,), jnp.int32)])
    pair = flat.reshape(-1, 2)
    return pair[:, 0] | (pair[:, 1] << 16), True


def _read_base(bases_ref, j, packed):
    """Read logical element j from a pack_bases array (scalar ops)."""
    if not packed:
        return bases_ref[j]
    word = bases_ref[j // 2]
    return jnp.where(j % 2 == 1, word >> 16, word & 0xFFFF)


def window_trips(bases, ng, group, cpw):
    """Per-(cell, window) chunk trip counts from base offsets.

    bases: (N, T, NC + 1) with T = ng * group. A window's trip is the index
    past the last chunk in which ANY of the cell's targets gains coverage —
    all-empty window tails (e.g. the sorted-to-the-back invisible Gaussians,
    or a worklist's zero tail) are skipped entirely.
    """
    n, t, ncp1 = bases.shape
    nc = ncp1 - 1
    nw = nc // cpw
    delta = bases[:, :, 1:] - bases[:, :, :-1]  # (N, T, NC)
    any_cov = jnp.any(
        (delta > 0).reshape(n, ng, group, nw, cpw), axis=2
    )  # (N, NG, NW, CPW)
    last = jnp.max(
        jnp.where(any_cov, jnp.arange(cpw, dtype=jnp.int32) + 1, 0), axis=-1
    )
    return last.reshape(n * ng, nw).astype(jnp.int32)


# --------------------------------------------------------------------------
# Tree-path decoding (shared with pallas_composite via _decode_path)
# --------------------------------------------------------------------------


def _decode_path(idx, path, parents):
    """Decode a tree cell index into (ty, tx) cell coordinates.

    path: static tuple of (fy, fx) fan-outs, top-first; parents = prod of
    all fan-outs. Works on scalars or arrays (jnp or np), statically
    unrolled."""
    rem = idx
    ty = idx - idx  # zeros of matching type/shape
    tx = idx - idx
    below = parents
    for fy, fx in path:
        below //= fy * fx
        d = rem // below
        rem = rem % below
        ty = ty * fy + d // fx
        tx = tx * fx + d % fx
    return ty, tx


# --------------------------------------------------------------------------
# Kernels
# --------------------------------------------------------------------------


def _target_coords(i, group, *, layout, ntx, ng, path, fy, fx, cw, ch,
                   parents):
    """Per-target cell origins (group, 1) f32 for the current grid cell.

    raster: targets are cells (i % ng) * group + k of an ntx-wide grid.
    tree: stream i belongs to parent (i % parents) whose path is decoded
    over `path`; targets are its fy x fx children of size (cw, ch) px.
    """
    k = jax.lax.broadcasted_iota(jnp.int32, (group, 1), 0)
    if layout == "raster":
        tid = (i % ng) * group + k
        tx = (tid % ntx) * cw
        ty = (tid // ntx) * ch
    else:  # "tree"
        pty, ptx = _decode_path(i % parents, path, parents)
        tx = (ptx * fx + k % fx) * cw
        ty = (pty * fy + k // fx) * ch
    return tx.astype(jnp.float32), ty.astype(jnp.float32)


def _plan_matrix(cg: int):
    """[tri | eye] (CG, 2CG): one matmul computes compaction offsets AND the
    lane->sublane move of the coverage mask. 0/1 entries -> exact in bf16."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (cg, 2 * cg), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (cg, 2 * cg), 1)
    tri = (rows < cols) & (cols < cg)
    eye = rows == (cols - cg)
    return (tri | eye).astype(jnp.float32)


def _bin_fwd_kernel(
    trips_ref, bases_ref, feat_ref, pfeat_ref, gdat_ref, oh_ref, oh2_ref,
    *, layout, ntx, ng, path, fy, fx, cw, ch, parents, group, cg, capacity,
    cpw, ncp1, f_route, packed, route_parts,
):
    i = pl.program_id(0)
    w = pl.program_id(1)
    nw = pl.num_programs(1)
    nbw = cg + _ALIGN

    @pl.when(w == 0)
    def _():
        gdat_ref[...] = jnp.zeros(gdat_ref.shape, gdat_ref.dtype)

    txs, tys = _target_coords(
        i, group, layout=layout, ntx=ntx, ng=ng, path=path, fy=fy, fx=fx,
        cw=cw, ch=ch, parents=parents,
    )
    cols = jax.lax.broadcasted_iota(jnp.int32, (cg, nbw), 1)

    # Batched window plan: ONE (2CG, cpw*group) matmul computes every chunk's
    # compaction offsets and lane->sublane coverage transpose for the whole
    # window (the per-chunk te matmul streamed M = 2CG rows per chunk — ~1 us
    # each; batched, the same M is amortized over cpw chunks). Requires the
    # stream's mx/my/rx/ry rows pre-chunked to (cpw, CG) sublane layout,
    # which XLA prepares (pfeat, incl. the cull_radii pass) — a free
    # relayout at trace level.
    pf = pfeat_ref[0]  # (4*cpw, CG)
    cover3 = _covers(
        pf[0:cpw][:, None, :], pf[cpw : 2 * cpw][:, None, :],
        pf[2 * cpw : 3 * cpw][:, None, :], pf[3 * cpw : 4 * cpw][:, None, :],
        txs[None, :, :], tys[None, :, :], cw, ch,
    ).astype(jnp.float32)  # (cpw, group, CG)
    pe_all = jax.lax.dot_general(
        _plan_matrix(cg), cover3.reshape(cpw * group, cg),
        dimension_numbers=(((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (2CG, cpw * group): rows [:CG] excl counts, [CG:] coverage mask

    def stage_onehot(ci, oh):
        # Stage every target's routing one-hot into one scratch matrix (its
        # lane blocks are disjoint) so the whole group routes with ONE matmul
        # instead of `group` small ones. The coverage mask is folded into the
        # compare key (non-coverers get slot -1, matching no lane), so the
        # wide one-hot build is a single compare + convert — and a target
        # with no coverage produces an all-zero block, no branching needed.
        # Entries whose absolute slot would land at or beyond capacity are
        # dropped the same way (slot >= capacity - w0 matches no lane in
        # [0, nbw) only if ALSO mapped to -1 — the drop keeps the worklist's
        # [capacity, width) tail exactly zero).
        cbase = w * cpw + ci
        for k in range(group):
            bidx = (i * group + k) * ncp1 + cbase
            bq = jnp.minimum(_read_base(bases_ref, bidx, packed), capacity)
            w0 = (bq // _ALIGN) * _ALIGN
            frac = (bq - w0).astype(jnp.float32)
            rel = frac + pe_all[0:cg, ci * group + k : ci * group + k + 1]
            rel = jnp.where(
                pe_all[cg:, ci * group + k : ci * group + k + 1] > 0.5,
                rel, -1.0,
            )
            rel = jnp.where(
                rel >= (capacity - w0).astype(jnp.float32), -1.0, rel
            )
            oh[:, k * nbw : (k + 1) * nbw] = (
                cols == rel.astype(jnp.int32)
            ).astype(jnp.bfloat16)

    def route(ci, oh):
        # Mixed-precision routing of the f_route live rows: geometry rows
        # (first N_EXACT) get the exact 3-way split, opacity/colors the
        # 2-way split — M = 2*f_route + N_EXACT rows (26 for RGB vs 30
        # all-exact; MXU streaming cycles scale with M). route_parts="one"
        # is the bf16 inference tier (below).
        sl = feat_ref[0, 0:f_route, ci * cg : (ci + 1) * cg]
        if route_parts == "one":
            # bf16 inference tier: COLOR rows one raw bf16 pass (linear in
            # the output, ~2^-8 relative = ~4e-3 image error); every other
            # row keeps the 2-way split — measured: 1-pass means are ~0.5 px
            # off at global pixel coordinates, 1-pass conics put
            # 2^-8-relative error on the exponent, and 1-pass OPACITY is
            # amplified through the 1/(1-alpha) transmittance chain (all
            # several 1e-2 in the image). M = f_route + 7.
            ng2 = min(7, f_route)  # mean, conic, radius, opacity
            hi = sl.astype(jnp.bfloat16)
            geo_lo = (
                sl[0:ng2] - hi[0:ng2].astype(jnp.float32)
            ).astype(jnp.bfloat16)
            routed = jax.lax.dot_general(
                jnp.concatenate([hi, geo_lo], axis=0), oh[...],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (f + 7, group * nbw)
            f = f_route
            return jnp.concatenate(
                [routed[0:ng2] + routed[f : f + ng2], routed[ng2:f]], axis=0
            )
        ne = min(N_EXACT, f_route)
        hi = sl.astype(jnp.bfloat16)
        r1 = sl - hi.astype(jnp.float32)
        mid = r1.astype(jnp.bfloat16)
        lo = (r1[0:ne] - mid[0:ne].astype(jnp.float32)).astype(jnp.bfloat16)
        sl3 = jnp.concatenate([hi, mid, lo], axis=0)  # (2f + ne, CG)
        routed = jax.lax.dot_general(
            sl3, oh[...], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (2f + ne, group * nbw)
        f = f_route
        top = routed[:ne] + routed[f : f + ne] + routed[2 * f :]
        rest = routed[ne:f] + routed[f + ne : 2 * f]
        return jnp.concatenate([top, rest], axis=0)

    def store(ci, contrib):
        cbase = w * cpw + ci
        for k in range(group):
            bidx = (i * group + k) * ncp1 + cbase
            b0 = _read_base(bases_ref, bidx, packed)
            bq = jnp.minimum(b0, capacity)
            w0 = pl.multiple_of((bq // _ALIGN) * _ALIGN, _ALIGN)
            ck = contrib[:, k * nbw : (k + 1) * nbw]
            # Unconditional (an uncovered target's contrib block is all
            # zeros; += 0 and rewriting never-written tail blocks with zeros
            # are both no-ops) — a per-target pl.when costs a serialized
            # branch per (chunk, target), which dominates on dense scenes.
            # Only the first 128-block can hold earlier chunks' entries
            # (their writes end at b0 < w0 + 128, since worklist offsets are
            # monotone in the chunk sweep); the rest of the window was never
            # touched — plain stores, no RMW.
            gdat_ref[k, 0:f_route, pl.ds(w0, _ALIGN)] += ck[:, :_ALIGN]
            gdat_ref[k, 0:f_route, pl.ds(w0 + _ALIGN, nbw - _ALIGN)] = (
                ck[:, _ALIGN:]
            )

    # Statically-unrolled chunk sweep in software-pipelined PAIRS: every
    # slice (stream, pe_all columns, one-hot blocks) has a compile-time
    # offset, and within a pair's straight-line body Mosaic overlaps chunk
    # A's MXU routing matmul with chunk B's VPU one-hot staging (disjoint
    # scratches). One predicate per pair keeps branches off the hot path;
    # a beyond-trips tail chunk has no coverage (all-zero one-hot), so its
    # stores are exact no-ops.
    trips = trips_ref[i * nw + w]
    if ABLATE != "full":
        for ci in range(cpw):
            @pl.when(ci < trips)
            def _(ci=ci):
                if ABLATE == "empty":
                    gdat_ref[0, 0:1, 0:128] = jnp.full((1, 128), ci, jnp.float32)
                    return
                if ABLATE == "dma":
                    gdat_ref[0, :, 0:cg] += feat_ref[0, :, ci * cg : (ci + 1) * cg]
                    return
                if ABLATE == "plan":
                    gdat_ref[0, 0:1, 0:cg] += (
                        jnp.sum(pe_all)
                        + feat_ref[0, 0:1, ci * cg : (ci + 1) * cg]
                    )
                    return
                stage_onehot(ci, oh_ref)
                r1 = jax.lax.dot_general(
                    split3_bf16(feat_ref[0, 0:1, ci * cg : (ci + 1) * cg]),
                    oh_ref[...],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                gdat_ref[0, 0:1, 0:cg] += r1[0:1, 0:cg]
        return
    for pj in range(pl.cdiv(cpw, 2)):
        ca, cb = 2 * pj, 2 * pj + 1

        @pl.when(ca < trips)
        def _(ca=ca, cb=cb):
            stage_onehot(ca, oh_ref)
            ctr_a = route(ca, oh_ref)  # async MXU ...
            if cb < cpw:
                stage_onehot(cb, oh2_ref)  # ... overlaps this VPU staging
                ctr_b = route(cb, oh2_ref)
            store(ca, ctr_a)
            if cb < cpw:
                store(cb, ctr_b)


def _bin_bwd_kernel(
    trips_ref, bases_ref, feat_ref, pfeat_ref, dgdat_ref, dfeat_ref, oh_ref,
    dwin_ref, oh2_ref, dwin2_ref,
    *, layout, ntx, ng, path, fy, fx, cw, ch, parents, group, cg, capacity,
    cpw, ncp1, f_route, packed, route_parts,
):
    i = pl.program_id(0)
    w = pl.program_id(1)
    nw = pl.num_programs(1)
    nbw = cg + _ALIGN

    # Chunks past the trip count must still produce zero gradients.
    dfeat_ref[...] = jnp.zeros(dfeat_ref.shape, dfeat_ref.dtype)

    txs, tys = _target_coords(
        i, group, layout=layout, ntx=ntx, ng=ng, path=path, fy=fy, fx=fx,
        cw=cw, ch=ch, parents=parents,
    )
    cols = jax.lax.broadcasted_iota(jnp.int32, (cg, nbw), 1)

    # Batched window plan (see _bin_fwd_kernel).
    pf = pfeat_ref[0]  # (4*cpw, CG)
    cover3 = _covers(
        pf[0:cpw][:, None, :], pf[cpw : 2 * cpw][:, None, :],
        pf[2 * cpw : 3 * cpw][:, None, :], pf[3 * cpw : 4 * cpw][:, None, :],
        txs[None, :, :], tys[None, :, :], cw, ch,
    ).astype(jnp.float32)
    pe_all = jax.lax.dot_general(
        _plan_matrix(cg), cover3.reshape(cpw * group, cg),
        dimension_numbers=(((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (2CG, cpw * group)

    def stage(ci, oh, dwin):
        # Stage one-hots AND cotangent windows for the whole group, then pull
        # gradients back with ONE contraction over the concatenated lane axis
        # (disjoint blocks -> the sum over targets happens inside the matmul).
        # Both scratches must be written unconditionally: a stale NaN times a
        # zero one-hot would still poison the product. Dropped-at-capacity
        # entries get a zero one-hot, matching the forward (they received no
        # slot, so they receive no gradient).
        cbase = w * cpw + ci
        for k in range(group):
            bidx = (i * group + k) * ncp1 + cbase
            bq = jnp.minimum(_read_base(bases_ref, bidx, packed), capacity)
            w0 = pl.multiple_of((bq // _ALIGN) * _ALIGN, _ALIGN)
            frac = (bq - w0).astype(jnp.float32)
            rel = frac + pe_all[0:cg, ci * group + k : ci * group + k + 1]
            rel = jnp.where(
                pe_all[cg:, ci * group + k : ci * group + k + 1] > 0.5,
                rel, -1.0,
            )
            rel = jnp.where(
                rel >= (capacity - w0).astype(jnp.float32), -1.0, rel
            )
            oh[:, k * nbw : (k + 1) * nbw] = (
                cols == rel.astype(jnp.int32)
            ).astype(jnp.bfloat16)
            dwin[:, k * nbw : (k + 1) * nbw] = dgdat_ref[
                k, 0:f_route, pl.ds(w0, nbw)
            ]

    def pull(ci, oh, dwin):
        # Cotangents tolerate the 2-way split (<= 2^-18 relative; gradient
        # checks run at rtol 2e-3): M = 2*f_route rows instead of 3.
        dwin2 = split2_bf16(dwin[...])  # (2*f_route, group * nbw)
        back = jax.lax.dot_general(
            dwin2, oh[...], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (2*f_route, CG)
        dfeat_ref[0, 0:f_route, ci * cg : (ci + 1) * cg] = (
            back[:f_route] + back[f_route : 2 * f_route]
        )

    # Pairs, as in the forward: chunk B's VPU staging overlaps chunk A's MXU
    # pull. A beyond-trips tail chunk writes a zero dfeat slice (zero one-hot
    # against whatever dgdat holds) — identical to the pre-zeroed output.
    trips = trips_ref[i * nw + w]
    for pj in range(pl.cdiv(cpw, 2)):
        ca, cb = 2 * pj, 2 * pj + 1

        @pl.when(ca < trips)
        def _(ca=ca, cb=cb):
            stage(ca, oh_ref, dwin_ref)
            pull(ca, oh_ref, dwin_ref)  # async MXU ...
            if cb < cpw:
                stage(cb, oh2_ref, dwin2_ref)  # ... overlaps this VPU staging
                pull(cb, oh2_ref, dwin2_ref)


# --------------------------------------------------------------------------
# pallas_call wrappers + custom VJP
# --------------------------------------------------------------------------


def _static(kw):
    return dict(
        layout=kw["layout"], ntx=kw["ntx"], ng=kw["ng"], path=kw["path"],
        fy=kw["fy"], fx=kw["fx"], cw=kw["cw"], ch=kw["ch"],
        parents=kw["parents"], group=kw["group"], cg=kw["cg"],
        capacity=kw["capacity"], cpw=kw["cpw"], ncp1=kw["ncp1"],
        f_route=kw["f_route"], packed=kw["packed"],
        route_parts=kw.get("route_parts", "mixed"),
    )


def _plan_feat(stream, nw, cpw, cg):
    """Chunk the mx/my + cull_radii rows to (N*NW, 4*cpw, CG) sublane layout
    for the kernels' batched window planning (an XLA relayout + the O(G)
    cull_radii elementwise pass, ~free). Precomputing rx/ry here keeps the
    in-kernel coverage test bit-identical to the chunk_bases pass without
    any in-kernel transcendentals."""
    n = stream.shape[0]
    rx, ry = cull_radii(stream)
    sel = jnp.stack(
        [stream[:, 0], stream[:, 1], rx, ry], axis=1
    )  # (N, 4, W_total)
    return (
        sel.reshape(n, 4, nw, cpw, cg)
        .transpose(0, 2, 1, 3, 4)
        .reshape(n * nw, 4 * cpw, cg)
    )


def _fwd_call(stream, bases, trips, interpret, **kw):
    n, f, window_total = stream.shape
    ng, group, cg, cpw = kw["ng"], kw["group"], kw["cg"], kw["cpw"]
    window = cpw * cg
    nw = window_total // window
    width = kw["capacity"] + cg + _ALIGN
    nbw = cg + _ALIGN
    kernel = functools.partial(_bin_fwd_kernel, **_static(kw))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n * ng, nw),
        in_specs=[
            pl.BlockSpec(
                (1, f, window),
                lambda i, w, *_: (i // ng, 0, w),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 4 * cpw, cg),
                lambda i, w, *_: (i // ng * nw + w, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (group, f, width), lambda i, w, *_: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((cg, group * nbw), jnp.bfloat16),
            pltpu.VMEM((cg, group * nbw), jnp.bfloat16),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n * ng * group, f, width), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )(trips.reshape(-1), bases, stream, _plan_feat(stream, nw, cpw, cg))


def _bwd_call(stream, bases, trips, dgdat, interpret, **kw):
    n, f, window_total = stream.shape
    ng, group, cg, cpw = kw["ng"], kw["group"], kw["cg"], kw["cpw"]
    f_route = kw["f_route"]
    window = cpw * cg
    nw = window_total // window
    width = kw["capacity"] + cg + _ALIGN
    nbw = cg + _ALIGN
    kernel = functools.partial(_bin_bwd_kernel, **_static(kw))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n * ng, nw),
        in_specs=[
            pl.BlockSpec(
                (1, f, window),
                lambda i, w, *_: (i // ng, 0, w),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 4 * cpw, cg),
                lambda i, w, *_: (i // ng * nw + w, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (group, f, width), lambda i, w, *_: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, f, window), lambda i, w, *_: (i, 0, w), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((cg, group * nbw), jnp.bfloat16),
            pltpu.VMEM((f_route, group * nbw), jnp.float32),
            pltpu.VMEM((cg, group * nbw), jnp.bfloat16),
            pltpu.VMEM((f_route, group * nbw), jnp.float32),
        ],
    )
    # Per-group partial cotangents; caller sums over the ng axis.
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n * ng, f, window_total), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )(trips.reshape(-1), bases, stream, _plan_feat(stream, nw, cpw, cg), dgdat)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def bin_targets(stream, bases, trips, interpret, static):
    """Compact depth-sorted streams into per-target worklists.

    stream: (N, F, W_total) feature-major; bases: flat int32 from
    pack_bases(chunk_bases(...)); trips: (N * ng, NW) int32 from
    window_trips.
    static: hashable dict of kernel geometry (see _static).
    Returns gdat (N * ng * group, F, capacity + cg + 128); columns at or
    beyond `capacity` are exactly zero (overflow entries are dropped at the
    one-hot stage), so worklists are consumable full-width.
    """
    return _fwd_call(stream, bases, trips, interpret, **dict(static))


def _vjp_fwd(stream, bases, trips, interpret, static):
    out = _fwd_call(stream, bases, trips, interpret, **dict(static))
    return out, (stream, bases, trips)


def _vjp_bwd(interpret, static, res, dgdat):
    stream, bases, trips = res
    kw = dict(static)
    if kw.get("route_parts", "mixed") == "one":
        raise NotImplementedError(
            "precision='bf16' binning is an inference-only tier — "
            "differentiate with the default exact-path precision instead"
        )
    partials = _bwd_call(stream, bases, trips, dgdat, interpret, **kw)
    n = stream.shape[0]
    ng = kw["ng"]
    dstream = partials.reshape(n, ng, *stream.shape[1:]).sum(axis=1)
    return (dstream, None, None)


bin_targets.defvjp(_vjp_fwd, _vjp_bwd)


# --------------------------------------------------------------------------
# Public entry points
# --------------------------------------------------------------------------


def _frozen(**kw):
    return tuple(sorted(kw.items()))


def _pick_group(num_tiles: int, width: int, f: int,
                budget_bytes: int = 18 << 20) -> int:
    """Largest divisor of num_tiles (<=16) whose worklist group fits VMEM.

    v5e has 128 MB of physical VMEM and the kernels raise Mosaic's
    scoped-vmem limit (_VMEM_LIMIT) beyond the 16 MB default."""
    for g in (16, 8, 4, 2, 1):
        if num_tiles % g == 0 and g * f * width * 4 <= budget_bytes:
            return g
    return 1


def bin_single_level(
    feat, tile_size, ntx, nty, capacity, cg, window, interpret, f_route,
    precision="f32",
):
    """One-level binning (small/irregular grids): gdat in raster tile order.

    feat: (B, F, G) depth-sorted feature-major, G a multiple of `window`,
    F == f_route live rows. Returns gdat (B*T, F, width), counts (B, T).
    """
    assert capacity % _ALIGN == 0 and cg % _ALIGN == 0 and cg <= 256
    b, f, g = feat.shape
    num_tiles = ntx * nty
    width = capacity + cg + _ALIGN
    group = _pick_group(num_tiles, width, f)
    ng = num_tiles // group
    cpw = window // cg
    t = jnp.arange(num_tiles, dtype=jnp.int32)
    tx0 = ((t % ntx) * tile_size).astype(jnp.float32)
    ty0 = ((t // ntx) * tile_size).astype(jnp.float32)
    bases = chunk_bases(
        jax.lax.stop_gradient(feat), tx0, ty0, (tile_size, tile_size), cg
    )
    clamped = jnp.minimum(bases, capacity + 1)
    trips = window_trips(clamped, ng, group, cpw)
    counts = bases[:, :, -1]
    packed_bases, packed = pack_bases(bases, capacity)
    static = _frozen(
        layout="raster", ntx=ntx, ng=ng, path=(), fy=1, fx=1, cw=tile_size,
        ch=tile_size, parents=1, group=group, cg=cg, capacity=capacity,
        cpw=cpw, ncp1=bases.shape[-1], f_route=f_route, packed=packed,
        route_parts="one" if precision == "bf16" else "mixed",
    )
    gdat = bin_targets(feat, packed_bases, trips, interpret, static)
    return gdat, counts


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def tree_plan(nty: int, ntx: int, max_group: int = 16):
    """Subdivision plan for an (nty, ntx) tile grid: tuple of (fy, fx)
    fan-outs, top-first — (2,2) quadtree levels peeled from the bottom, plus
    whatever irregular remainder as the top level. None if the grid has no
    usable split (single-level binning instead)."""
    k = 0
    ry, rx = nty, ntx
    while ry % 2 == 0 and rx % 2 == 0 and ry * rx > 4:
        ry //= 2
        rx //= 2
        k += 1
    if k == 0:
        return None
    levels = []
    if ry * rx > 1:
        if ry * rx > max_group:
            return None
        levels.append((ry, rx))
    levels.extend([(2, 2)] * k)
    return tuple(levels)


def level_caps(
    levels, g_total: int, tile_size: int, nty: int, ntx: int, capacity: int,
    cg: int, headroom: float = 1.5, budget_bytes: int = 40 << 20,
):
    """Per-level worklist capacities. The bottom level uses the configured
    tile capacity; upper levels get headroom x the average coverage, rounded
    so width = cap + cg + 128 is a multiple of 2048 (rich in power-of-two
    window divisors -> zero-copy level chaining)."""
    caps = []
    cells = 1
    for l, (fy, fx) in enumerate(levels):
        cells *= fy * fx
        if l == len(levels) - 1:
            caps.append(capacity)
            continue
        group_next = levels[l + 1][0] * levels[l + 1][1]
        desired = int(headroom * g_total / cells)
        desired = max(desired, 2 * cg, capacity)
        width = _round_up(desired + cg + _ALIGN, 2048)
        # VMEM bound: the NEXT level holds group_next worklists of this width.
        f_guess = 16
        while group_next * f_guess * width * 4 > budget_bytes and width > 2048:
            width -= 2048
        caps.append(width - cg - _ALIGN)
    return caps


def bin_tree(
    feat,  # (B, F, G) depth-sorted, feature-major; F == f_route
    tile_size: int,
    ntx: int,
    nty: int,
    levels,  # from tree_plan
    caps,  # from level_caps (same length)
    cg: int,
    window: int,  # level-1 stream window (divides G)
    interpret: bool,
    f_route: int,
    precision: str = "f32",
):
    """Multi-level tree binning: stream -> ... -> per-tile worklists.

    Returns (gdat, counts, overflow):
      gdat (B*T, F, capacity + cg + 128) in TREE (path-major) tile order
      counts (B, T) int32 per-tile coverage, same order
      overflow (B,) int32 total entries dropped at any level's capacity
    Tile t's grid position is _decode_path(t, levels, T).
    """
    b = feat.shape[0]
    assert len(caps) == len(levels)
    stream = feat
    win = window
    parents = 1
    overflow = jnp.zeros((b,), jnp.int32)
    counts = None
    cells_y = cells_x = 1
    for l, (fy, fx) in enumerate(levels):
        cap = caps[l]
        assert cap % _ALIGN == 0 and cg % _ALIGN == 0 and cg <= 256
        group = fy * fx
        path = tuple(levels[:l])
        cells_y *= fy
        cells_x *= fx
        ch_px = (nty // cells_y) * tile_size
        cw_px = (ntx // cells_x) * tile_size
        # Static per-(parent, child) cell origins for the XLA bases pass.
        p = np.arange(parents)
        pty, ptx = _decode_path(p, path, parents)
        k = np.arange(group)
        x0 = ((ptx[:, None] * fx + k[None] % fx) * cw_px).astype(np.float32)
        y0 = ((pty[:, None] * fy + k[None] // fx) * ch_px).astype(np.float32)
        tx0 = jnp.asarray(np.tile(x0, (b, 1)))  # (B*parents, group)
        ty0 = jnp.asarray(np.tile(y0, (b, 1)))
        bases = chunk_bases(
            jax.lax.stop_gradient(stream), tx0, ty0, (cw_px, ch_px), cg
        )
        cpw = win // cg
        trips = window_trips(jnp.minimum(bases, cap + 1), 1, group, cpw)
        packed_bases, packed = pack_bases(bases, cap)
        static = _frozen(
            layout="tree", ntx=0, ng=1, path=path, fy=fy, fx=fx, cw=cw_px,
            ch=ch_px, parents=parents, group=group, cg=cg, capacity=cap,
            cpw=cpw, ncp1=bases.shape[-1], f_route=f_route, packed=packed,
            route_parts="one" if precision == "bf16" else "mixed",
        )
        stream = bin_targets(
            stream, packed_bases, trips, interpret, static
        )  # (B*parents*group, F, cap + cg + 128)
        counts = bases[:, :, -1]  # (B*parents, group)
        overflow = overflow + jnp.sum(
            jnp.maximum(counts - cap, 0).reshape(b, -1), axis=1
        ).astype(jnp.int32)
        parents *= group
        if l + 1 < len(levels):
            # Next window: largest power-of-two multiple of cg dividing the
            # new stream width (a multiple of 2048 by level_caps), bounded by
            # the level-1 window.
            width = cap + cg + _ALIGN
            win = cg
            while win * 2 <= min(width, window) and width % (win * 2) == 0:
                win *= 2
    return stream, counts.reshape(b, -1), overflow


@jax.custom_vjp
def _sort_cols_by_key(key, cols):
    """Depth-sort feature columns in ONE variadic sort, with a sort-based VJP.

    Forward: lax.sort carries every feature row (plus an iota that records
    the permutation) through the vectorized sort network in a single pass —
    replacing argsort + row gather (a 131k-row gather runs ~5 GB/s on TPU,
    scalar-core driven). Backward: XLA's autodiff of the equivalent gather
    would be a scatter-add (~150 ms at this shape); sorting the cotangent
    rows by the saved order reproduces the inverse permutation through the
    sort network instead (~5 ms measured)."""
    g = key.shape[0]
    iota = jnp.arange(g, dtype=jnp.int32)
    out = jax.lax.sort((key, iota) + tuple(cols), num_keys=1)
    return tuple(out[2:])


def _sort_cols_fwd(key, cols):
    g = key.shape[0]
    iota = jnp.arange(g, dtype=jnp.int32)
    out = jax.lax.sort((key, iota) + tuple(cols), num_keys=1)
    return tuple(out[2:]), out[1]


def _sort_cols_bwd(order, gs):
    ops = jax.lax.sort((order,) + tuple(gs), num_keys=1)
    return (None, tuple(ops[1:]))


_sort_cols_by_key.defvjp(_sort_cols_fwd, _sort_cols_bwd)


def build_sorted_features(proj, feature=None):
    """Projected Gaussians -> depth-sorted (F, G) feature-major rows.

    F = 7 + C live rows only (mean, conic, radius, opacity, C colors): the
    sort network's cost scales with the payload row count, and the binning
    kernels route exactly these rows."""
    color = proj.rgb if feature is None else feature
    c = color.shape[-1]
    assert c <= 8
    live = proj.valid & (proj.radius > 0.0)
    depth_key = jnp.where(live, proj.depth, jnp.inf)

    big = jnp.float32(1e9)
    cols = [
        jnp.where(live, proj.mean2d[:, 0], big),
        jnp.where(live, proj.mean2d[:, 1], big),
        proj.conic[:, 0],
        proj.conic[:, 1],
        proj.conic[:, 2],
        jnp.where(live, proj.radius, 0.0),
        jnp.where(live, proj.opacity, 0.0),
    ]
    cols.extend(color[:, i] for i in range(c))
    sorted_cols = _sort_cols_by_key(depth_key, tuple(cols))
    return jnp.stack(sorted_cols, axis=0)  # (7 + C, G)
