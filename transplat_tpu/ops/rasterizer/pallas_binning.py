"""Pallas tile-binning kernels: depth-ordered worklist compaction on the MXU.

Replaces the tile binning + per-tile depth sort of the reference CUDA
rasterizer (diff-gaussian-rasterization; see SURVEY.md §2.9 and
/root/reference/src/model/decoder/cuda_splatting.py:100-136) with a
scatter-free, gather-free formulation that maps onto TPU matmul hardware:

  * the depth-sorted Gaussian stream [F, G] (feature-major: F=16 sublanes x G
    lanes) is swept in chunks of CG lanes; a chunk's coverage mask against a
    GROUP of tiles is turned into per-tile compaction offsets by a
    triangular-matrix matmul — ONE (2CG, cpw*group) matmul per WINDOW plans
    all cpw chunks at once — and the compacted write becomes a one-hot
    matmul into a 128-aligned window of each tile's worklist
  * per-(tile, chunk) worklist base offsets are precomputed in XLA (one
    coverage reduce + cumsum over chunks) and passed via scalar prefetch;
    the cpw chunk bodies per window are STATICALLY UNROLLED (every slice
    offset is compile-time), so Mosaic schedules MXU routing against VPU
    one-hot staging across chunks with no loop-carried state
  * only the f_route live feature rows (7 geometry + C color) are routed:
    MXU streaming cycles scale with M = 3*f_route (30 for RGB, not 48)
  * two levels (64px supertiles -> 16px tiles) keep the per-level target
    fan-out at <=16, bounding total routing work

Numerical exactness on the MXU (which computes f32 matmuls as bf16 passes):
  * 0/1 matrices (coverage, triangular, identity, one-hots) and integer
    counts <= 256 are exactly representable in bf16, so the compaction-offset
    matmuls are exact at native speed (hence CG <= 256)
  * feature values are routed via an exact 3-way bf16 decomposition
    (hi + mid + lo reconstructs any binary32 exactly; each part multiplies a
    0/1 one-hot, accumulated in f32) — the binned worklists are bit-exact
    copies of the input features

The backward pass re-runs the sweep with the one-hot matmul transposed,
routing worklist cotangents back onto stream features — zero scatters.
Feature rows match pallas_composite.gdat (mean, conic, radius, opacity, rgb).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .mxu import split3_bf16
from .pallas_composite import F

_ALIGN = 128  # Mosaic lane alignment for dynamic worklist windows

# Mosaic's default scoped-vmem limit is 16 MB; v5e has 128 MB of physical
# VMEM. The unrolled kernels' live temporaries (routing scratches + the
# worklist group block) need headroom beyond the default.
_VMEM_LIMIT = 100 * 1024 * 1024

# Debug/profiling hook (scripts/bench_binning.py): truncate the forward chunk
# body after a given stage to attribute kernel time. Trace-time constant;
# production value is "full". Stages: "dma" (stream read only), "plan"
# (+coverage & compaction offsets), "onehot" (+one-hot staging), "full".
ABLATE = "full"


def _covers(mx, my, r, x0, y0, tile_size):
    """Tile-coverage predicate; MUST match between XLA (chunk_bases) and the
    kernels — both evaluate it in f32 elementwise, so results are identical.

    Covers iff the tile's pixel range intersects [m - r, m + r] in both axes
    (exact cover of the circular alpha cutoff)."""
    ts = jnp.float32(tile_size)
    return (
        (mx + r >= x0)
        & (mx - r < x0 + ts)
        & (my + r >= y0)
        & (my - r < y0 + ts)
        & (r > 0.0)
    )


# --------------------------------------------------------------------------
# XLA side: per-(target, chunk) base offsets, counts and window trip counts
# --------------------------------------------------------------------------


def chunk_bases(feat, tx0, ty0, tile_size, cg):
    """Exclusive per-(target, chunk) worklist offsets, computed in XLA.

    feat: (N, F, G) feature-major streams; tx0/ty0: (T,) or (N, T) tile
    origins in pixels. Returns bases (N, T, NC + 1) int32 where
    bases[n, t, c] = number of stream entries in chunks < c covering target t
    and bases[n, t, NC] = total coverage count of target t.
    """
    n, _, g = feat.shape
    nc = g // cg
    mx = feat[:, 0, :].reshape(n, nc, cg)[..., None]
    my = feat[:, 1, :].reshape(n, nc, cg)[..., None]
    r = feat[:, 5, :].reshape(n, nc, cg)[..., None]
    if tx0.ndim == 1:
        x0 = tx0[None, None, None, :]
        y0 = ty0[None, None, None, :]
    else:
        x0 = tx0[:, None, None, :]
        y0 = ty0[:, None, None, :]
    cov = _covers(mx, my, r, x0, y0, tile_size)  # (N, NC, CG, T)
    counts = jnp.sum(cov, axis=2, dtype=jnp.int32)  # (N, NC, T)
    incl = jnp.cumsum(counts, axis=1)
    bases = jnp.concatenate([jnp.zeros_like(incl[:, :1]), incl], axis=1)
    return jnp.moveaxis(bases, 1, 2)  # (N, T, NC + 1)


def pack_bases(bases, capacity):
    """Clamp + pack base offsets into int16 pairs for SMEM prefetch.

    The kernels only ever use min(b, capacity) and the gate b1 > b0, so
    offsets are clamped to capacity + 1 (<= 16385, fits 15 bits) and packed
    two-per-int32 — halving the scalar-prefetch footprint (SMEM is 1 MB).
    Clamping also shortens window_trips: chunks that would only write the
    discarded overflow region are skipped entirely.
    """
    flat = jnp.minimum(bases.reshape(-1), capacity + 1).astype(jnp.int32)
    if flat.shape[0] % 2:
        flat = jnp.concatenate([flat, jnp.zeros((1,), jnp.int32)])
    pair = flat.reshape(-1, 2)
    return pair[:, 0] | (pair[:, 1] << 16)


def _read_base(bases_ref, j):
    """Read logical element j from a pack_bases array (scalar ops)."""
    word = bases_ref[j // 2]
    return jnp.where(j % 2 == 1, word >> 16, word & 0xFFFF)


def window_trips(bases, ng, group, cpw):
    """Per-(cell, window) chunk trip counts from base offsets.

    bases: (N, T, NC + 1) with T = ng * group. A window's trip is the index
    past the last chunk in which ANY of the cell's targets gains coverage —
    all-empty window tails (e.g. the sorted-to-the-back invisible Gaussians)
    are skipped entirely.
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
# Kernels
# --------------------------------------------------------------------------


def _target_coords(i, group, *, layout, ntx, sntx, ng, nsup, tile_size):
    """Per-target tile origins (group, 1) f32 for the current grid cell."""
    k = jax.lax.broadcasted_iota(jnp.int32, (group, 1), 0)
    if layout == "raster":
        tid = (i % ng) * group + k
        tx = (tid % ntx) * tile_size
        ty = (tid // ntx) * tile_size
    else:  # "sub4x4": the 16 tiles of supertile s, row-major within it
        s = i % nsup
        tx = ((s % sntx) * 4 + k % 4) * tile_size
        ty = ((s // sntx) * 4 + k // 4) * tile_size
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
    *, tile_size, ntx, sntx, ng, nsup, layout, group, cg, capacity, cpw, ncp1,
    f_route,
):
    i = pl.program_id(0)
    w = pl.program_id(1)
    nw = pl.num_programs(1)
    nbw = cg + _ALIGN

    @pl.when(w == 0)
    def _():
        gdat_ref[...] = jnp.zeros(gdat_ref.shape, gdat_ref.dtype)

    txs, tys = _target_coords(
        i, group, layout=layout, ntx=ntx, sntx=sntx, ng=ng, nsup=nsup,
        tile_size=tile_size,
    )
    cols = jax.lax.broadcasted_iota(jnp.int32, (cg, nbw), 1)

    # Batched window plan: ONE (2CG, cpw*group) matmul computes every chunk's
    # compaction offsets and lane->sublane coverage transpose for the whole
    # window (the per-chunk te matmul streamed M = 2CG rows per chunk — ~1 us
    # each; batched, the same M is amortized over cpw chunks). Requires the
    # stream's mx/my/r rows pre-chunked to (cpw, CG) sublane layout, which
    # XLA prepares (pfeat) — a free relayout at trace level.
    pf = pfeat_ref[0]  # (3*cpw, CG)
    cover3 = _covers(
        pf[0:cpw][:, None, :], pf[cpw : 2 * cpw][:, None, :],
        pf[2 * cpw : 3 * cpw][:, None, :],
        txs[None, :, :], tys[None, :, :], tile_size,
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
        cbase = w * cpw + ci
        for k in range(group):
            bidx = (i * group + k) * ncp1 + cbase
            bq = jnp.minimum(_read_base(bases_ref, bidx), capacity)
            frac = (bq - (bq // _ALIGN) * _ALIGN).astype(jnp.float32)
            rel = frac + pe_all[0:cg, ci * group + k : ci * group + k + 1]
            rel = jnp.where(
                pe_all[cg:, ci * group + k : ci * group + k + 1] > 0.5,
                rel, -1.0,
            )
            oh[:, k * nbw : (k + 1) * nbw] = (
                cols == rel.astype(jnp.int32)
            ).astype(jnp.bfloat16)

    def route(ci, oh):
        # Only the f_route live feature rows are routed: M = 3*f_route rows
        # (30 for RGB) instead of 3*F = 48 — MXU streaming cycles scale with
        # M, and the dead padding rows routed nothing but zeros.
        sl = feat_ref[0, 0:f_route, ci * cg : (ci + 1) * cg]
        sl3 = split3_bf16(sl)  # (3*f_route, CG) bf16
        routed = jax.lax.dot_general(
            sl3, oh[...], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (3*f_route, group * nbw)
        return (
            routed[:f_route]
            + routed[f_route : 2 * f_route]
            + routed[2 * f_route :]
        )

    def store(ci, contrib):
        cbase = w * cpw + ci
        for k in range(group):
            bidx = (i * group + k) * ncp1 + cbase
            b0 = _read_base(bases_ref, bidx)
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
            # touched — plain stores, no RMW. Rows f_route..F stay zero from
            # the w == 0 initialization.
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
    *, tile_size, ntx, sntx, ng, nsup, layout, group, cg, capacity, cpw, ncp1,
    f_route,
):
    i = pl.program_id(0)
    w = pl.program_id(1)
    nw = pl.num_programs(1)
    nbw = cg + _ALIGN

    # Chunks past the trip count must still produce zero gradients.
    dfeat_ref[...] = jnp.zeros(dfeat_ref.shape, dfeat_ref.dtype)

    txs, tys = _target_coords(
        i, group, layout=layout, ntx=ntx, sntx=sntx, ng=ng, nsup=nsup,
        tile_size=tile_size,
    )
    cols = jax.lax.broadcasted_iota(jnp.int32, (cg, nbw), 1)

    # Batched window plan (see _bin_fwd_kernel).
    pf = pfeat_ref[0]  # (3*cpw, CG)
    cover3 = _covers(
        pf[0:cpw][:, None, :], pf[cpw : 2 * cpw][:, None, :],
        pf[2 * cpw : 3 * cpw][:, None, :],
        txs[None, :, :], tys[None, :, :], tile_size,
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
        # zero one-hot would still poison the product.
        cbase = w * cpw + ci
        for k in range(group):
            bidx = (i * group + k) * ncp1 + cbase
            bq = jnp.minimum(_read_base(bases_ref, bidx), capacity)
            w0 = pl.multiple_of((bq // _ALIGN) * _ALIGN, _ALIGN)
            frac = (bq - w0).astype(jnp.float32)
            rel = frac + pe_all[0:cg, ci * group + k : ci * group + k + 1]
            rel = jnp.where(
                pe_all[cg:, ci * group + k : ci * group + k + 1] > 0.5,
                rel, -1.0,
            )
            oh[:, k * nbw : (k + 1) * nbw] = (
                cols == rel.astype(jnp.int32)
            ).astype(jnp.bfloat16)
            dwin[:, k * nbw : (k + 1) * nbw] = dgdat_ref[
                k, 0:f_route, pl.ds(w0, nbw)
            ]

    def pull(ci, oh, dwin):
        dwin3 = split3_bf16(dwin[...])  # (3*f_route, group * nbw)
        back = jax.lax.dot_general(
            dwin3, oh[...], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (3*f_route, CG)
        dfeat_ref[0, 0:f_route, ci * cg : (ci + 1) * cg] = (
            back[:f_route]
            + back[f_route : 2 * f_route]
            + back[2 * f_route :]
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
        tile_size=kw["tile_size"], ntx=kw["ntx"], sntx=kw["sntx"],
        ng=kw["ng"], nsup=kw["nsup"], layout=kw["layout"], group=kw["group"],
        cg=kw["cg"], capacity=kw["capacity"], cpw=kw["cpw"], ncp1=kw["ncp1"],
        f_route=kw["f_route"],
    )


def _plan_feat(stream, nw, cpw, cg):
    """Chunk the mx/my/r stream rows to (N*NW, 3*cpw, CG) sublane layout for
    the kernels' batched window planning (an XLA relayout, ~free)."""
    n = stream.shape[0]
    sel = jnp.stack(
        [stream[:, 0], stream[:, 1], stream[:, 5]], axis=1
    )  # (N, 3, W_total)
    return (
        sel.reshape(n, 3, nw, cpw, cg)
        .transpose(0, 2, 1, 3, 4)
        .reshape(n * nw, 3 * cpw, cg)
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
                (1, 3 * cpw, cg),
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
                (1, 3 * cpw, cg),
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
    Returns gdat (N * ng * group, F, capacity + cg + 128); only the first
    `capacity` columns are clean — slice before compositing.
    """
    return _fwd_call(stream, bases, trips, interpret, **dict(static))


def _vjp_fwd(stream, bases, trips, interpret, static):
    out = _fwd_call(stream, bases, trips, interpret, **dict(static))
    return out, (stream, bases, trips)


def _vjp_bwd(interpret, static, res, dgdat):
    stream, bases, trips = res
    kw = dict(static)
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


def _pick_group(num_tiles: int, width: int, budget_bytes: int = 18 << 20) -> int:
    """Largest divisor of num_tiles (<=16) whose worklist group fits VMEM.

    The budget (18 MB) allows a full group=16 at the phase-1 supertile width
    (one stream sweep instead of ng=4): v5e has 128 MB of physical VMEM and
    the kernels raise Mosaic's scoped-vmem limit (_VMEM_LIMIT) accordingly —
    the 16 MB default limit only fits group=4 at that width."""
    for g in (16, 8, 4, 2, 1):
        if num_tiles % g == 0 and g * F * width * 4 <= budget_bytes:
            return g
    return 1


def bin_single_level(
    feat, tile_size, ntx, nty, capacity, cg, window, interpret, f_route=15
):
    """One-level binning (small images): gdat in raster tile order + counts.

    feat: (B, F, G) depth-sorted feature-major, G a multiple of `window`.
    f_route: number of live feature rows (7 geometry + color channels); rows
    beyond it are left zero in the worklists.
    Returns gdat (B*T, F, width), counts (B, T) int32.
    """
    assert capacity % _ALIGN == 0 and cg % _ALIGN == 0 and cg <= 256
    b, _, g = feat.shape
    num_tiles = ntx * nty
    width = capacity + cg + _ALIGN
    group = _pick_group(num_tiles, width)
    ng = num_tiles // group
    cpw = window // cg
    t = jnp.arange(num_tiles, dtype=jnp.int32)
    tx0 = ((t % ntx) * tile_size).astype(jnp.float32)
    ty0 = ((t // ntx) * tile_size).astype(jnp.float32)
    bases = chunk_bases(jax.lax.stop_gradient(feat), tx0, ty0, tile_size, cg)
    clamped = jnp.minimum(bases, capacity + 1)
    trips = window_trips(clamped, ng, group, cpw)
    counts = bases[:, :, -1]
    static = _frozen(
        tile_size=tile_size, ntx=ntx, sntx=0, ng=ng, nsup=0, layout="raster",
        group=group, cg=cg, capacity=capacity, cpw=cpw,
        ncp1=bases.shape[-1], f_route=f_route,
    )
    gdat = bin_targets(
        feat, pack_bases(bases, capacity), trips, interpret, static
    )
    return gdat, counts


def bin_hierarchical(
    feat,  # (B, F, G) depth-sorted, feature-major
    tile_size: int,
    ntx: int,
    nty: int,
    capacity: int,
    cg: int,
    window: int,
    supertile_capacity: int,
    interpret: bool,
    f_route: int = 15,
):
    """Two-level binning: 4x4-tile supertiles, then per-supertile tiles.

    Returns (gdat, counts, sup_counts):
      gdat (B*T, F, capacity + cg + 128) in SUPERTILE-MAJOR tile order
      counts (B, T) int32 per-tile coverage, same order
      sup_counts (B, S) int32 per-supertile coverage (overflow diagnostics)
    """
    assert ntx % 4 == 0 and nty % 4 == 0
    assert capacity % _ALIGN == 0 and cg % _ALIGN == 0 and cg <= 256
    assert supertile_capacity % _ALIGN == 0
    sntx, snty = ntx // 4, nty // 4
    nsup = sntx * snty
    b = feat.shape[0]
    k1 = supertile_capacity
    width1 = k1 + cg + _ALIGN
    cpw = window // cg

    # Phase 1: stream -> supertile worklists (raster supertile order).
    s = jnp.arange(nsup, dtype=jnp.int32)
    sx0 = ((s % sntx) * (4 * tile_size)).astype(jnp.float32)
    sy0 = ((s // sntx) * (4 * tile_size)).astype(jnp.float32)
    group1 = _pick_group(nsup, width1)
    ng1 = nsup // group1
    bases1 = chunk_bases(
        jax.lax.stop_gradient(feat), sx0, sy0, 4 * tile_size, cg
    )  # (B, S, NC+1)
    trips1 = window_trips(jnp.minimum(bases1, k1 + 1), ng1, group1, cpw)
    sup_counts = bases1[:, :, -1]  # (B, S)
    static1 = _frozen(
        tile_size=4 * tile_size, ntx=sntx, sntx=0, ng=ng1, nsup=0,
        layout="raster", group=group1, cg=cg, capacity=k1, cpw=cpw,
        ncp1=bases1.shape[-1], f_route=f_route,
    )
    sup = bin_targets(
        feat, pack_bases(bases1, k1), trips1, interpret, static1
    )  # (B*S, F, width1)
    parents = sup[:, :, :k1]

    # Phase 2: each supertile worklist -> its 16 tiles (sub4x4 order).
    sid = jnp.arange(nsup, dtype=jnp.int32)  # (S,)
    wi = jnp.arange(16, dtype=jnp.int32)
    tx0 = (((sid[:, None] % sntx) * 4 + wi[None, :] % 4) * tile_size).astype(
        jnp.float32
    )  # (S, 16)
    ty0 = (((sid[:, None] // sntx) * 4 + wi[None, :] // 4) * tile_size).astype(
        jnp.float32
    )
    tx0 = jnp.tile(tx0, (b, 1))  # (B*S, 16)
    ty0 = jnp.tile(ty0, (b, 1))
    bases2 = chunk_bases(
        jax.lax.stop_gradient(parents), tx0, ty0, tile_size, cg
    )  # (B*S, 16, NC2+1)
    # Phase-2 sweeps are windowed like phase 1 (the kernels statically unroll
    # cpw chunk bodies per window); per-window trips skip empty tails of the
    # parent worklists.
    window2 = min(window, k1)
    cpw2 = window2 // cg
    trips2 = window_trips(jnp.minimum(bases2, capacity + 1), 1, 16, cpw2)
    static2 = _frozen(
        tile_size=tile_size, ntx=ntx, sntx=sntx, ng=1, nsup=nsup,
        layout="sub4x4", group=16, cg=cg, capacity=capacity, cpw=cpw2,
        ncp1=bases2.shape[-1], f_route=f_route,
    )
    gdat = bin_targets(
        parents, pack_bases(bases2, capacity), trips2, interpret, static2
    )
    counts = bases2[:, :, -1].reshape(b, nsup * 16)
    return gdat, counts, sup_counts


@jax.custom_vjp
def _permute_rows(feat, order):
    """feat[order] with a sort-based VJP.

    XLA's autodiff of a gather is a scatter-add (~150 ms at 131k x 16 f32 on
    v5e). Since `order` is a permutation, the cotangent is g[inv_order] — but
    a row GATHER of 131k x 16 runs at only ~5 GB/s on TPU (scalar-core
    driven, ~26 ms at the flagship shape). Sorting the cotangent rows by
    `order` produces exactly the same permutation through the vectorized
    sort network instead: ~5 ms measured — 5x faster than the gather."""
    return feat[order]


def _permute_rows_fwd(feat, order):
    return feat[order], order


def _permute_rows_bwd(res, g):
    order = res
    f = g.shape[1]
    ops = jax.lax.sort(
        (order,) + tuple(g[:, i] for i in range(f)), num_keys=1
    )
    return jnp.stack(ops[1:], axis=-1), None


_permute_rows.defvjp(_permute_rows_fwd, _permute_rows_bwd)


def build_sorted_features(proj, feature=None):
    """Projected Gaussians -> depth-sorted (F, G) feature-major rows."""
    color = proj.rgb if feature is None else feature
    c = color.shape[-1]
    assert c <= 8
    live = proj.valid & (proj.radius > 0.0)
    depth_key = jnp.where(live, proj.depth, jnp.inf)
    order = jnp.argsort(depth_key).astype(jnp.int32)

    g = proj.mean2d.shape[0]
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
    cols.extend(jnp.zeros((g,), jnp.float32) for _ in range(F - 7 - c))
    feat = jnp.stack(cols, axis=-1)  # (G, F)
    return _permute_rows(feat, order).T  # (F, G)
