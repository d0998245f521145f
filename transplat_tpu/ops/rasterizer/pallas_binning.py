"""Pallas tile-binning kernel: depth-ordered worklist compaction via one-hot
MXU matmuls.

XLA's pair-sort binning costs ~130ms at G=131k (bitonic sort), and
counting-sort alternatives bottleneck on 2M-element gathers/scatters (~50ms —
TPU random access is slow). This kernel avoids all per-pair memory traffic:

  * the depth-sorted Gaussian stream [F, G] (feature-major: 16 sublanes x G
    lanes) is processed in windows of W lanes — grid (B*T, G/W) — so Mosaic
    pipelines window DMA against compute and VMEM stays small
  * per-(tile, window) worklist base offsets are precomputed in XLA (one
    coverage reduce + cumsum) and passed via scalar prefetch, which makes
    every (tile, window) grid cell independent
  * within a window: coverage mask from the screen rect vs this tile,
    compaction offsets via a triangular-matmul cumsum, and a scatter-free
    write — a one-hot matrix turns compaction into
      gdat[:, w0:w0+CG+ALIGN] += sl @ onehot
    an MXU matmul into a lane-aligned window of the worklist

Lane->sublane vector moves (rel/mask) are identity-matrix matmuls — always
supported, MXU-cheap — instead of relayout transposes.

The backward pass re-runs the stream with grid (B, G/W, T) (windows outer, so
the dfeat window block accumulates over consecutive tile steps), transposing
the one-hot matmul to route worklist cotangents back onto per-Gaussian
features — zero scatters. Feature rows match pallas_composite.gdat
(mean, conic, radius, opacity, rgb).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_composite import F

_ALIGN = 128  # Mosaic lane-offset alignment for dynamic slices


def _coverage_lanes(sl, tx, ty, tile_size: int):
    """sl: (F, CG) chunk; tx/ty scalar tile coords. Returns (1, CG) bool mask.

    Covers iff the tile's pixel range intersects [m - r, m + r] in both axes
    (exact cover of the circular alpha cutoff)."""
    mx = sl[0:1, :]
    my = sl[1:2, :]
    r = sl[5:6, :]
    ts = float(tile_size)
    x0 = tx * ts
    y0 = ty * ts
    return (
        (mx + r >= x0)
        & (mx - r < x0 + ts)
        & (my + r >= y0)
        & (my - r < y0 + ts)
        & (r > 0.0)
    )


def _constants(cg: int):
    """Loop-invariant matrices: strict-upper tri, identity, one-hot columns."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (cg, cg), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (cg, cg), 1)
    tri = (rows < cols).astype(jnp.float32)
    eye = (rows == cols).astype(jnp.float32)
    oh_cols = jax.lax.broadcasted_iota(jnp.int32, (cg, cg + _ALIGN), 1)
    return tri, eye, oh_cols


def _chunk_plan(sl, tx, ty, tile_size: int, cg: int, tri, eye):
    """Coverage + compaction offsets for one chunk.

    Returns (mask_s (CG,1), excl_s (CG,1), n scalar), all float32."""
    mask_l = _coverage_lanes(sl, tx, ty, tile_size).astype(jnp.float32)  # (1, CG)
    # excl[i] = sum_{j<i} mask[j]  ==  mask_l @ tri.
    excl_l = jax.lax.dot_general(
        mask_l, tri, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # Lane -> sublane via one fused identity matmul: (CG, 2) = eye @ [mask; excl]^T.
    both = jnp.concatenate([mask_l, excl_l], axis=0)  # (2, CG)
    both_s = jax.lax.dot_general(
        eye, both, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (CG, 2)
    return both_s[:, 0:1], both_s[:, 1:2], jnp.sum(mask_l)


def _window_pass(
    sl_window_ref, gdat_like_ref, base0, tx, ty,
    *, tile_size: int, capacity: int, cg: int, backward: bool,
    dfeat_ref=None, num_chunks=None,
):
    """Shared fwd/bwd sweep over one feature window."""
    width = sl_window_ref.shape[2]
    if num_chunks is None:
        num_chunks = width // cg
    tri, eye, oh_cols = _constants(cg)

    def body(ci, base):
        off = pl.multiple_of(ci * cg, cg)
        sl = sl_window_ref[0, :, pl.ds(off, cg)]  # (F, CG)
        mask_s, excl_s, n = _chunk_plan(sl, tx, ty, tile_size, cg, tri, eye)

        @pl.when(n > 0.0)
        def _():
            b = jnp.minimum(base, capacity).astype(jnp.int32)
            w0 = pl.multiple_of((b // _ALIGN) * _ALIGN, _ALIGN)
            rel = (b - w0).astype(jnp.float32) + excl_s
            onehot = jnp.where(
                (oh_cols == rel.astype(jnp.int32)) & (mask_s > 0.5), 1.0, 0.0
            )  # (CG, CG + ALIGN)
            if not backward:
                contrib = jax.lax.dot_general(
                    sl, onehot, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                cur = gdat_like_ref[0, :, pl.ds(w0, cg + _ALIGN)]
                gdat_like_ref[0, :, pl.ds(w0, cg + _ALIGN)] = cur + contrib
            else:
                window = gdat_like_ref[0, :, pl.ds(w0, cg + _ALIGN)]
                back = jax.lax.dot_general(
                    window, onehot, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                cur = dfeat_ref[0, :, pl.ds(off, cg)]
                dfeat_ref[0, :, pl.ds(off, cg)] = cur + back

        return base + n.astype(jnp.int32)

    jax.lax.fori_loop(0, num_chunks, body, base0)


def _bin_fwd_kernel(
    base_ref, feat_ref, gdat_ref,
    *, tile_size: int, ntx: int, num_tiles: int, capacity: int, cg: int, nw: int,
):
    i = pl.program_id(0)  # b * num_tiles + tile
    w = pl.program_id(1)
    tile = i % num_tiles
    tx = (tile % ntx).astype(jnp.float32)
    ty = (tile // ntx).astype(jnp.float32)

    @pl.when(w == 0)
    def _():
        gdat_ref[0] = jnp.zeros_like(gdat_ref[0])

    base0 = base_ref[i * nw + w]
    _window_pass(
        feat_ref, gdat_ref, base0, tx, ty,
        tile_size=tile_size, capacity=capacity, cg=cg, backward=False,
    )


def _bin_bwd_kernel(
    base_ref, feat_ref, dgdat_ref, dfeat_ref,
    *, tile_size: int, ntx: int, num_tiles: int, capacity: int, cg: int, nw: int,
):
    b = pl.program_id(0)
    w = pl.program_id(1)
    t = pl.program_id(2)
    tx = (t % ntx).astype(jnp.float32)
    ty = (t // ntx).astype(jnp.float32)

    @pl.when(t == 0)
    def _():
        dfeat_ref[0] = jnp.zeros_like(dfeat_ref[0])

    base0 = base_ref[(b * num_tiles + t) * nw + w]
    _window_pass(
        feat_ref, dgdat_ref, base0, tx, ty,
        tile_size=tile_size, capacity=capacity, cg=cg, backward=True,
        dfeat_ref=dfeat_ref,
    )


def window_bases(
    feat: jnp.ndarray, tile_size: int, ntx: int, nty: int, window: int
) -> jnp.ndarray:
    """XLA: exclusive per-(tile, window) worklist base offsets.

    feat: (B, F, G) -> (B, T, NW) int32 with base[b, t, w] = number of
    Gaussians in windows < w covering tile t. Uses the exact same coverage
    predicate as the kernel.
    """
    b, _, g = feat.shape
    nw = g // window
    mx = feat[:, 0, :].reshape(b, nw, window)
    my = feat[:, 1, :].reshape(b, nw, window)
    r = feat[:, 5, :].reshape(b, nw, window)
    t = jnp.arange(ntx * nty, dtype=jnp.float32)
    tx = (t % ntx) * tile_size
    ty = (t // ntx) * tile_size
    cov = (
        (mx[..., None] + r[..., None] >= tx)
        & (mx[..., None] - r[..., None] < tx + tile_size)
        & (my[..., None] + r[..., None] >= ty)
        & (my[..., None] - r[..., None] < ty + tile_size)
        & (r[..., None] > 0.0)
    )  # (B, NW, W, T)
    counts = cov.sum(axis=2).astype(jnp.int32)  # (B, NW, T)
    incl = jnp.cumsum(counts, axis=1)
    excl = incl - counts
    return jnp.moveaxis(excl, 1, 2)  # (B, T, NW)


def _fwd_call(feat, bases, tile_size, ntx, num_tiles, capacity, cg, window, interpret):
    b, f, g = feat.shape  # (B, F, G) feature-major
    nw = g // window
    kernel = functools.partial(
        _bin_fwd_kernel,
        tile_size=tile_size, ntx=ntx, num_tiles=num_tiles,
        capacity=capacity, cg=cg, nw=nw,
    )
    width = capacity + cg + _ALIGN
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b * num_tiles, nw),
        in_specs=[
            pl.BlockSpec(
                (1, f, window),
                lambda i, w, _base: (i // num_tiles, 0, w),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (1, f, width), lambda i, w, _base: (i, 0, 0), memory_space=pltpu.VMEM
        ),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b * num_tiles, f, width), jnp.float32),
        interpret=interpret,
    )(bases.reshape(-1), feat)


def _bwd_call(
    feat, bases, dgdat, tile_size, ntx, num_tiles, capacity, cg, window, interpret
):
    b, f, g = feat.shape
    nw = g // window
    kernel = functools.partial(
        _bin_bwd_kernel,
        tile_size=tile_size, ntx=ntx, num_tiles=num_tiles,
        capacity=capacity, cg=cg, nw=nw,
    )
    width = capacity + cg + _ALIGN
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, nw, num_tiles),
        in_specs=[
            pl.BlockSpec(
                (1, f, window),
                lambda bb, w, t, _base: (bb, 0, w),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, f, width),
                lambda bb, w, t, _base: (bb * num_tiles + t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, f, window),
            lambda bb, w, t, _base: (bb, 0, w),
            memory_space=pltpu.VMEM,
        ),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, f, g), jnp.float32),
        interpret=interpret,
    )(bases.reshape(-1), feat, dgdat)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4, 5, 6, 7))
def bin_pallas(feat, tile_size, ntx, num_tiles, capacity, cg, window, interpret):
    """feat: (B, F, G) depth-sorted, feature-major -> gdat (B*T, F, K+CG+ALIGN).

    Only the first `capacity` worklist columns are clean (overflow columns
    receive overlapping writes) — slice before compositing.
    """
    assert capacity % _ALIGN == 0, "capacity must be a multiple of 128"
    nty = num_tiles // ntx
    bases = window_bases(
        jax.lax.stop_gradient(feat), tile_size, ntx, nty, window
    )
    return _fwd_call(
        feat, bases, tile_size, ntx, num_tiles, capacity, cg, window, interpret
    )


def _vjp_fwd(feat, tile_size, ntx, num_tiles, capacity, cg, window, interpret):
    nty = num_tiles // ntx
    bases = window_bases(
        jax.lax.stop_gradient(feat), tile_size, ntx, nty, window
    )
    out = _fwd_call(
        feat, bases, tile_size, ntx, num_tiles, capacity, cg, window, interpret
    )
    return out, (feat, bases)


def _vjp_bwd(tile_size, ntx, num_tiles, capacity, cg, window, interpret, res, dgdat):
    feat, bases = res
    dfeat = _bwd_call(
        feat, bases, dgdat, tile_size, ntx, num_tiles, capacity, cg, window,
        interpret,
    )
    return (dfeat,)


bin_pallas.defvjp(_vjp_fwd, _vjp_bwd)


# --- Hierarchical (supertile) binning -------------------------------------
#
# Per-iteration overhead (~1us of small matmuls + predicated RMW) dominates
# the single-level kernel: T x G/CG iterations = 131k at the flagship size.
# Two levels cut this ~6x: phase 1 compacts the stream into (nty/4 x ntx/4)
# 64px-supertile worklists; phase 2 compacts each supertile's worklist into
# its 16 tiles. Depth order is preserved (each phase keeps stream order).
# Phase 2 runs tiles in supertile-major order so its backward accumulates the
# parent-worklist cotangent over consecutive grid steps; the caller permutes
# the worklists back to raster order afterwards.


def _phase2_tile_coords(j, sntx: int):
    """Supertile-major program index j -> raster tile coords (tx, ty)."""
    s = j // 16
    wi = j % 16
    tx = (s % sntx) * 4 + wi % 4
    ty = (s // sntx) * 4 + wi // 4
    return tx, ty


def supertile_major_permutation(ntx: int, nty: int):
    """Raster tile index for each supertile-major position (numpy, static)."""
    import numpy as np

    sntx = ntx // 4
    out = np.empty(ntx * nty, np.int32)
    for j in range(ntx * nty):
        s, wi = divmod(j, 16)
        tx = (s % sntx) * 4 + wi % 4
        ty = (s // sntx) * 4 + wi // 4
        out[j] = ty * ntx + tx
    return out


def _phase2_fwd_kernel(
    counts_ref, parent_ref, gdat_ref,
    *, tile_size: int, sntx: int, num_tiles: int, capacity: int, cg: int,
):
    i = pl.program_id(0)
    j = i % num_tiles
    tx, ty = _phase2_tile_coords(j, sntx)
    gdat_ref[0] = jnp.zeros_like(gdat_ref[0])
    k1 = parent_ref.shape[2]
    nsup = num_tiles // 16
    sup_index = (i // num_tiles) * nsup + (j // 16)
    count = jnp.minimum(counts_ref[sup_index], k1)
    _window_pass(
        parent_ref, gdat_ref, jnp.zeros((), jnp.int32),
        tx.astype(jnp.float32), ty.astype(jnp.float32),
        tile_size=tile_size, capacity=capacity, cg=cg, backward=False,
        num_chunks=(count + cg - 1) // cg,
    )


def _phase2_bwd_kernel(
    counts_ref, parent_ref, dgdat_ref, dparent_ref,
    *, tile_size: int, sntx: int, num_tiles: int, capacity: int, cg: int,
):
    p = pl.program_id(0)  # b * num_supertiles + s
    wi = pl.program_id(1)  # tile within supertile
    s = p % (num_tiles // 16)
    j = s * 16 + wi
    tx, ty = _phase2_tile_coords(j, sntx)

    @pl.when(wi == 0)
    def _():
        dparent_ref[0] = jnp.zeros_like(dparent_ref[0])

    k1 = parent_ref.shape[2]
    count = jnp.minimum(counts_ref[p], k1)
    _window_pass(
        parent_ref, dgdat_ref, jnp.zeros((), jnp.int32),
        tx.astype(jnp.float32), ty.astype(jnp.float32),
        tile_size=tile_size, capacity=capacity, cg=cg, backward=True,
        dfeat_ref=dparent_ref,
        num_chunks=(count + cg - 1) // cg,
    )


def _phase2_fwd_call(parents, counts, tile_size, sntx, num_tiles, capacity, cg, interpret):
    bs, f, k1 = parents.shape  # (B * num_supertiles, F, K1)
    nsup = num_tiles // 16
    b = bs // nsup
    kernel = functools.partial(
        _phase2_fwd_kernel,
        tile_size=tile_size, sntx=sntx, num_tiles=num_tiles,
        capacity=capacity, cg=cg,
    )
    width = capacity + cg + _ALIGN
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b * num_tiles,),
        in_specs=[
            pl.BlockSpec(
                (1, f, k1),
                lambda i, _c: ((i // num_tiles) * (num_tiles // 16)
                               + (i % num_tiles) // 16, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (1, f, width), lambda i, _c: (i, 0, 0), memory_space=pltpu.VMEM
        ),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b * num_tiles, f, width), jnp.float32),
        interpret=interpret,
    )(counts, parents)


def _phase2_bwd_call(parents, counts, dgdat, tile_size, sntx, num_tiles, capacity, cg, interpret):
    bs, f, k1 = parents.shape
    kernel = functools.partial(
        _phase2_bwd_kernel,
        tile_size=tile_size, sntx=sntx, num_tiles=num_tiles,
        capacity=capacity, cg=cg,
    )
    width = capacity + cg + _ALIGN
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bs, 16),
        in_specs=[
            pl.BlockSpec(
                (1, f, k1), lambda p, wi, _c: (p, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, f, width),
                lambda p, wi, _c: (p * 16 + wi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, f, k1), lambda p, wi, _c: (p, 0, 0), memory_space=pltpu.VMEM
        ),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bs, f, k1), jnp.float32),
        interpret=interpret,
    )(counts, parents, dgdat)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7))
def _phase2(parents, counts, tile_size, sntx, num_tiles, capacity, cg, interpret):
    return _phase2_fwd_call(
        parents, counts, tile_size, sntx, num_tiles, capacity, cg, interpret
    )


def _phase2_vjp_fwd(parents, counts, tile_size, sntx, num_tiles, capacity, cg, interpret):
    out = _phase2_fwd_call(
        parents, counts, tile_size, sntx, num_tiles, capacity, cg, interpret
    )
    return out, (parents, counts)


def _phase2_vjp_bwd(tile_size, sntx, num_tiles, capacity, cg, interpret, res, dgdat):
    parents, counts = res
    return (
        _phase2_bwd_call(
            parents, counts, dgdat, tile_size, sntx, num_tiles, capacity, cg,
            interpret,
        ),
        None,
    )


_phase2.defvjp(_phase2_vjp_fwd, _phase2_vjp_bwd)


def bin_hierarchical(
    feat: jnp.ndarray,  # (B, F, G) depth-sorted, feature-major
    tile_size: int,
    ntx: int,
    nty: int,
    capacity: int,
    cg: int,
    window: int,
    supertile_capacity: int,
    interpret: bool,
) -> jnp.ndarray:
    """Two-level binning -> gdat (B*T, F, K+CG+ALIGN) in RASTER tile order."""
    assert ntx % 4 == 0 and nty % 4 == 0
    assert supertile_capacity % cg == 0 and supertile_capacity % _ALIGN == 0
    sntx, snty = ntx // 4, nty // 4
    num_supertiles = sntx * snty
    num_tiles = ntx * nty
    b = feat.shape[0]

    sup = bin_pallas(
        feat, tile_size * 4, sntx, num_supertiles, supertile_capacity, cg,
        window, interpret,
    )  # (B * S, F, K1 + cg + ALIGN)
    parents = sup[:, :, :supertile_capacity]

    sup_counts = tile_counts(
        jax.lax.stop_gradient(feat), tile_size * 4, sntx, snty
    ).reshape(-1)  # (B * S,)

    gdat = _phase2(
        parents, sup_counts, tile_size, sntx, num_tiles, capacity, cg, interpret
    )  # supertile-major tile order

    perm = jnp.asarray(supertile_major_permutation(ntx, nty))
    # Invert: raster position r holds the worklist from supertile-major slot.
    inv = jnp.zeros_like(perm).at[perm].set(jnp.arange(perm.shape[0], dtype=jnp.int32))
    batch_offsets = (jnp.arange(b, dtype=jnp.int32) * num_tiles)[:, None]
    gather_idx = (batch_offsets + inv[None, :]).reshape(-1)
    return gdat[gather_idx]


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
    return feat[order].T  # (F, G)


def tile_counts(feat: jnp.ndarray, tile_size: int, ntx: int, nty: int) -> jnp.ndarray:
    """Per-tile coverage counts for overflow diagnostics.

    feat: (B, F, G) feature-major -> (B, T) int32.
    """
    b, _, g = feat.shape
    mx = feat[:, 0, :]
    my = feat[:, 1, :]
    r = feat[:, 5, :]
    t = jnp.arange(ntx * nty, dtype=jnp.float32)
    tx = (t % ntx) * tile_size
    ty = (t // ntx) * tile_size
    cov = (
        (mx[..., None] + r[..., None] >= tx)
        & (mx[..., None] - r[..., None] < tx + tile_size)
        & (my[..., None] + r[..., None] >= ty)
        & (my[..., None] - r[..., None] < ty + tile_size)
        & (r[..., None] > 0.0)
    )
    return jnp.sum(cov.astype(jnp.int32), axis=1)
