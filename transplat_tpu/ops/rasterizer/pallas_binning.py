"""Pallas tile-binning kernel: depth-ordered worklist compaction via one-hot
MXU matmuls.

XLA's pair-sort binning costs ~130ms at G=131k (bitonic sort), and
counting-sort alternatives bottleneck on 2M-element gathers/scatters (~50ms —
TPU random access is slow). This kernel avoids all per-pair memory traffic:

  * per tile (grid), stream the depth-sorted Gaussian features [F, G]
    (feature-major: 16 sublanes x G lanes, VMEM-resident) in chunks of CG
  * coverage mask from the screen rect vs this tile
  * in-chunk compaction offsets via a triangular-matmul cumsum
  * scatter-free write: a one-hot matrix [CG, CG+ALIGN] built from the
    offsets turns compaction into
      gdat[:, w0:w0+CG+ALIGN] += sl @ onehot
    an MXU matmul into a lane-aligned window of the worklist (the window
    start is aligned down to 128 so Mosaic can prove the slice alignment)

Lane->sublane vector moves (rel/mask) are done with identity-matrix matmuls —
always supported, MXU-cheap — instead of relayout transposes.

The backward pass re-runs the same stream, transposing the one-hot matmul to
accumulate worklist cotangents back onto per-Gaussian features — again with
zero scatters. Feature rows match pallas_composite.gdat (mean, conic, radius,
opacity, rgb).
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
    """sl: (F, CG) chunk; tx/ty scalar tile coords. Returns (1, CG) mask.

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


def _lane_to_sublane(v, cg: int):
    """(1, CG) -> (CG, 1) via an identity matmul (transpose-free)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (cg, cg), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (cg, cg), 1)
    eye = (rows == cols).astype(jnp.float32)
    return jax.lax.dot_general(
        eye, v, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _chunk_plan(sl, tx, ty, tile_size: int, cg: int):
    """Coverage + compaction offsets for one chunk.

    Returns (mask_s (CG,1) float, excl_s (CG,1) float, n scalar float)."""
    mask_l = _coverage_lanes(sl, tx, ty, tile_size).astype(jnp.float32)  # (1, CG)
    rows = jax.lax.broadcasted_iota(jnp.int32, (cg, cg), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (cg, cg), 1)
    # excl[i] = sum_{j<i} mask[j]  ==  mask_l @ T with T[j, i] = (j < i).
    tri = (rows < cols).astype(jnp.float32)
    excl_l = jax.lax.dot_general(
        mask_l, tri, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (1, CG)
    mask_s = _lane_to_sublane(mask_l, cg)
    excl_s = _lane_to_sublane(excl_l, cg)
    n = jnp.sum(mask_l)
    return mask_s, excl_s, n


def _onehot(mask_s, rel_s, cg: int):
    """One-hot [CG_src, CG + ALIGN]: row i hits column rel[i] when covered."""
    cols = jax.lax.broadcasted_iota(jnp.int32, (cg, cg + _ALIGN), 1)
    return jnp.where(
        (cols == rel_s.astype(jnp.int32)) & (mask_s > 0.5), 1.0, 0.0
    )


def _bin_fwd_kernel(
    feat_ref, gdat_ref,
    *, tile_size: int, ntx: int, num_tiles: int, capacity: int, cg: int,
):
    g = feat_ref.shape[2]
    num_chunks = g // cg
    tile = pl.program_id(0) % num_tiles
    tx = (tile % ntx).astype(jnp.float32)
    ty = (tile // ntx).astype(jnp.float32)

    gdat_ref[0] = jnp.zeros_like(gdat_ref[0])

    def body(ci, base):
        off = pl.multiple_of(ci * cg, cg)
        sl = feat_ref[0, :, pl.ds(off, cg)]  # (F, CG)
        mask_s, excl_s, n = _chunk_plan(sl, tx, ty, tile_size, cg)

        @pl.when(n > 0.0)
        def _():
            b = jnp.minimum(base, capacity).astype(jnp.int32)
            w0 = pl.multiple_of((b // _ALIGN) * _ALIGN, _ALIGN)
            rel_s = (b - w0).astype(jnp.float32) + excl_s
            onehot = _onehot(mask_s, rel_s, cg)
            # (F, CG + ALIGN): contract source lanes against one-hot rows.
            contrib = jax.lax.dot_general(
                sl, onehot, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            cur = gdat_ref[0, :, pl.ds(w0, cg + _ALIGN)]
            gdat_ref[0, :, pl.ds(w0, cg + _ALIGN)] = cur + contrib

        return base + n.astype(jnp.int32)

    jax.lax.fori_loop(0, num_chunks, body, jnp.zeros((), jnp.int32))


def _bin_bwd_kernel(
    feat_ref, dgdat_ref, dfeat_ref,
    *, tile_size: int, ntx: int, num_tiles: int, capacity: int, cg: int,
):
    g = feat_ref.shape[2]
    num_chunks = g // cg
    i = pl.program_id(0)
    tile = i % num_tiles
    tx = (tile % ntx).astype(jnp.float32)
    ty = (tile // ntx).astype(jnp.float32)

    # dfeat accumulates across the (sequential) grid; zero it when we first
    # touch each batch element's block.
    @pl.when(tile == 0)
    def _():
        dfeat_ref[0] = jnp.zeros_like(dfeat_ref[0])

    def body(ci, base):
        off = pl.multiple_of(ci * cg, cg)
        sl = feat_ref[0, :, pl.ds(off, cg)]
        mask_s, excl_s, n = _chunk_plan(sl, tx, ty, tile_size, cg)

        @pl.when(n > 0.0)
        def _():
            b = jnp.minimum(base, capacity).astype(jnp.int32)
            w0 = pl.multiple_of((b // _ALIGN) * _ALIGN, _ALIGN)
            rel_s = (b - w0).astype(jnp.float32) + excl_s
            onehot = _onehot(mask_s, rel_s, cg)
            window = dgdat_ref[0, :, pl.ds(w0, cg + _ALIGN)]  # (F, CG + ALIGN)
            # (F, CG_src): route cotangents back through the one-hot columns.
            back = jax.lax.dot_general(
                window, onehot, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            cur = dfeat_ref[0, :, pl.ds(off, cg)]
            dfeat_ref[0, :, pl.ds(off, cg)] = cur + back

        return base + n.astype(jnp.int32)

    jax.lax.fori_loop(0, num_chunks, body, jnp.zeros((), jnp.int32))


def _fwd_call(feat, tile_size, ntx, num_tiles, capacity, cg, interpret):
    b, f, g = feat.shape  # (B, F, G) feature-major
    kernel = functools.partial(
        _bin_fwd_kernel,
        tile_size=tile_size, ntx=ntx, num_tiles=num_tiles,
        capacity=capacity, cg=cg,
    )
    width = capacity + cg + _ALIGN
    gdat = pl.pallas_call(
        kernel,
        grid=(b * num_tiles,),
        in_specs=[
            pl.BlockSpec(
                (1, f, g), lambda i: (i // num_tiles, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (1, f, width), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b * num_tiles, f, width), jnp.float32),
        interpret=interpret,
    )(feat)
    return gdat


def _bwd_call(feat, dgdat, tile_size, ntx, num_tiles, capacity, cg, interpret):
    b, f, g = feat.shape
    kernel = functools.partial(
        _bin_bwd_kernel,
        tile_size=tile_size, ntx=ntx, num_tiles=num_tiles,
        capacity=capacity, cg=cg,
    )
    width = capacity + cg + _ALIGN
    return pl.pallas_call(
        kernel,
        grid=(b * num_tiles,),
        in_specs=[
            pl.BlockSpec(
                (1, f, g), lambda i: (i // num_tiles, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, f, width), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, f, g), lambda i: (i // num_tiles, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, f, g), jnp.float32),
        interpret=interpret,
    )(feat, dgdat)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4, 5, 6))
def bin_pallas(feat, tile_size, ntx, num_tiles, capacity, cg, interpret):
    """feat: (B, F, G) depth-sorted, feature-major -> gdat (B*T, F, K+CG+ALIGN).

    Only the first `capacity` worklist columns are clean (overflow columns
    receive overlapping writes) — slice before compositing.
    """
    assert capacity % _ALIGN == 0, "capacity must be a multiple of 128"
    return _fwd_call(feat, tile_size, ntx, num_tiles, capacity, cg, interpret)


def _vjp_fwd(feat, tile_size, ntx, num_tiles, capacity, cg, interpret):
    out = _fwd_call(feat, tile_size, ntx, num_tiles, capacity, cg, interpret)
    return out, feat


def _vjp_bwd(tile_size, ntx, num_tiles, capacity, cg, interpret, feat, dgdat):
    dfeat = _bwd_call(
        feat, dgdat, tile_size, ntx, num_tiles, capacity, cg, interpret
    )
    return (dfeat,)


bin_pallas.defvjp(_vjp_fwd, _vjp_bwd)


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
    """Per-tile coverage counts for overflow diagnostics (XLA reduce).

    feat: (B, F, G) feature-major -> (B, T) int32.
    """
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