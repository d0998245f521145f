"""Tile binning and tiled compositing — the TPU-native rasterizer core.

Design (instead of the CUDA atomics/sort-per-tile approach):
  1. one global depth argsort over Gaussians (XLA sort)
  2. each sorted Gaussian emits up to MT (tile, rank) pairs for the tiles its
     screen-space rect covers; a single global sort of the static-size pair
     array groups pairs by tile while preserving depth order
  3. per-tile padded worklists (capacity K) are sliced out with searchsorted
  4. compositing is a chunked scan: front-to-back alpha blending re-expressed
     through exclusive cumprods of (1 - alpha), which vectorizes across the
     256 pixels of a tile and a chunk of Gaussians — dense VPU math instead of
     a sequential per-pixel loop

Everything is static-shape and differentiable end-to-end (sort indices are
piecewise-constant; gradients flow through the gathers and alpha math back to
means / covariances / SH / opacities, mirroring the CUDA backward's gradient
structure without hand-written scatter-adds).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .projection import ProjectedGaussians, gaussian_alpha
from .reference import TRANSMITTANCE_EPS


class TileLists(NamedTuple):
    indices: jnp.ndarray  # (T, K) int32 Gaussian indices (depth order per tile)
    mask: jnp.ndarray  # (T, K) bool validity
    num_tiles_x: int
    num_tiles_y: int
    overflow: jnp.ndarray  # () int32: pairs dropped due to capacity K
    truncated: jnp.ndarray  # () int32: tiles dropped due to MT per-Gaussian cap


def bin_gaussians(
    proj: ProjectedGaussians,
    image_shape: tuple[int, int],
    tile_size: int = 16,
    max_tiles_per_gaussian: int = 32,
    capacity: int = 1024,
) -> TileLists:
    h, w = image_shape
    ntx = (w + tile_size - 1) // tile_size
    nty = (h + tile_size - 1) // tile_size
    num_tiles = ntx * nty

    g = proj.mean2d.shape[0]
    live = proj.valid & (proj.radius > 0.0)
    depth_key = jnp.where(live, proj.depth, jnp.inf)
    order = jnp.argsort(depth_key).astype(jnp.int32)  # (G,) sorted ranks -> ids

    mean2d = proj.mean2d[order]
    radius = proj.radius[order]
    live_s = live[order]

    # Covered tile rect per (sorted) Gaussian, CUDA getRect convention.
    rect_min_x = jnp.clip(
        jnp.floor((mean2d[:, 0] - radius) / tile_size), 0, ntx
    ).astype(jnp.int32)
    rect_min_y = jnp.clip(
        jnp.floor((mean2d[:, 1] - radius) / tile_size), 0, nty
    ).astype(jnp.int32)
    # Exclusive max; exact cover of the circular radius cutoff (see
    # projection.gaussian_alpha): every pixel with |px - mean| <= r is inside
    # a covered tile.
    rect_max_x = jnp.clip(
        jnp.floor((mean2d[:, 0] + radius) / tile_size) + 1, 0, ntx
    ).astype(jnp.int32)
    rect_max_y = jnp.clip(
        jnp.floor((mean2d[:, 1] + radius) / tile_size) + 1, 0, nty
    ).astype(jnp.int32)
    rw = jnp.where(live_s, rect_max_x - rect_min_x, 0)
    rh = jnp.where(live_s, rect_max_y - rect_min_y, 0)
    coverage = rw * rh
    truncated = jnp.sum(jnp.maximum(coverage - max_tiles_per_gaussian, 0))

    mt = max_tiles_per_gaussian
    offsets = jnp.arange(mt, dtype=jnp.int32)  # (MT,)
    rw_safe = jnp.maximum(rw, 1)
    ox = rect_min_x[:, None] + offsets[None, :] % rw_safe[:, None]
    oy = rect_min_y[:, None] + offsets[None, :] // rw_safe[:, None]
    pair_valid = offsets[None, :] < coverage[:, None]  # (G, MT)
    tile_id = jnp.where(pair_valid, oy * ntx + ox, num_tiles)

    use_i64 = (num_tiles + 1) * g >= 2**31
    key_dtype = jnp.int64 if use_i64 else jnp.int32
    rank = jnp.arange(g, dtype=key_dtype)
    keys = tile_id.astype(key_dtype) * g + rank[:, None]  # (G, MT)
    keys = keys.reshape(-1)
    payload = jnp.broadcast_to(order[:, None], (g, mt)).reshape(-1)

    sort_idx = jnp.argsort(keys)
    keys_sorted = keys[sort_idx]
    payload_sorted = payload[sort_idx]

    tile_starts = jnp.searchsorted(
        keys_sorted, jnp.arange(num_tiles + 1, dtype=key_dtype) * g
    ).astype(jnp.int32)
    counts = tile_starts[1:] - tile_starts[:-1]  # (T,)
    overflow = jnp.sum(jnp.maximum(counts - capacity, 0))

    k_range = jnp.arange(capacity, dtype=jnp.int32)
    positions = tile_starts[:-1, None] + k_range[None, :]
    positions = jnp.minimum(positions, keys.shape[0] - 1)
    indices = payload_sorted[positions]
    mask = k_range[None, :] < jnp.minimum(counts, capacity)[:, None]

    return TileLists(
        indices=indices,
        mask=mask,
        num_tiles_x=ntx,
        num_tiles_y=nty,
        overflow=overflow.astype(jnp.int32),
        truncated=truncated.astype(jnp.int32),
    )


def bin_gaussians_fast(
    proj: ProjectedGaussians,
    image_shape: tuple[int, int],
    tile_size: int = 16,
    capacity: int = 1024,
    tile_chunk: int = 64,
) -> TileLists:
    """Sort-free binning (the TPU fast path).

    XLA's TPU sort is bitonic and dominates the naive pair-sort approach, but
    a full sort is unnecessary: Gaussians are already depth-ordered, so the
    per-tile worklist rank of a Gaussian is just the count of earlier sorted
    Gaussians covering the same tile. That's a column cumsum of the (G, T)
    coverage matrix, and the worklist is recovered with a binary search per
    (tile, slot) on the monotone cumulative counts — O(G*T) vectorized
    compares instead of an O(G*MT log) sort, with no per-Gaussian tile cap.

    tile_chunk bounds peak memory: the coverage cumsum is materialized for
    tile_chunk tiles at a time ((G, tile_chunk) int32).
    """
    h, w = image_shape
    ntx = (w + tile_size - 1) // tile_size
    nty = (h + tile_size - 1) // tile_size
    num_tiles = ntx * nty
    assert num_tiles % tile_chunk == 0 or tile_chunk >= num_tiles
    tile_chunk = min(tile_chunk, num_tiles)

    g = proj.mean2d.shape[0]
    live = proj.valid & (proj.radius > 0.0)
    depth_key = jnp.where(live, proj.depth, jnp.inf)
    order = jnp.argsort(depth_key).astype(jnp.int32)

    mean2d = proj.mean2d[order]
    radius = proj.radius[order]
    live_s = live[order]

    rmin_x = jnp.clip(jnp.floor((mean2d[:, 0] - radius) / tile_size), 0, ntx).astype(jnp.int32)
    rmin_y = jnp.clip(jnp.floor((mean2d[:, 1] - radius) / tile_size), 0, nty).astype(jnp.int32)
    rmax_x = jnp.clip(jnp.floor((mean2d[:, 0] + radius) / tile_size) + 1, 0, ntx).astype(jnp.int32)
    rmax_y = jnp.clip(jnp.floor((mean2d[:, 1] + radius) / tile_size) + 1, 0, nty).astype(jnp.int32)
    rmin_x = jnp.where(live_s, rmin_x, ntx)
    rmax_x = jnp.where(live_s, rmax_x, 0)

    kk = jnp.arange(capacity, dtype=jnp.int32)

    def process_chunk(t0):
        t = t0 * tile_chunk + jnp.arange(tile_chunk, dtype=jnp.int32)
        tx = t % ntx
        ty = t // ntx
        cov = (
            (tx[None, :] >= rmin_x[:, None])
            & (tx[None, :] < rmax_x[:, None])
            & (ty[None, :] >= rmin_y[:, None])
            & (ty[None, :] < rmax_y[:, None])
        )
        cum = jnp.cumsum(cov.astype(jnp.int32), axis=0)  # (G, TC)
        counts = cum[-1]  # (TC,)
        # k-th covered Gaussian = first sorted rank with cum == k+1.
        ranks = jax.vmap(
            lambda col: jnp.searchsorted(col, kk + 1, side="left"), in_axes=1
        )(cum)  # (TC, K)
        idx = order[jnp.minimum(ranks, g - 1)]
        msk = kk[None, :] < jnp.minimum(counts, capacity)[:, None]
        return idx, msk, counts

    n_chunks = num_tiles // tile_chunk
    idx, msk, counts = jax.lax.map(process_chunk, jnp.arange(n_chunks))
    indices = idx.reshape(num_tiles, capacity)
    mask = msk.reshape(num_tiles, capacity)
    counts = counts.reshape(num_tiles)
    overflow = jnp.sum(jnp.maximum(counts - capacity, 0))

    return TileLists(
        indices=indices,
        mask=mask,
        num_tiles_x=ntx,
        num_tiles_y=nty,
        overflow=overflow.astype(jnp.int32),
        truncated=jnp.zeros((), jnp.int32),
    )


def bin_gaussians_scatter(
    proj: ProjectedGaussians,
    image_shape: tuple[int, int],
    tile_size: int = 16,
    max_tiles_per_gaussian: int = 16,
    capacity: int = 1024,
) -> TileLists:
    """Counting-sort binning via coverage cumsum + one scatter (TPU fast path).

    Gaussians are already depth-ordered, so a pair's slot in its tile's
    worklist is the count of earlier sorted Gaussians covering that tile: an
    exclusive cumsum of the (G, T) coverage matrix along the sorted axis.
    Each (gaussian, tile) pair then scatters its Gaussian id directly into
    indices[tile, slot] — no sort, no binary search. Measured ~10x faster
    than XLA's bitonic pair-sort at G=131k on v5e.
    """
    h, w = image_shape
    ntx = (w + tile_size - 1) // tile_size
    nty = (h + tile_size - 1) // tile_size
    num_tiles = ntx * nty

    g = proj.mean2d.shape[0]
    live = proj.valid & (proj.radius > 0.0)
    depth_key = jnp.where(live, proj.depth, jnp.inf)
    order = jnp.argsort(depth_key).astype(jnp.int32)

    mean2d = proj.mean2d[order]
    radius = proj.radius[order]
    live_s = live[order]

    rmin_x = jnp.clip(jnp.floor((mean2d[:, 0] - radius) / tile_size), 0, ntx).astype(jnp.int32)
    rmin_y = jnp.clip(jnp.floor((mean2d[:, 1] - radius) / tile_size), 0, nty).astype(jnp.int32)
    rmax_x = jnp.clip(jnp.floor((mean2d[:, 0] + radius) / tile_size) + 1, 0, ntx).astype(jnp.int32)
    rmax_y = jnp.clip(jnp.floor((mean2d[:, 1] + radius) / tile_size) + 1, 0, nty).astype(jnp.int32)
    rmin_x = jnp.where(live_s, rmin_x, ntx)
    rmax_x = jnp.where(live_s, rmax_x, 0)
    rw = jnp.maximum(rmax_x - rmin_x, 0)
    rh = jnp.maximum(rmax_y - rmin_y, 0)
    coverage = rw * rh
    truncated = jnp.sum(jnp.maximum(coverage - max_tiles_per_gaussian, 0))

    # Coverage matrix and exclusive per-tile prefix counts over sorted order.
    t_ids = jnp.arange(num_tiles, dtype=jnp.int32)
    tx = t_ids % ntx
    ty = t_ids // ntx
    cov = (
        (tx[None, :] >= rmin_x[:, None])
        & (tx[None, :] < rmax_x[:, None])
        & (ty[None, :] >= rmin_y[:, None])
        & (ty[None, :] < rmax_y[:, None])
    ).astype(jnp.int32)  # (G, T)
    cum_incl = jnp.cumsum(cov, axis=0)
    cum_excl = cum_incl - cov
    counts = cum_incl[-1]  # (T,)
    overflow = jnp.sum(jnp.maximum(counts - capacity, 0))

    # Enumerate each Gaussian's covered tiles (like the sort path).
    mt = max_tiles_per_gaussian
    offsets = jnp.arange(mt, dtype=jnp.int32)
    rw_safe = jnp.maximum(rw, 1)
    ox = rmin_x[:, None] + offsets[None, :] % rw_safe[:, None]
    oy = rmin_y[:, None] + offsets[None, :] // rw_safe[:, None]
    pair_valid = offsets[None, :] < coverage[:, None]
    tile_id = jnp.where(pair_valid, oy * ntx + ox, 0)  # (G, MT)

    # Slot per pair: gather from the exclusive prefix counts.
    g_idx = jnp.arange(g, dtype=jnp.int32)[:, None]
    slot = cum_excl.reshape(-1)[g_idx * num_tiles + tile_id]  # (G, MT)

    dump = num_tiles * capacity
    dest = jnp.where(
        pair_valid & (slot < capacity), tile_id * capacity + slot, dump
    )
    gid = jnp.broadcast_to(order[:, None], (g, mt))
    indices_flat = jnp.zeros((dump + 1,), jnp.int32).at[dest.reshape(-1)].set(
        gid.reshape(-1), mode="drop", unique_indices=False
    )
    mask_flat = jnp.zeros((dump + 1,), jnp.bool_).at[dest.reshape(-1)].set(
        True, mode="drop"
    )
    indices = indices_flat[:dump].reshape(num_tiles, capacity)
    mask = mask_flat[:dump].reshape(num_tiles, capacity)

    return TileLists(
        indices=indices,
        mask=mask,
        num_tiles_x=ntx,
        num_tiles_y=nty,
        overflow=overflow.astype(jnp.int32),
        truncated=truncated.astype(jnp.int32),
    )


def _tile_pixel_coords(
    ntx: int, nty: int, tile_size: int, dtype=jnp.float32
) -> jnp.ndarray:
    """(T, P, 2) pixel-center coordinates for each tile's pixels."""
    t = jnp.arange(ntx * nty, dtype=jnp.int32)
    tx = (t % ntx) * tile_size
    ty = (t // ntx) * tile_size
    dy, dx = jnp.meshgrid(
        jnp.arange(tile_size, dtype=jnp.int32),
        jnp.arange(tile_size, dtype=jnp.int32),
        indexing="ij",
    )
    px = tx[:, None, None] + dx[None]
    py = ty[:, None, None] + dy[None]
    coords = jnp.stack([px, py], axis=-1).reshape(ntx * nty, tile_size * tile_size, 2)
    return coords.astype(dtype)


def composite_tiles(
    proj: ProjectedGaussians,
    tiles: TileLists,
    image_shape: tuple[int, int],
    background: jnp.ndarray,
    feature: jnp.ndarray | None = None,
    tile_size: int = 16,
    chunk: int = 128,
    remat: bool = True,
) -> jnp.ndarray:
    """Composite per-tile worklists into an (h, w, C) image."""
    h, w = image_shape
    num_tiles, capacity = tiles.indices.shape
    color_all = proj.rgb if feature is None else feature
    c = color_all.shape[-1]
    opacity_all = jnp.where(proj.valid, proj.opacity, 0.0)

    pixel_xy = _tile_pixel_coords(tiles.num_tiles_x, tiles.num_tiles_y, tile_size)
    p = tile_size * tile_size

    num_chunks = (capacity + chunk - 1) // chunk
    assert capacity % chunk == 0, "capacity must be a multiple of chunk"

    idx_chunks = tiles.indices.reshape(num_tiles, num_chunks, chunk)
    mask_chunks = tiles.mask.reshape(num_tiles, num_chunks, chunk)

    def body(carry, inputs):
        t_run, accum = carry  # (T, P), (T, P, C)
        idx, mask = inputs  # (T, chunk)
        mean2d = proj.mean2d[idx]  # (T, chunk, 2)
        conic = proj.conic[idx]
        opacity = jnp.where(mask, opacity_all[idx], 0.0)
        radius = proj.radius[idx]
        color = color_all[idx]  # (T, chunk, C)

        alpha = gaussian_alpha(
            conic[:, None, :, :],
            mean2d[:, None, :, :],
            opacity[:, None, :],
            pixel_xy[:, :, None, :],
            radius[:, None, :],
        )  # (T, P, chunk)

        one_minus = 1.0 - alpha
        cum = jnp.cumprod(one_minus, axis=-1)  # inclusive
        t_before = t_run[..., None] * jnp.concatenate(
            [jnp.ones_like(cum[..., :1]), cum[..., :-1]], axis=-1
        )
        contrib = jnp.where(t_before >= TRANSMITTANCE_EPS, alpha * t_before, 0.0)
        accum = accum + jnp.einsum("tpk,tkc->tpc", contrib, color, precision="highest")
        t_run = t_run * cum[..., -1]
        return (t_run, accum), None

    if remat:
        body = jax.checkpoint(body)

    init = (
        jnp.ones((num_tiles, p), dtype=jnp.float32),
        jnp.zeros((num_tiles, p, c), dtype=jnp.float32),
    )
    (t_final, accum), _ = jax.lax.scan(
        body,
        init,
        (jnp.moveaxis(idx_chunks, 1, 0), jnp.moveaxis(mask_chunks, 1, 0)),
    )

    out = accum + t_final[..., None] * background[None, None, :]

    # (T, P, C) -> (H, W, C)
    out = out.reshape(tiles.num_tiles_y, tiles.num_tiles_x, tile_size, tile_size, c)
    out = out.transpose(0, 2, 1, 3, 4).reshape(
        tiles.num_tiles_y * tile_size, tiles.num_tiles_x * tile_size, c
    )
    return out[:h, :w]
