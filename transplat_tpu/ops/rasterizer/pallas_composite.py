"""Pallas TPU kernels for tile compositing (forward + custom backward).

The performance path of the rasterizer: replaces the per-tile front-to-back
alpha compositing loop of the reference CUDA rasterizer
(/root/reference/src/model/decoder/cuda_splatting.py:126-133's underlying
kernel) with MXU-friendly lane-parallel sweeps. Per-tile worklists are
produced by the binning kernels in a feature-major layout gdat[B*T, F, K]
(lanes = Gaussians; batch folded into the grid), and the kernel composites
each 16x16-pixel tile against its K Gaussians in lane-sized chunks:

  forward:  alpha from the conic quadratic form, transmittance via a lane
            cumsum in log space (exclusive cumprod, Hillis-Steele VPU scan),
            color accumulation as c_out per-channel VPU FMAs + lane reduces
            (only the statically-known live channels are computed).
  backward: a second forward sweep; the suffix sum the CUDA kernel gathers
            back-to-front is obtained from the identity
            suffix_k = <g, out_total> - <g, prefix_k>, so no reverse pass is
            needed. Feature gradients reduce over pixels on the MXU
            (mxu.dot_g, ~2^-18 two-way split — M = 3*c_out rows only).

Feature rows of gdat: 0 mean_x, 1 mean_y, 2 conic_a, 3 conic_b, 4 conic_c,
5 radius, 6 opacity, 7.. color channels (padded to F=16 rows; invalid
worklist entries carry opacity 0).

Tile ordering is either raster (sntx=0) or supertile-major "sub4x4"
(sntx=ntx//4: tiles grouped 4x4 per supertile, as emitted by
pallas_binning.bin_hierarchical — saves a large re-permutation gather).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .mxu import dot_g, split3_bf16
from .reference import TRANSMITTANCE_EPS

F = 16  # feature rows (padded)
ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99


def _pixel_coords(tile_id, tile_size: int, ntx: int, sntx: int, p: int):
    """Per-tile pixel centers: (P, 1) px and py, float32."""
    i = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)
    if sntx:
        s = tile_id // 16
        wi = tile_id % 16
        tx = ((s % sntx) * 4 + wi % 4) * tile_size
        ty = ((s // sntx) * 4 + wi // 4) * tile_size
    else:
        tx = (tile_id % ntx) * tile_size
        ty = (tile_id // ntx) * tile_size
    px = (tx + i % tile_size).astype(jnp.float32)
    py = (ty + i // tile_size).astype(jnp.float32)
    return px, py


def _lane_cumsum(x, chunk: int, exclusive: bool):
    """Prefix sum along the lane axis via triangular-matrix matmuls.

    Exact to f32 accumulation: x is split 3-way into bf16 parts
    (mxu.split3_bf16) and the 0/1 triangular matrix is bf16-exact, so the
    MXU's bf16 passes accumulate the true f32 sum. Runs on the MXU so it
    overlaps the VPU alpha/color work of the paired chunk (a VPU
    Hillis-Steele scan measured SLOWER end-to-end: it serialized the whole
    chunk body on the VPU port).

    Computed block-hierarchically in 128-lane blocks: each block's local
    prefix is one (3P, 128) x (128, 128) matmul (full MXU lane utilization,
    half the MACs of a monolithic (chunk, chunk) triangle), and the running
    inter-block offset is a vector reduce + broadcast add."""
    p = x.shape[0]
    bs = 128 if chunk % 128 == 0 and chunk > 128 else chunk
    nb = chunk // bs
    rows = jax.lax.broadcasted_iota(jnp.int32, (bs, bs), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (bs, bs), 1)
    tri = ((rows < cols) if exclusive else (rows <= cols)).astype(jnp.bfloat16)
    x3 = split3_bf16(x)  # (3P, chunk)
    outs = []
    offset = jnp.zeros((p, 1), jnp.float32)
    for j in range(nb):
        yj = jax.lax.dot_general(
            x3[:, j * bs : (j + 1) * bs],
            tri,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        outs.append(yj[:p] + yj[p : 2 * p] + yj[2 * p :] + offset)
        if j + 1 < nb:
            offset = offset + jnp.sum(
                x[:, j * bs : (j + 1) * bs], axis=1, keepdims=True
            )
    return outs[0] if nb == 1 else jnp.concatenate(outs, axis=1)


def _chunk_alpha(sl, px, py):
    """sl: (F, CK) chunk features; px/py: (P, 1). Returns alpha (P, CK) and
    intermediates for backward."""
    dx = px - sl[0:1, :]
    dy = py - sl[1:2, :]
    a, b, c = sl[2:3, :], sl[3:4, :], sl[4:5, :]
    radius = sl[5:6, :]
    opac = sl[6:7, :]
    power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy
    raw = opac * jnp.exp(power)
    alpha = jnp.minimum(ALPHA_MAX, raw)
    keep = (
        (power <= 0.0)
        & (alpha >= ALPHA_MIN)
        & (dx * dx + dy * dy <= radius * radius)
    )
    alpha = jnp.where(keep, alpha, 0.0)
    uncapped = keep & (raw < ALPHA_MAX)
    return alpha, dx, dy, power, uncapped


def _composite_fwd_kernel(
    counts_ref, gdat_ref, acc_ref, tfin_ref,
    *, tile_size: int, ntx: int, sntx: int, num_tiles: int, chunk: int,
    c_out: int,
):
    p = tile_size * tile_size
    k = gdat_ref.shape[2]
    i = pl.program_id(0)
    # Dynamic trip count: skip the all-empty tail of the worklist.
    count = jnp.minimum(counts_ref[i], k)
    num_chunks = (count + chunk - 1) // chunk
    tile = i % num_tiles  # batch is folded into the grid
    px, py = _pixel_coords(tile, tile_size, ntx, sntx, p)

    def prep(ci):
        # Carry-independent per-chunk work (VPU alpha + MXU cumsum).
        sl = gdat_ref[0, :, pl.ds(ci * chunk, chunk)]
        alpha, _, _, _, _ = _chunk_alpha(sl, px, py)
        log1m = jnp.log1p(-alpha)
        excl = _lane_cumsum(log1m, chunk, exclusive=True)
        return sl, alpha, log1m, excl

    def combine(carry, sl, alpha, log1m, excl):
        t_run, acc = carry  # (P, 1) linear transmittance; (P, c_out)
        t_before = t_run * jnp.exp(excl)  # exclusive cumprod
        live = t_before >= TRANSMITTANCE_EPS
        contrib = jnp.where(live, alpha * t_before, 0.0)
        # Per-channel VPU FMA + lane reduce: only the c_out live channels are
        # computed (the MXU path streamed M = 3P rows against 8 padded
        # channels — ~4x the cycles for c_out=3), exact in f32.
        acc = acc + jnp.concatenate(
            [
                jnp.sum(contrib * sl[7 + ch : 8 + ch, :], axis=1, keepdims=True)
                for ch in range(c_out)
            ],
            axis=1,
        )
        # Freeze t once a pixel saturates (oracle convention: t_final stops
        # multiplying below TRANSMITTANCE_EPS) — also what the backward's
        # live-gated d_alpha assumes of t_final.
        t_run = t_run * jnp.exp(
            jnp.sum(jnp.where(live, log1m, 0.0), axis=1, keepdims=True)
        )
        return t_run, acc

    t_run = jnp.ones((p, 1), jnp.float32)
    acc = jnp.zeros((p, c_out), jnp.float32)
    if (k // chunk) % 2 == 0:
        # Pairs: chunk B's prep is carry-independent, so its MXU cumsum
        # overlaps chunk A's VPU combine. A beyond-count tail chunk is
        # all-zero worklist padding (alpha 0) — an exact no-op — so rounding
        # the trip count up to a whole pair is exact.
        def pair_body(pj, carry):
            pa = prep(2 * pj)
            pb = prep(2 * pj + 1)
            return combine(combine(carry, *pa), *pb)

        t_run, acc = jax.lax.fori_loop(
            0, (num_chunks + 1) // 2, pair_body, (t_run, acc)
        )
    else:
        def body(ci, carry):
            return combine(carry, *prep(ci))

        t_run, acc = jax.lax.fori_loop(0, num_chunks, body, (t_run, acc))
    acc_ref[0] = jnp.pad(acc, ((0, 0), (0, 8 - c_out)))
    tfin_ref[0] = t_run.reshape(1, p)


def _composite_bwd_kernel(
    counts_ref, gdat_ref, gacc_ref, gtfin_ref, accres_ref, tfinres_ref, dgdat_ref,
    *, tile_size: int, ntx: int, sntx: int, num_tiles: int, chunk: int,
    c_out: int,
):
    p = tile_size * tile_size
    k = gdat_ref.shape[2]
    i = pl.program_id(0)
    count = jnp.minimum(counts_ref[i], k)
    num_chunks = (count + chunk - 1) // chunk
    tile = i % num_tiles
    px, py = _pixel_coords(tile, tile_size, ntx, sntx, p)

    # The untouched tail must still produce zero gradients.
    dgdat_ref[...] = jnp.zeros(dgdat_ref.shape, dgdat_ref.dtype)

    g = gacc_ref[0][:, :c_out]  # (P, c_out) cotangent of the live channels
    g_tfin = gtfin_ref[0].reshape(p, 1)
    t_final = tfinres_ref[0].reshape(p, 1)
    # <g, out_total> per pixel (padding rows of acc are zero).
    g_dot_total = jnp.sum(
        g * accres_ref[0][:, :c_out], axis=1, keepdims=True
    )  # (P, 1)

    def prep(ci):
        # Carry-independent per-chunk work (VPU alpha + cumsum + <g, c_k>).
        sl = gdat_ref[0, :, pl.ds(ci * chunk, chunk)]
        alpha, dx, dy, power, uncapped = _chunk_alpha(sl, px, py)
        log1m = jnp.log1p(-alpha)
        excl = _lane_cumsum(log1m, chunk, exclusive=True)
        # <g, c_k> per pixel-gaussian: (P, CK), c_out VPU broadcast-FMAs.
        g_dot_c = sum(
            g[:, ch : ch + 1] * sl[7 + ch : 8 + ch, :] for ch in range(c_out)
        )
        return ci, sl, alpha, dx, dy, power, uncapped, log1m, excl, g_dot_c

    def combine(carry, ci, sl, alpha, dx, dy, power, uncapped, log1m, excl,
                g_dot_c):
        t_run, prefix = carry  # (P, 1), (P, 1) running <g, prefix>
        t_before = t_run * jnp.exp(excl)
        live = t_before >= TRANSMITTANCE_EPS
        alpha_t = jnp.where(live, alpha * t_before, 0.0)  # (P, CK)
        s = g_dot_c * alpha_t  # <g, contrib_k>
        prefix_k = prefix + _lane_cumsum(s, chunk, exclusive=False)
        suffix = g_dot_total - prefix_k  # <g, A_k>

        one_minus = jnp.maximum(1.0 - alpha, 1.0 - ALPHA_MAX)
        d_alpha = jnp.where(
            live,
            g_dot_c * t_before - suffix / one_minus - g_tfin * t_final / one_minus,
            0.0,
        )

        # d color: sum over pixels of g[p, :] * alpha_t[p, k] -> (c_out, CK).
        d_rgb = dot_g(g, alpha_t, dimension_numbers=(((0,), (0,)), ((), ())))

        # Chain through alpha = opac * exp(power) (capped & masked).
        a, b, c = sl[2:3, :], sl[3:4, :], sl[4:5, :]
        d_alpha_eff = jnp.where(uncapped, d_alpha, 0.0)
        d_opac = jnp.sum(d_alpha_eff * jnp.exp(power), axis=0, keepdims=True)
        d_power = d_alpha_eff * alpha
        d_conic_a = jnp.sum(d_power * (-0.5 * dx * dx), axis=0, keepdims=True)
        d_conic_b = jnp.sum(d_power * (-dx * dy), axis=0, keepdims=True)
        d_conic_c = jnp.sum(d_power * (-0.5 * dy * dy), axis=0, keepdims=True)
        d_mx = jnp.sum(d_power * (a * dx + b * dy), axis=0, keepdims=True)
        d_my = jnp.sum(d_power * (c * dy + b * dx), axis=0, keepdims=True)
        d_radius = jnp.zeros_like(d_mx)

        dg_top = jnp.concatenate(
            [d_mx, d_my, d_conic_a, d_conic_b, d_conic_c, d_radius, d_opac],
            axis=0,
        )  # (7, CK)
        dgdat_ref[0, 0:7, pl.ds(ci * chunk, chunk)] = dg_top
        # Channels >= c_out keep the pre-zeroed value (never written).
        dgdat_ref[0, 7 : 7 + c_out, pl.ds(ci * chunk, chunk)] = d_rgb

        t_run = t_run * jnp.exp(
            jnp.sum(jnp.where(live, log1m, 0.0), axis=1, keepdims=True)
        )
        prefix = prefix + jnp.sum(s, axis=1, keepdims=True)
        return t_run, prefix

    t_run = jnp.ones((p, 1), jnp.float32)
    prefix = jnp.zeros((p, 1), jnp.float32)
    if (k // chunk) % 2 == 0:
        # Pairs (see forward): chunk B's carry-independent prep overlaps
        # chunk A's combine; the tail chunk is all-zero padding (alpha 0,
        # g_dot_c x 0), whose dgdat writes are exactly the pre-zeroed value.
        def pair_body(pj, carry):
            pa = prep(2 * pj)
            pb = prep(2 * pj + 1)
            return combine(combine(carry, *pa), *pb)

        jax.lax.fori_loop(0, (num_chunks + 1) // 2, pair_body, (t_run, prefix))
    else:
        def body(ci, carry):
            return combine(carry, *prep(ci))

        jax.lax.fori_loop(0, num_chunks, body, (t_run, prefix))


def _fwd_call(gdat, counts, tile_size, ntx, sntx, num_tiles, chunk, interpret,
              c_out):
    bt, f, k = gdat.shape
    p = tile_size * tile_size
    kernel = functools.partial(
        _composite_fwd_kernel,
        tile_size=tile_size, ntx=ntx, sntx=sntx, num_tiles=num_tiles,
        chunk=chunk, c_out=c_out,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bt,),
        in_specs=[
            pl.BlockSpec(
                (1, f, k), lambda i, _c: (i, 0, 0), memory_space=pltpu.VMEM
            )
        ],
        out_specs=(
            pl.BlockSpec((1, p, 8), lambda i, _c: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, p), lambda i, _c: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((bt, p, 8), jnp.float32),
            jax.ShapeDtypeStruct((bt, 1, p), jnp.float32),
        ),
        interpret=interpret,
    )(counts, gdat)


def _bwd_call(
    gdat, counts, gacc, gtfin, accres, tfinres, tile_size, ntx, sntx,
    num_tiles, chunk, interpret, c_out,
):
    bt, f, k = gdat.shape
    p = tile_size * tile_size
    kernel = functools.partial(
        _composite_bwd_kernel,
        tile_size=tile_size, ntx=ntx, sntx=sntx, num_tiles=num_tiles,
        chunk=chunk, c_out=c_out,
    )

    def spec(shape):
        return pl.BlockSpec(
            (1, *shape), lambda i, _c: (i,) + (0,) * len(shape),
            memory_space=pltpu.VMEM,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bt,),
        in_specs=[
            spec((f, k)), spec((p, 8)), spec((1, p)), spec((p, 8)), spec((1, p))
        ],
        out_specs=spec((f, k)),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bt, f, k), jnp.float32),
        interpret=interpret,
    )(counts, gdat, gacc, gtfin, accres, tfinres)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7, 8))
def composite_pallas(gdat, counts, tile_size, ntx, sntx, num_tiles, chunk,
                     interpret, c_out=8):
    """gdat: (B*T, F, K), counts: (B*T,) int32 worklist lengths
    -> (acc (B*T, P, 8), t_final (B*T, 1, P)). sntx=0 for raster tile order,
    ntx//4 for supertile-major (sub4x4) order. c_out: number of live color
    channels (static); acc channels >= c_out are zero."""
    return _fwd_call(
        gdat, counts, tile_size, ntx, sntx, num_tiles, chunk, interpret, c_out
    )


def _vjp_fwd(gdat, counts, tile_size, ntx, sntx, num_tiles, chunk, interpret,
             c_out):
    acc, tfin = _fwd_call(
        gdat, counts, tile_size, ntx, sntx, num_tiles, chunk, interpret, c_out
    )
    return (acc, tfin), (gdat, counts, acc, tfin)


def _vjp_bwd(tile_size, ntx, sntx, num_tiles, chunk, interpret, c_out,
             residuals, cotangents):
    gdat, counts, acc, tfin = residuals
    gacc, gtfin = cotangents
    dgdat = _bwd_call(
        gdat, counts, gacc, gtfin, acc, tfin, tile_size, ntx, sntx, num_tiles,
        chunk, interpret, c_out,
    )
    return (dgdat, None)


composite_pallas.defvjp(_vjp_fwd, _vjp_bwd)
