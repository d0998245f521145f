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
5 radius, 6 opacity, 7.. color channels (F = 7 + C rows; invalid worklist
entries carry opacity 0).

Tile ordering is either raster (levels=None) or tree/path-major (levels =
the (fy, fx) fan-out tuple used by pallas_binning.bin_tree — consuming the
binning output directly saves a large re-permutation gather).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .mxu import dot_g, split2_bf16, split3_bf16
from .reference import TRANSMITTANCE_EPS

ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99

# Mosaic's default scoped-vmem limit is 16 MB; v5e has 128 MB. The pair
# unroll keeps two chunks' (P, CK) temporaries live, which breaches 16 MB
# at chunk=512 (and at tile_size=32) — the round-4 "chunk=512 OOM" was this
# default, not physical VMEM.
_VMEM_LIMIT = 100 * 1024 * 1024


def _pixel_coords(tile_id, tile_size: int, ntx: int, levels, num_tiles: int,
                  p: int):
    """Per-tile pixel centers: (P, 1) px and py, float32."""
    from .pallas_binning import _decode_path

    i = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)
    if levels:
        tty, ttx = _decode_path(tile_id, levels, num_tiles)
        tx = ttx * tile_size
        ty = tty * tile_size
    else:
        tx = (tile_id % ntx) * tile_size
        ty = (tile_id // ntx) * tile_size
    px = (tx + i % tile_size).astype(jnp.float32)
    py = (ty + i // tile_size).astype(jnp.float32)
    return px, py


def _lane_cumsum_multi(xs, chunk: int, parts_list, exclusive: bool = True):
    """Prefix sums of several row blocks along the lane axis, fused into ONE
    triangular-matrix matmul stream per 128-lane block.

    Each x in xs is split into `parts` bf16 rows (1 = raw bf16 truncation,
    2^-8 relative; 2 = <= 2^-18 relative; 3 = exact f32 — the 0/1 triangle
    is bf16-exact, so bf16 passes accumulated in f32 reproduce the split's
    sum exactly). All splits are stacked so every 128-block runs a single
    (sum_i parts_i * P_i, 128) x (128, 128) matmul — full MXU lane
    utilization, one launch. Runs on the MXU so it overlaps the VPU
    alpha/color work of the paired chunk (a VPU Hillis-Steele scan measured
    SLOWER end-to-end: it serialized the whole chunk body on the VPU port).
    The running inter-block offset per x is a vector reduce + broadcast add
    of the ORIGINAL f32 rows (exact regardless of parts).

    Output rows of a dot_general are independent, so each x's result is
    bit-identical whether computed alone or stacked with others — the
    forward/backward transmittance gates stay consistent as long as both
    sides use the same `parts` for the same x.
    """
    metas = []
    splits = []
    for x, parts in zip(xs, parts_list):
        if parts == 1:
            s = x.astype(jnp.bfloat16)
        elif parts == 2:
            s = split2_bf16(x)
        else:
            s = split3_bf16(x)
        metas.append((x.shape[0], parts))
        splits.append(s)
    stacked = splits[0] if len(splits) == 1 else jnp.concatenate(splits, axis=0)

    bs = 128 if chunk % 128 == 0 and chunk > 128 else chunk
    nb = chunk // bs
    rows = jax.lax.broadcasted_iota(jnp.int32, (bs, bs), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (bs, bs), 1)
    tri = ((rows < cols) if exclusive else (rows <= cols)).astype(jnp.bfloat16)

    outs = [[] for _ in xs]
    offsets = [jnp.zeros((p, 1), jnp.float32) for p, _ in metas]
    for j in range(nb):
        yj = jax.lax.dot_general(
            stacked[:, j * bs : (j + 1) * bs],
            tri,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        base = 0
        for i, (p, parts) in enumerate(metas):
            total = yj[base : base + p]
            for k in range(1, parts):
                total = total + yj[base + k * p : base + (k + 1) * p]
            outs[i].append(total + offsets[i])
            base += parts * p
        if j + 1 < nb:
            for i, x in enumerate(xs):
                offsets[i] = offsets[i] + jnp.sum(
                    x[:, j * bs : (j + 1) * bs], axis=1, keepdims=True
                )
    return [o[0] if nb == 1 else jnp.concatenate(o, axis=1) for o in outs]


def _lane_cumsum(x, chunk: int, exclusive: bool, parts: int = 3):
    """Single-input wrapper over _lane_cumsum_multi."""
    return _lane_cumsum_multi([x], chunk, [parts], exclusive)[0]


def _chunk_alpha(sl, px, py):
    """sl: (F, CK) chunk features; px/py: (P, 1). Returns alpha (P, CK) and
    intermediates for backward."""
    dx = px - sl[0:1, :]
    dy = py - sl[1:2, :]
    a, b, c = sl[2:3, :], sl[3:4, :], sl[4:5, :]
    radius = sl[5:6, :]
    opac = sl[6:7, :]
    power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy
    exp_power = jnp.exp(power)
    raw = opac * exp_power
    alpha = jnp.minimum(ALPHA_MAX, raw)
    keep = (
        (power <= 0.0)
        & (alpha >= ALPHA_MIN)
        & (dx * dx + dy * dy <= radius * radius)
    )
    alpha = jnp.where(keep, alpha, 0.0)
    uncapped = keep & (raw < ALPHA_MAX)
    return alpha, dx, dy, power, uncapped, exp_power


def _composite_fwd_kernel(
    counts_ref, gdat_ref, acc_ref, tfin_ref,
    *, tile_size: int, ntx: int, levels, num_tiles: int, chunk: int,
    c_out: int, max_chunks: int, parts_t: int,
):
    p = tile_size * tile_size
    i = pl.program_id(0)
    # Dynamic trip count: skip the all-empty tail of the worklist. max_chunks
    # = capacity // chunk bounds the sweep to the clean [0, capacity) region
    # of the worklist.
    count = jnp.minimum(counts_ref[i], max_chunks * chunk)
    num_chunks = (count + chunk - 1) // chunk
    tile = i % num_tiles  # batch is folded into the grid
    px, py = _pixel_coords(tile, tile_size, ntx, levels, num_tiles, p)

    def prep(ci):
        # Carry-independent per-chunk work (VPU alpha + MXU cumsum).
        # parts_t = 2 on the exact path: the backward uses the IDENTICAL
        # 2-way computation, so the live gates flip bit-identically; the
        # absolute transmittance error is <= |excl| * 2^-18 <= 3.5e-5
        # relative in the live region (|excl| < -log EPS). parts_t = 1 is
        # the bf16 inference tier (~2^-8).
        sl = gdat_ref[0, :, pl.ds(ci * chunk, chunk)]
        alpha = _chunk_alpha(sl, px, py)[0]
        log1m = jnp.log1p(-alpha)
        excl = _lane_cumsum(log1m, chunk, exclusive=True, parts=parts_t)
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

    # Exact-trip software pipelining with saturation early-exit: chunk B's
    # prep is carry-independent, so Mosaic can overlap its MXU cumsum with
    # chunk A's VPU combine inside a pair's straight-line body; the odd tail
    # chunk runs as a single conditional step instead of a rounded-up whole
    # pair. (A rotated loop carrying prep results across iterations would
    # pipeline better still, but Mosaic cannot legalize while_loops whose
    # carry is ~MBs of vector registers.) Once EVERY pixel's transmittance
    # is below TRANSMITTANCE_EPS, later Gaussians contribute exactly zero
    # (the live gate), so the sweep stops — the reference CUDA kernel's
    # per-tile termination on saturated tiles.
    def alive(t_run):
        return jnp.max(t_run) >= TRANSMITTANCE_EPS

    def pair_cond(state):
        pj, (t_run, _) = state
        return (pj < num_chunks // 2) & alive(t_run)

    def pair_body(state):
        pj, carry = state
        pa = prep(2 * pj)
        pb = prep(2 * pj + 1)
        return pj + 1, combine(combine(carry, *pa), *pb)

    _, (t_run, acc) = jax.lax.while_loop(
        pair_cond, pair_body, (jnp.int32(0), (t_run, acc))
    )
    t_run, acc = jax.lax.cond(
        (num_chunks % 2 == 1) & alive(t_run),
        lambda carry: combine(carry, *prep(num_chunks - 1)),
        lambda carry: carry,
        (t_run, acc),
    )
    acc_ref[0] = jnp.pad(acc, ((0, 0), (0, 8 - c_out)))
    tfin_ref[0] = t_run.reshape(1, p)


def _composite_bwd_kernel(
    counts_ref, gdat_ref, gacc_ref, gtfin_ref, accres_ref, tfinres_ref, dgdat_ref,
    *, tile_size: int, ntx: int, levels, num_tiles: int, chunk: int,
    c_out: int, max_chunks: int, parts_t: int,
):
    p = tile_size * tile_size
    i = pl.program_id(0)
    count = jnp.minimum(counts_ref[i], max_chunks * chunk)
    num_chunks = (count + chunk - 1) // chunk
    tile = i % num_tiles
    px, py = _pixel_coords(tile, tile_size, ntx, levels, num_tiles, p)

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
        # Carry-independent per-chunk work (VPU alpha + BOTH cumsums +
        # <g, c_k>). The inclusive contribution cumsum is made carry-free by
        # factoring the running transmittance out of the sum:
        #   s_k = <g, c_k> alpha_k t_before_k = t_run * s'_k  with
        #   s'_k = <g, c_k> alpha_k exp(excl_k)
        # so cumsum(s') runs here on the MXU, fully overlapped with the
        # paired chunk's VPU combine; the live gate (a per-pixel PREFIX mask,
        # since t_before is non-increasing along lanes) is applied in
        # combine as a cheap select against the live total.
        sl = gdat_ref[0, :, pl.ds(ci * chunk, chunk)]
        alpha, dx, dy, power, uncapped, exp_power = _chunk_alpha(sl, px, py)
        log1m = jnp.log1p(-alpha)
        # <g, c_k> per pixel-gaussian: (P, CK), c_out VPU broadcast-FMAs.
        g_dot_c = sum(
            g[:, ch : ch + 1] * sl[7 + ch : 8 + ch, :] for ch in range(c_out)
        )
        # Two sequential cumsum calls (NOT fusable into one stacked matmul:
        # s_prime is built FROM excl, so the second cumsum's input depends
        # on the first's output). The transmittance cumsum uses the SAME
        # parts_t as the forward: the live gate must flip identically, and
        # identical computation (not exactness) is what guarantees that.
        # The contribution cumsum stays 3-way exact: a 2-way split there
        # measured d_conic errors up to ~5e-3 — the error rides d_power and
        # is amplified by dx^2 (up to radius^2) and 1/(1-alpha) in the
        # conic/mean gradients. exp(excl) is shared with combine's t_before
        # (it was computed twice per chunk before the round-5 trace).
        excl = _lane_cumsum(log1m, chunk, exclusive=True, parts=parts_t)
        e_excl = jnp.exp(excl)
        s_prime = g_dot_c * alpha * e_excl
        cs_prime = _lane_cumsum(s_prime, chunk, exclusive=False)
        return (ci, sl, alpha, dx, dy, power, uncapped, exp_power, log1m,
                e_excl, g_dot_c, s_prime, cs_prime)

    def combine(carry, ci, sl, alpha, dx, dy, power, uncapped, exp_power,
                log1m, e_excl, g_dot_c, s_prime, cs_prime):
        t_run, prefix = carry  # (P, 1), (P, 1) running <g, prefix>
        t_before = t_run * e_excl
        live = t_before >= TRANSMITTANCE_EPS
        alpha_t = jnp.where(live, alpha * t_before, 0.0)  # (P, CK)
        # live is a prefix mask per pixel: cumsum(s' * live) equals cs_prime
        # on live lanes and freezes at the live total on dead lanes.
        s_live_total = jnp.sum(
            jnp.where(live, s_prime, 0.0), axis=1, keepdims=True
        )
        gated_cs = jnp.where(live, cs_prime, s_live_total)
        prefix_k = prefix + t_run * gated_cs
        suffix = g_dot_total - prefix_k  # <g, A_k>

        one_minus = jnp.maximum(1.0 - alpha, 1.0 - ALPHA_MAX)
        d_alpha = jnp.where(
            live,
            g_dot_c * t_before - suffix / one_minus - g_tfin * t_final / one_minus,
            0.0,
        )

        # d color: sum over pixels of g[p, :] * alpha_t[p, k] -> (c_out, CK).
        d_rgb = dot_g(g, alpha_t, dimension_numbers=(((0,), (0,)), ((), ())))

        # Chain through alpha = opac * exp(power) (capped & masked);
        # exp(power) is reused from _chunk_alpha, not recomputed.
        a, b, c = sl[2:3, :], sl[3:4, :], sl[4:5, :]
        d_alpha_eff = jnp.where(uncapped, d_alpha, 0.0)
        d_opac = jnp.sum(d_alpha_eff * exp_power, axis=0, keepdims=True)
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

        prefix = prefix + t_run * s_live_total
        t_run = t_run * jnp.exp(
            jnp.sum(jnp.where(live, log1m, 0.0), axis=1, keepdims=True)
        )
        return t_run, prefix

    t_run = jnp.ones((p, 1), jnp.float32)
    prefix = jnp.zeros((p, 1), jnp.float32)

    # Exact-trip pairing with a conditional odd tail and saturation
    # early-exit (see forward): past saturation every contribution AND
    # gradient is exactly zero, matching the pre-zeroed dgdat. Both cumsums
    # run in the carry-independent prep (the contribution cumsum is made
    # carry-free by factoring t_run out), so the pair body's MXU work is
    # free of the carry chain.
    def alive(t_run):
        return jnp.max(t_run) >= TRANSMITTANCE_EPS

    def pair_cond(state):
        pj, (t_run, _) = state
        return (pj < num_chunks // 2) & alive(t_run)

    def pair_body(state):
        pj, carry = state
        pa = prep(2 * pj)
        pb = prep(2 * pj + 1)
        return pj + 1, combine(combine(carry, *pa), *pb)

    _, carry = jax.lax.while_loop(
        pair_cond, pair_body, (jnp.int32(0), (t_run, prefix))
    )
    jax.lax.cond(
        (num_chunks % 2 == 1) & alive(carry[0]),
        lambda c: combine(c, *prep(num_chunks - 1)),
        lambda c: c,
        carry,
    )


def _max_chunks(k, chunk, capacity):
    cap = k if capacity is None else min(capacity, k)
    assert cap % chunk == 0
    return cap // chunk


def _fwd_call(gdat, counts, tile_size, ntx, levels, num_tiles, chunk,
              interpret, c_out, capacity, parts_t):
    bt, f, k = gdat.shape
    p = tile_size * tile_size
    kernel = functools.partial(
        _composite_fwd_kernel,
        tile_size=tile_size, ntx=ntx, levels=levels, num_tiles=num_tiles,
        chunk=chunk, c_out=c_out, max_chunks=_max_chunks(k, chunk, capacity),
        parts_t=parts_t,
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
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )(counts, gdat)


def _bwd_call(
    gdat, counts, gacc, gtfin, accres, tfinres, tile_size, ntx, levels,
    num_tiles, chunk, interpret, c_out, capacity, parts_t,
):
    bt, f, k = gdat.shape
    p = tile_size * tile_size
    kernel = functools.partial(
        _composite_bwd_kernel,
        tile_size=tile_size, ntx=ntx, levels=levels, num_tiles=num_tiles,
        chunk=chunk, c_out=c_out, max_chunks=_max_chunks(k, chunk, capacity),
        parts_t=parts_t,
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
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )(counts, gdat, gacc, gtfin, accres, tfinres)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7, 8, 9, 10)
)
def composite_pallas(gdat, counts, tile_size, ntx, levels, num_tiles, chunk,
                     interpret, c_out=8, capacity=None, parts_t=2):
    """gdat: (B*T, F, K), counts: (B*T,) int32 worklist lengths
    -> (acc (B*T, P, 8), t_final (B*T, 1, P)). levels=None for raster tile
    order, or the bin_tree fan-out tuple for tree/path-major order. c_out:
    number of live color channels (static); acc channels >= c_out are zero.
    capacity bounds the compositing sweep to the clean prefix of the
    worklist; None means all K columns are in play. parts_t: bf16 split
    depth of the transmittance cumsum — 2 (default, <= 3.5e-5 relative,
    differentiable) or 1 (bf16 inference tier, forward-only)."""
    return _fwd_call(
        gdat, counts, tile_size, ntx, levels, num_tiles, chunk, interpret,
        c_out, capacity, parts_t,
    )


def _vjp_fwd(gdat, counts, tile_size, ntx, levels, num_tiles, chunk,
             interpret, c_out, capacity, parts_t):
    acc, tfin = _fwd_call(
        gdat, counts, tile_size, ntx, levels, num_tiles, chunk, interpret,
        c_out, capacity, parts_t,
    )
    return (acc, tfin), (gdat, counts, acc, tfin)


def _vjp_bwd(tile_size, ntx, levels, num_tiles, chunk, interpret, c_out,
             capacity, parts_t, residuals, cotangents):
    if parts_t < 2:
        raise NotImplementedError(
            "precision='bf16' rendering is an inference-only tier — "
            "differentiate with the default exact-path precision instead"
        )
    gdat, counts, acc, tfin = residuals
    gacc, gtfin = cotangents
    dgdat = _bwd_call(
        gdat, counts, gacc, gtfin, acc, tfin, tile_size, ntx, levels,
        num_tiles, chunk, interpret, c_out, capacity, parts_t,
    )
    return (dgdat, None)


composite_pallas.defvjp(_vjp_fwd, _vjp_bwd)
