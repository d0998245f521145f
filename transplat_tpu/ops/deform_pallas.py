"""Pallas TPU kernels for deformable score-map sampling (native component #2).

The XLA formulation in ops/deform.py (_scores_fwd_chunk/_scores_bwd_chunk)
is HBM-bandwidth-bound: each lax.map chunk materializes (QC, H, DP) indicator
and row-mix tensors in HBM (~3.2 GB per cross-attention call at the flagship
Q=4096, D=128, P=4 — measured as the train step's 12 ms of `while` time in
artifacts/testsuite_r5/train_trace_attribution.txt). These kernels run the
same separable bilinear-matmul algorithm with every intermediate VMEM-
resident: per query PAIR, one block-diagonal (2H, 2W) score matrix is built
and the x-mix runs as a single full-K MXU matmul against the stacked
indicator matrix; the y-mix is an elementwise multiply + half-reduce.

Numerical behavior matches ops/deform.py: the matmuls carry no explicit
precision, so they follow jax's global default matmul precision exactly like
the einsums they replace (bf16 one-pass in production, exact under the test
suite's `highest` default); out-of-range bilinear corners match no indicator
lane and so contribute zero (torch grid_sample align_corners=False,
zero-padding semantics).

Layout: the DP axis is P-MAJOR (dp = p * D + d), so the final sum over P is
D-wide lane slices — no lanes->sublanes relayout anywhere in the kernels.

Replaces: mmcv ms_deform_attn CUDA ext (reference
src/model/utils/multi_scale_deformable_attn_function.py) for the score-
sampling attentions (UVCoarse/UVCross, attention.py:279-551).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_LIMIT = 100 * 1024 * 1024


def _pair_indicator(vals, fracs, n, rows_iota, half, fold=None):
    """Stacked indicator matrix (2n, DP) for a query pair.

    vals/fracs: (2, DP) integer corner index and fractional weight rows for
    the pair; rows_iota: (2n, DP) iota over dim 0; half: row half-selector
    (rows_iota < n). Entry [r, dp] = (1-frac)·[r%n == val] + frac·[r%n ==
    val+1], with the pair's first query in rows [0, n) and the second in
    [n, 2n). fold: optional (2, DP) extra factor (attention weights).
    """
    idx = rows_iota % n
    v = jnp.where(half, vals[0:1], vals[1:2])
    f = jnp.where(half, fracs[0:1], fracs[1:2])
    lo, hi = 1.0 - f, f
    if fold is not None:
        a = jnp.where(half, fold[0:1], fold[1:2])
        lo, hi = lo * a, hi * a
    return jnp.where(idx == v, lo, 0.0) + jnp.where(idx == v + 1, hi, 0.0)


def _pair_diff_indicator(vals, n, rows_iota, half):
    """d(indicator)/d(frac): +1 at val+1, -1 at val (stacked pair layout)."""
    idx = rows_iota % n
    v = jnp.where(half, vals[0:1], vals[1:2])
    return jnp.where(idx == v + 1, 1.0, 0.0) - jnp.where(idx == v, 1.0, 0.0)


def _block_diag_pair(sa, sb, h, w):
    """[[sa, 0], [0, sb]] (2h, 2w) from two (h, w) score maps."""
    z = jnp.zeros((h, w), sa.dtype)
    return jnp.concatenate(
        [jnp.concatenate([sa, z], axis=1), jnp.concatenate([z, sb], axis=1)],
        axis=0,
    )


def _nt(a, b):
    """a (M, K) x b (N, K) -> (M, N): contraction on both lane dims (MXU
    'NT' form — no operand transpose materialized)."""
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _scores_fwd_kernel(
    scores_ref, x0_ref, y0_ref, wx_ref, wy_ref, aw_ref, out_ref,
    *, d: int, p: int, h: int, w: int, qb: int,
):
    # 8 queries (4 block-diag pairs) per trip: every dynamic sublane offset
    # is 8*i, which Mosaic can prove 8-aligned (2*i loads fail to legalize).
    dp = d * p
    rows_w = jax.lax.broadcasted_iota(jnp.int32, (2 * w, dp), 0)
    half_w = rows_w < w
    rows_h = jax.lax.broadcasted_iota(jnp.int32, (2 * h, dp), 0)
    half_h = rows_h < h

    def body(i, _):
        base = pl.multiple_of(8 * i, 8)
        s8 = scores_ref[pl.ds(base, 8)]  # (8, H, W)
        x8 = x0_ref[pl.ds(base, 8)]  # (8, DP)
        y8 = y0_ref[pl.ds(base, 8)]
        wx8 = wx_ref[pl.ds(base, 8)]
        wy8 = wy_ref[pl.ds(base, 8)]
        aw8 = aw_ref[pl.ds(base, 8)]
        outs = []
        for j in range(4):
            q0 = 2 * j
            lhs = _block_diag_pair(s8[q0], s8[q0 + 1], h, w)
            # x-mix indicator carries the attention weights (one fold, so
            # the final P-sum is a plain slice-add).
            xwt = _pair_indicator(
                x8[q0 : q0 + 2], wx8[q0 : q0 + 2], w, rows_w, half_w,
                fold=aw8[q0 : q0 + 2],
            )  # (2W, DP)
            ywt = _pair_indicator(
                y8[q0 : q0 + 2], wy8[q0 : q0 + 2], h, rows_h, half_h
            )
            rx = jnp.dot(lhs, xwt, preferred_element_type=jnp.float32)
            prod = ywt * rx  # (2H, DP)
            for s in (
                jnp.sum(prod[:h], axis=0, keepdims=True),
                jnp.sum(prod[h:], axis=0, keepdims=True),
            ):
                acc = s[:, 0:d]
                for k in range(1, p):
                    acc = acc + s[:, k * d : (k + 1) * d]
                outs.append(acc)
        out_ref[pl.ds(base, 8), :] = jnp.concatenate(outs, axis=0)
        return 0

    jax.lax.fori_loop(0, qb // 8, body, 0)


def _scores_bwd_kernel(
    scores_ref, x0_ref, y0_ref, wx_ref, wy_ref, aw_ref, gbar_ref,
    dscores_ref, dwx_ref, dwy_ref, samp_ref,
    *, d: int, p: int, h: int, w: int, qb: int,
):
    dp = d * p
    rows_w = jax.lax.broadcasted_iota(jnp.int32, (2 * w, dp), 0)
    half_w = rows_w < w
    rows_h = jax.lax.broadcasted_iota(jnp.int32, (2 * h, dp), 0)
    half_h = rows_h < h

    def body(i, _):
        base = pl.multiple_of(8 * i, 8)
        s8 = scores_ref[pl.ds(base, 8)]  # (8, H, W)
        x8 = x0_ref[pl.ds(base, 8)]
        y8 = y0_ref[pl.ds(base, 8)]
        wx8 = wx_ref[pl.ds(base, 8)]
        wy8 = wy_ref[pl.ds(base, 8)]
        aw8 = aw_ref[pl.ds(base, 8)]
        g8 = gbar_ref[pl.ds(base, 8)]  # (8, D)
        samps, dwys, dwxs, dss = [], [], [], []
        for j in range(4):
            q0 = 2 * j
            x2, y2 = x8[q0 : q0 + 2], y8[q0 : q0 + 2]
            wx2, wy2 = wx8[q0 : q0 + 2], wy8[q0 : q0 + 2]
            lhs = _block_diag_pair(s8[q0], s8[q0 + 1], h, w)
            xwt = _pair_indicator(x2, wx2, w, rows_w, half_w)
            ywt = _pair_indicator(y2, wy2, h, rows_h, half_h)
            dxwt = _pair_diff_indicator(x2, w, rows_w, half_w)
            dywt = _pair_diff_indicator(y2, h, rows_h, half_h)

            # sbar[dp] = gbar[d] * aw[dp], P-major: tile gbar P times.
            gtile = jnp.concatenate([g8[q0 : q0 + 2]] * p, axis=1)  # (2, DP)
            sbar = gtile * aw8[q0 : q0 + 2]  # (2, DP)
            sbar_b = jnp.where(half_h, sbar[0:1], sbar[1:2])  # (2H, DP)

            rx = jnp.dot(lhs, xwt, preferred_element_type=jnp.float32)
            rx2 = jnp.dot(lhs, dxwt, preferred_element_type=jnp.float32)
            prod = ywt * rx
            # sampled (no attention weights) for d_aw, computed outside.
            samps.append(jnp.sum(prod[:h], axis=0, keepdims=True))
            samps.append(jnp.sum(prod[h:], axis=0, keepdims=True))
            # d_wy = (sum_h dywt*rx) * sbar ; d_wx = (sum_h ywt*rx2) * sbar.
            pdy = dywt * rx
            dwys.append(jnp.sum(pdy[:h], axis=0, keepdims=True) * sbar[0:1])
            dwys.append(jnp.sum(pdy[h:], axis=0, keepdims=True) * sbar[1:2])
            pdx = ywt * rx2
            dwxs.append(jnp.sum(pdx[:h], axis=0, keepdims=True) * sbar[0:1])
            dwxs.append(jnp.sum(pdx[h:], axis=0, keepdims=True) * sbar[1:2])
            # d_scores[h, w] = sum_dp (ywt*sbar)[h, dp] * xwt[w, dp] — NT
            # matmul on the stacked pair; off-diagonal blocks are
            # cross-query garbage, sliced away.
            ds = _nt(ywt * sbar_b, xwt)  # (2H, 2W)
            dss.append(ds[:h, :w][None])
            dss.append(ds[h:, w:][None])
        samp_ref[pl.ds(base, 8), :] = jnp.concatenate(samps, axis=0)
        dwy_ref[pl.ds(base, 8), :] = jnp.concatenate(dwys, axis=0)
        dwx_ref[pl.ds(base, 8), :] = jnp.concatenate(dwxs, axis=0)
        dscores_ref[pl.ds(base, 8)] = jnp.concatenate(dss, axis=0)
        return 0

    jax.lax.fori_loop(0, qb // 8, body, 0)


def _pick_qb(q: int) -> int:
    for qb in (128, 64, 32, 16, 8):
        if q % qb == 0:
            return qb
    return 0


def supported(q: int, d: int, p: int, h: int, w: int) -> bool:
    """Shapes the kernels handle: 8-aligned query blocks (Mosaic sublane
    alignment), lane-aligned DP, and spatial maps that fit pair packing."""
    return (
        _pick_qb(q) >= 8
        and d * p % 128 == 0
        and d % 8 == 0
        and h % 8 == 0
        and 8 <= h <= 128
        and 8 <= w <= 128
    )


def _fwd_call(scores2d, x0, y0, wx, wy, aw, d, p, interpret):
    nq, h, w = scores2d.shape
    dp = d * p
    qb = _pick_qb(nq)
    kernel = functools.partial(_scores_fwd_kernel, d=d, p=p, h=h, w=w, qb=qb)
    grid = (nq // qb,)

    def bspec(shape):
        return pl.BlockSpec(
            (qb, *shape), lambda i: (i,) + (0,) * len(shape),
            memory_space=pltpu.VMEM,
        )

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[bspec((h, w))] + [bspec((dp,))] * 5,
        out_specs=bspec((d,)),
        out_shape=jax.ShapeDtypeStruct((nq, d), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )(scores2d, x0, y0, wx, wy, aw)


def _bwd_call(scores2d, x0, y0, wx, wy, aw, gbar, d, p, interpret):
    nq, h, w = scores2d.shape
    dp = d * p
    qb = _pick_qb(nq)
    kernel = functools.partial(_scores_bwd_kernel, d=d, p=p, h=h, w=w, qb=qb)
    grid = (nq // qb,)

    def bspec(shape):
        return pl.BlockSpec(
            (qb, *shape), lambda i: (i,) + (0,) * len(shape),
            memory_space=pltpu.VMEM,
        )

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[bspec((h, w))] + [bspec((dp,))] * 5 + [bspec((d,))],
        out_specs=(
            bspec((h, w)), bspec((dp,)), bspec((dp,)), bspec((dp,))
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nq, h, w), jnp.float32),
            jax.ShapeDtypeStruct((nq, dp), jnp.float32),
            jax.ShapeDtypeStruct((nq, dp), jnp.float32),
            jax.ShapeDtypeStruct((nq, dp), jnp.float32),
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )(scores2d, x0, y0, wx, wy, aw, gbar)


def _prep(scores, loc01, attn_weights, h, w):
    """Common host-side prep: corner splits in P-MAJOR DP layout."""
    q = scores.shape[0]
    d, p = loc01.shape[1:3]
    # (Q, D, P, ...) -> (Q, P, D, ...) -> (Q, P*D): p-major lanes.
    loc_pm = jnp.swapaxes(loc01, 1, 2).reshape(q, p * d, 2)
    aw_pm = jnp.swapaxes(attn_weights, 1, 2).reshape(q, p * d)
    px = loc_pm[..., 0] * w - 0.5
    py = loc_pm[..., 1] * h - 0.5
    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    return (
        scores.reshape(q, h, w),
        x0.astype(jnp.int32),
        y0.astype(jnp.int32),
        (px - x0).astype(jnp.float32),
        (py - y0).astype(jnp.float32),
        aw_pm.astype(jnp.float32),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def deform_sample_scores_pallas(spatial_shape, interpret, scores, loc01,
                                attn_weights):
    """Drop-in Pallas version of ops.deform.deform_sample_scores.

    scores: (Q, H*W); loc01: (Q, D, P, 2); attn_weights: (Q, D, P)
    -> (Q, D). Call sites should gate on `supported(...)`.
    """
    out, _ = _pallas_fwd(spatial_shape, interpret, scores, loc01, attn_weights)
    return out


def _pallas_fwd(spatial_shape, interpret, scores, loc01, attn_weights):
    h, w = spatial_shape
    d, p = loc01.shape[1:3]
    s2d, x0, y0, wx, wy, aw = _prep(scores, loc01, attn_weights, h, w)
    out = _fwd_call(s2d, x0, y0, wx, wy, aw, d, p, interpret)
    return out, (scores, loc01, attn_weights)


def _pallas_bwd(spatial_shape, interpret, res, gbar):
    scores, loc01, attn_weights = res
    h, w = spatial_shape
    q = scores.shape[0]
    d, p = loc01.shape[1:3]
    s2d, x0, y0, wx, wy, aw = _prep(scores, loc01, attn_weights, h, w)
    d_s2d, d_wx, d_wy, samp = _bwd_call(
        s2d, x0, y0, wx, wy, aw, gbar.astype(jnp.float32), d, p, interpret
    )
    # P-major (Q, P*D) -> (Q, D, P); chain px = loc_x * w - 0.5.
    def unpm(x):
        return jnp.swapaxes(x.reshape(q, p, d), 1, 2)

    d_loc = jnp.stack([unpm(d_wx) * w, unpm(d_wy) * h], axis=-1)
    d_attn = gbar[:, :, None] * unpm(samp)
    return d_s2d.reshape(q, h * w), d_loc, d_attn


deform_sample_scores_pallas.defvjp(_pallas_fwd, _pallas_bwd)


# ---------------------------------------------------------------------------
# Vector sampling (UV self-attention): out[q] = sum_p aw[q,p] * bilerp(V, loc)
# ---------------------------------------------------------------------------
#
# The XLA form (ops/deform.py deform_sample_vectors) materializes the (Q, HW)
# combined-weight matrix A in HBM and autodiff replays its 4P-term one-hot
# assembly as ~16 full-tensor HBM passes in the backward (~67 MB each at
# Q=HW=4096). Here A lives only as a (qb, HW) VMEM block: HBM traffic drops
# to the value map + the (Q, 4P) corner tables. Matmuls run at
# precision=HIGHEST to match the XLA path's load-bearing explicit precision
# (see the measured 4.5 dB note at ops/deform.py:87-93).


def _vectors_fwd_kernel(idx_ref, cw_ref, value_ref, out_ref, *, hw, qb, k):
    col = jax.lax.broadcasted_iota(jnp.int32, (qb, hw), 1)
    idx = idx_ref[...]
    cw = cw_ref[...]
    a = jnp.zeros((qb, hw), jnp.float32)
    for j in range(k):
        a = a + jnp.where(col == idx[:, j : j + 1], cw[:, j : j + 1], 0.0)
    out_ref[...] = jax.lax.dot_general(
        a, value_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )


def _vectors_bwd_kernel(
    idx_ref, cw_ref, value_ref, dout_ref, dvalue_ref, s_ref, *, hw, qb, k
):
    col = jax.lax.broadcasted_iota(jnp.int32, (qb, hw), 1)
    idx = idx_ref[...]
    cw = cw_ref[...]
    dout = dout_ref[...]  # (qb, C)
    # dA = dout @ V^T (NT form), exactly the VJP of the HIGHEST fwd matmul.
    g = jax.lax.dot_general(
        dout, value_ref[...], dimension_numbers=(((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )  # (qb, HW)
    a = jnp.zeros((qb, hw), jnp.float32)
    ss = []
    for j in range(k):
        m = col == idx[:, j : j + 1]
        # d_cw[:, j] = <dA, onehot_j> — a masked lane reduction of g.
        ss.append(jnp.sum(jnp.where(m, g, 0.0), axis=1, keepdims=True))
        a = a + jnp.where(m, cw[:, j : j + 1], 0.0)
    s_ref[...] = jnp.concatenate(ss, axis=1)
    # dV += A^T @ dout (TN form); the block is revisited every grid step
    # (constant index map), so accumulate across the sequential TPU grid.
    dv = jax.lax.dot_general(
        a, dout, dimension_numbers=(((0,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dvalue_ref[...] = dv

    @pl.when(pl.program_id(0) > 0)
    def _acc():
        dvalue_ref[...] += dv


def vectors_supported(q: int, p: int, h: int, w: int, c: int) -> bool:
    """Shapes the vector kernels handle: 8-aligned query blocks, lane-aligned
    channel/spatial extents, and a value map that fits VMEM comfortably."""
    hw = h * w
    return (
        _pick_qb(q) >= 8
        and c % 128 == 0
        and hw % 128 == 0
        and 4 * p <= 128
        and hw <= 8192
        and hw * c * 4 <= 8 * 1024 * 1024
    )


def _vectors_prep(loc01, attn_weights, h, w):
    """Corner tables in (Q, 4P) layout, k = corner * P + p."""
    from .deform import _bilinear_weights

    q, p = attn_weights.shape
    idx, wgt = _bilinear_weights(loc01, h, w)  # (4, Q, P)
    cw = wgt * attn_weights[None]
    idx_qk = jnp.swapaxes(idx, 0, 1).reshape(q, 4 * p).astype(jnp.int32)
    cw_qk = jnp.swapaxes(cw, 0, 1).reshape(q, 4 * p).astype(jnp.float32)
    return idx_qk, cw_qk


def _vectors_fwd_call(idx_qk, cw_qk, value, hw, c, interpret):
    nq, k = idx_qk.shape
    qb = _pick_qb(nq)
    kernel = functools.partial(_vectors_fwd_kernel, hw=hw, qb=qb, k=k)
    return pl.pallas_call(
        kernel,
        grid=(nq // qb,),
        in_specs=[
            pl.BlockSpec((qb, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((qb, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hw, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((qb, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nq, c), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )(idx_qk, cw_qk, value)


def _vectors_bwd_call(idx_qk, cw_qk, value, dout, hw, c, interpret):
    nq, k = idx_qk.shape
    qb = _pick_qb(nq)
    kernel = functools.partial(_vectors_bwd_kernel, hw=hw, qb=qb, k=k)
    return pl.pallas_call(
        kernel,
        grid=(nq // qb,),
        in_specs=[
            pl.BlockSpec((qb, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((qb, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hw, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((qb, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((hw, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((qb, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((hw, c), jnp.float32),
            jax.ShapeDtypeStruct((nq, k), jnp.float32),
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )(idx_qk, cw_qk, value, dout)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def deform_sample_vectors_pallas(spatial_shape, interpret, value, loc01,
                                 attn_weights):
    """Drop-in Pallas version of ops.deform.deform_sample_vectors.

    value: (H*W, C); loc01: (Q, P, 2); attn_weights: (Q, P) -> (Q, C).
    Call sites should gate on `vectors_supported(...)`.
    """
    out, _ = _vec_fwd(spatial_shape, interpret, value, loc01, attn_weights)
    return out


def _vec_fwd(spatial_shape, interpret, value, loc01, attn_weights):
    h, w = spatial_shape
    hw, c = value.shape
    idx_qk, cw_qk = _vectors_prep(loc01, attn_weights, h, w)
    out = _vectors_fwd_call(
        idx_qk, cw_qk, value.astype(jnp.float32), hw, c, interpret
    )
    return out.astype(value.dtype), (value, loc01, attn_weights)


def _vec_bwd(spatial_shape, interpret, res, gbar):
    value, loc01, attn_weights = res
    h, w = spatial_shape
    hw, c = value.shape

    def cw_fn(loc, aw):
        # Differentiable rebuild of the combined corner weights; floor() has
        # zero gradient, so d(frac)/d(px) = 1 — exactly the XLA autodiff
        # chain, including the OOB zeroing in _bilinear_weights.
        _, cw_qk = _vectors_prep(loc, aw, h, w)
        return cw_qk

    idx_qk, cw_qk = _vectors_prep(loc01, attn_weights, h, w)
    dvalue, s = _vectors_bwd_call(
        idx_qk, cw_qk, value.astype(jnp.float32), gbar.astype(jnp.float32),
        hw, c, interpret,
    )
    _, chain = jax.vjp(cw_fn, loc01, attn_weights)
    d_loc, d_attn = chain(s)
    return dvalue.astype(value.dtype), d_loc, d_attn


deform_sample_vectors_pallas.defvjp(_vec_fwd, _vec_bwd)
