"""Deformable-attention sampling primitives (TPU-native).

Replaces mmcv's ms_deform_attn CUDA kernels
(/root/reference/src/model/utils/multi_scale_deformable_attn_function.py and
attention.py UV*Attention) with two XLA-friendly ops:

  * deform_sample_vectors — classic deformable attention: bilinearly gather
    C-dim value vectors at learned locations, weight and sum. Used by the
    UV self-attention (Q=4096, P=4, C=128).

  * deform_sample_scores — the cost-volume attentions (UVCoarse/UVCross) only
    ever *reduce* the sampled vector against the query's key over channels.
    Since both bilinear sampling and the key-dot are linear maps, we hoist the
    dot: compute the full score matrix S = K V^T on the MXU once, then gather
    scalars S[q, loc] instead of 128-dim vectors. This cuts gather traffic by
    C(=128)x — the reference fork measured this geometry-guided sampling at
    22-25% of encoder time and >65% of DRAM traffic (SURVEY.md §6); on TPU it
    becomes one 4096x128x4096 matmul plus a light scalar gather.

Sampling conventions match mmcv: locations in [0, 1], grid_sample
align_corners=False, zero padding.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _bilinear_weights(loc01: jnp.ndarray, h: int, w: int):
    """loc01 (..., 2) -> corner indices (4, ...) flat and weights (4, ...)."""
    px = loc01[..., 0] * w - 0.5
    py = loc01[..., 1] * h - 0.5
    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    wx = px - x0
    wy = py - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def corner(iy, ix, weight):
        inb = (iy >= 0) & (iy < h) & (ix >= 0) & (ix < w)
        idx = jnp.clip(iy, 0, h - 1) * w + jnp.clip(ix, 0, w - 1)
        return idx, jnp.where(inb, weight, 0.0)

    i00, w00 = corner(y0i, x0i, (1 - wx) * (1 - wy))
    i01, w01 = corner(y0i, x0i + 1, wx * (1 - wy))
    i10, w10 = corner(y0i + 1, x0i, (1 - wx) * wy)
    i11, w11 = corner(y0i + 1, x0i + 1, wx * wy)
    idx = jnp.stack([i00, i01, i10, i11])
    wgt = jnp.stack([w00, w01, w10, w11])
    return idx, wgt


def deform_sample_vectors(
    value: jnp.ndarray,
    spatial_shape: tuple[int, int],
    loc01: jnp.ndarray,
    attn_weights: jnp.ndarray,
    impl: str = "auto",
) -> jnp.ndarray:
    """Weighted bilinear sampling of value vectors, as ONE MXU matmul.

    value:        (H*W, C)
    loc01:        (Q, P, 2) sample locations in [0, 1]
    attn_weights: (Q, P) softmaxed weights
    Returns (Q, C).

    The sample is out = A @ value with A (Q, HW) holding the 4P combined
    bilinear-corner x attention weights per query. A is assembled by 4P
    unrolled one-hot compares (VPU elementwise, fused by XLA) instead of a
    gather: a (Q=4096, P=4) row gather runs at TPU scalar-gather rates in
    the forward and its VJP is a scatter-add — both orders of magnitude
    slower than the (Q, HW) x (HW, C) matmul, whose VJP is two matmuls.

    impl: "auto" (this XLA form — measured FASTER in the real train step),
    "pallas" (the VMEM-resident kernel in ops/deform_pallas.py; interpret
    mode off-TPU), or "xla". Unlike the scores op, auto does NOT pick the
    Pallas kernel on TPU: chained on-chip A/B at the flagship step measured
    xla 133.6 vs pallas 134.5 ms/step (and 2.42 vs 2.28 ms standalone) —
    XLA already fuses the 16-term one-hot assembly into single passes here,
    and the standalone win doesn't survive composition. The kernel is kept
    (tested, vmap-safe) for shapes where A (Q, HW) blows past fusion-friendly
    sizes. TRANSPLAT_DEFORM_VECTORS_IMPL overrides "auto" (A/B experiments).
    """
    if impl == "auto":
        import os

        impl = os.environ.get("TRANSPLAT_DEFORM_VECTORS_IMPL", "auto")
    if impl == "pallas":
        from .deform_pallas import deform_sample_vectors_pallas, vectors_supported

        vh, vw = spatial_shape
        vq, vp = attn_weights.shape
        if vectors_supported(vq, vp, vh, vw, value.shape[-1]):
            return deform_sample_vectors_pallas(
                (vh, vw), jax.default_backend() != "tpu", value, loc01,
                attn_weights,
            )
        raise ValueError(
            f"pallas deform vectors kernel does not support shapes "
            f"q={vq} p={vp} h={vh} w={vw} c={value.shape[-1]}"
        )
    h, w = spatial_shape
    hw = h * w
    q, p = attn_weights.shape
    idx, wgt = _bilinear_weights(loc01, h, w)  # (4, Q, P), (4, Q, P)
    cw = (wgt * attn_weights[None]).transpose(0, 2, 1).reshape(4 * p, q)
    idx_k = idx.transpose(0, 2, 1).reshape(4 * p, q)
    cols = jnp.arange(hw, dtype=jnp.int32)[None, :]
    a = jnp.zeros((q, hw), value.dtype)
    for k in range(4 * p):  # static unroll: differentiable, XLA-fused
        a = a + jnp.where(idx_k[k][:, None] == cols, cw[k][:, None], 0.0)
    # precision="highest" is LOAD-BEARING for optimization quality: dropping
    # to the default single-pass bf16 matmul slowed the golden-scene overfit
    # from 21.5 dB to 17.0 dB at step 500 (same seed, only this line
    # changed) — the bilinear interpolation weights in A are differences of
    # nearby locations, and 2^-8 rounding noise on them feeds straight into
    # the sampling-offset gradients.
    return jnp.matmul(a, value, precision="highest")


def deform_sample_scores_gather(
    scores: jnp.ndarray,
    spatial_shape: tuple[int, int],
    loc01: jnp.ndarray,
    attn_weights: jnp.ndarray,
) -> jnp.ndarray:
    """Gather-based reference implementation (slow on TPU: ~40M scalar
    gathers/s). Kept as the correctness oracle for the MXU version below."""
    q, hw = scores.shape
    h, w = spatial_shape
    idx, wgt = _bilinear_weights(loc01, h, w)  # (4, Q, D, P)
    q_idx = jnp.arange(q, dtype=jnp.int32)[None, :, None, None]
    flat_idx = q_idx * hw + idx  # (4, Q, D, P)
    sampled = scores.reshape(-1)[flat_idx]  # (4, Q, D, P)
    return jnp.sum(sampled * wgt * attn_weights[None], axis=(0, 3))


def _corner_coords(loc01, h, w):
    """loc01 (Q, DP, 2) -> integer corner indices + fractional weights."""
    px = loc01[..., 0] * w - 0.5
    py = loc01[..., 1] * h - 0.5
    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    wx = (px - x0)[..., None]  # (Q, DP, 1)
    wy = (py - y0)[..., None]
    return x0.astype(jnp.int32)[..., None], y0.astype(jnp.int32)[..., None], wx, wy


def _chunked(fn, args, q, q_chunk):
    """lax.map fn over q-chunks of every arg (all chunked on axis 0)."""
    if q % q_chunk == 0 and q > q_chunk:
        nc = q // q_chunk
        return jax.lax.map(
            fn, tuple(x.reshape(nc, q_chunk, *x.shape[1:]) for x in args)
        )
    return fn(args)


def deform_sample_scores(
    scores: jnp.ndarray,
    spatial_shape: tuple[int, int],
    loc01: jnp.ndarray,
    attn_weights: jnp.ndarray,
    q_chunk: int = 256,
    impl: str = "auto",
) -> jnp.ndarray:
    """Per-query bilinear sampling of score maps, gather-free.

    scores:       (Q, H*W) — typically K @ V^T
    loc01:        (Q, D, P, 2)
    attn_weights: (Q, D, P)
    Returns (Q, D): sum_p w_p * bilinear(scores[q], loc[q, d, p]).

    TPU reformulation: bilinear interpolation is separable, so sampling S
    moves onto the MXU as a batched row-mix matmul — per query,
    R = Y @ S2D with Y the (2-nonzero) y-weight matrix — followed by an
    elementwise column-select reduction with the x-weight matrix. Zero
    gathers; ~34 GFLOP at the flagship shapes (Q=4096, D=128, P=4) versus
    ~17M scalar gathers for the direct form (a ~40x wall-clock win on v5e).
    Zero-padding semantics match torch grid_sample (align_corners=False):
    out-of-range corner indices simply match no one-hot column.

    The backward is a hand-written custom VJP in the same separable style
    (two more batched matmuls + indicator reductions): XLA autodiff of this
    formulation emits a ~35x-slower backward on TPU.

    impl: "auto" (Pallas kernel on TPU when the shapes support it — the
    XLA chunked form materializes ~GBs of indicator tensors in HBM per call,
    see ops/deform_pallas.py), "pallas" (forced; interpret mode off-TPU),
    or "xla" (the chunked lax.map form). TRANSPLAT_DEFORM_IMPL overrides
    "auto" from the environment (A/B experiments).
    """
    if impl == "auto":
        import os

        impl = os.environ.get("TRANSPLAT_DEFORM_IMPL", "auto")
    if impl != "xla":
        from .deform_pallas import deform_sample_scores_pallas, supported

        h, w = spatial_shape
        d, p = loc01.shape[1:3]
        on_tpu = jax.default_backend() == "tpu"
        if supported(scores.shape[0], d, p, h, w) and (
            impl == "pallas" or on_tpu
        ):
            return deform_sample_scores_pallas(
                (h, w), not on_tpu, scores, loc01, attn_weights
            )
        if impl == "pallas":
            raise ValueError(
                f"pallas deform kernel does not support shapes q={scores.shape[0]} "
                f"d={d} p={p} h={h} w={w}"
            )
    return _scores_core(spatial_shape, q_chunk, scores, loc01, attn_weights)


def _indicator_t(iota, idx, weight):
    """(QC, N, DP) indicator-weight matrix: weight at row idx, transposed
    layout (rows = spatial, lanes = DP) so the batched matmuls below keep
    M = spatial (64) and N = DP (512) — full-lane MXU shapes. The naive
    (DP, spatial) layout puts M = DP = 512 with N = 64 (half the lanes
    idle): 2x the MXU cycles at these geometries."""
    i = iota[None, :, None]
    idx_t = idx[..., 0][:, None, :]
    w_t = weight[..., 0][:, None, :]
    return jnp.where(i == idx_t, 1.0 - w_t, 0.0) + jnp.where(
        i == idx_t + 1, w_t, 0.0
    )


def _scores_fwd_chunk(d, p, h, w, args):
    s_c, x0c, y0c, wxc, wyc, aw_c = args
    iota_h = jnp.arange(h, dtype=jnp.int32)
    iota_w = jnp.arange(w, dtype=jnp.int32)
    ywt = _indicator_t(iota_h, y0c, wyc)  # (QC, H, DP)
    xwt = _indicator_t(iota_w, x0c, wxc)  # (QC, W, DP)
    # Column mix first: M = H (64 rows), N = DP (512 lanes) — see
    # _indicator_t. The row mix is then an elementwise sum against ywt.
    rx = jnp.einsum(
        "qhw,qwd->qhd", s_c.reshape(-1, h, w), xwt,
        preferred_element_type=jnp.float32,
    )  # (QC, H, DP)
    sampled = jnp.sum(ywt * rx, axis=1)  # (QC, DP)
    return jnp.sum(sampled.reshape(-1, d, p) * aw_c, axis=-1)  # (QC, D)


def _indicator_diff_t(iota, idx):
    """d(indicator)/d(weight) in the transposed (QC, N, DP) layout:
    +1 at idx+1, -1 at idx (OOB corners contribute nothing)."""
    i = iota[None, :, None]
    idx_t = idx[..., 0][:, None, :]
    return jnp.where(i == idx_t + 1, 1.0, 0.0) - jnp.where(i == idx_t, 1.0, 0.0)


def _scores_bwd_chunk(d, p, h, w, args):
    """Adjoint of _scores_fwd_chunk, in the same separable-matmul style.

    Recompute-style: the indicator matrices and the forward's column-mix
    product RX are rebuilt from the saved inputs instead of stored as
    residuals. All three matmuls keep M = spatial (64) with N = DP (512)
    or K = DP — see _indicator_t — and RX is shared between the sampled
    recompute and d_wy (which needs no matmul at all): 3 batched matmuls
    of ~256 MXU cycles each vs 1280 for the row-major formulation.
    """
    s_c, x0c, y0c, wxc, wyc, aw_c, gbar = args
    qc = s_c.shape[0]
    iota_h = jnp.arange(h, dtype=jnp.int32)
    iota_w = jnp.arange(w, dtype=jnp.int32)
    s2d = s_c.reshape(qc, h, w)
    ywt = _indicator_t(iota_h, y0c, wyc)  # (QC, H, DP)
    xwt = _indicator_t(iota_w, x0c, wxc)  # (QC, W, DP)
    rx = jnp.einsum(
        "qhw,qwd->qhd", s2d, xwt, preferred_element_type=jnp.float32
    )  # (QC, H, DP) — the forward's column mix
    sampled = jnp.sum(ywt * rx, axis=1)  # (QC, DP)

    d_attn = gbar[..., None] * sampled.reshape(qc, d, p)  # (QC, D, P)
    sbar = (gbar[..., None] * aw_c).reshape(qc, 1, d * p)  # (QC, 1, DP)
    # d_scores[q, h, w] = sum_dp ywt sbar xwt: contract the DP axis.
    d_scores = jnp.einsum(
        "qhd,qwd->qhw", ywt * sbar, xwt, preferred_element_type=jnp.float32
    ).reshape(qc, h * w)
    # d_wy rides the already-computed RX; d_wx needs one more column mix
    # against the x-indicator derivative.
    d_wy = jnp.sum(_indicator_diff_t(iota_h, y0c) * rx, axis=1) * sbar[:, 0]
    sdx = jnp.einsum(
        "qhw,qwd->qhd", s2d, _indicator_diff_t(iota_w, x0c),
        preferred_element_type=jnp.float32,
    )
    d_wx = jnp.sum(ywt * sdx, axis=1) * sbar[:, 0]
    # px = loc_x * w - 0.5 (floor has zero gradient a.e.).
    d_loc = jnp.stack([d_wx * w, d_wy * h], axis=-1)  # (QC, DP, 2)
    return d_scores, d_loc, d_attn


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _scores_core(spatial_shape, q_chunk, scores, loc01, attn_weights):
    out, _ = _scores_core_fwd(spatial_shape, q_chunk, scores, loc01, attn_weights)
    return out


def _scores_core_fwd(spatial_shape, q_chunk, scores, loc01, attn_weights):
    q, hw = scores.shape
    h, w = spatial_shape
    d, p = loc01.shape[1:3]
    x0i, y0i, wx, wy = _corner_coords(loc01.reshape(q, d * p, 2), h, w)
    out = _chunked(
        functools.partial(_scores_fwd_chunk, d, p, h, w),
        (scores, x0i, y0i, wx, wy, attn_weights),
        q,
        q_chunk,
    )
    return out.reshape(q, d), (scores, loc01, attn_weights)


def _scores_core_bwd(spatial_shape, q_chunk, res, gbar):
    scores, loc01, attn_weights = res
    q, hw = scores.shape
    h, w = spatial_shape
    d, p = loc01.shape[1:3]
    x0i, y0i, wx, wy = _corner_coords(loc01.reshape(q, d * p, 2), h, w)
    d_scores, d_loc, d_attn = _chunked(
        functools.partial(_scores_bwd_chunk, d, p, h, w),
        (scores, x0i, y0i, wx, wy, attn_weights, gbar.reshape(q, d)),
        q,
        q_chunk,
    )
    return (
        d_scores.reshape(q, hw),
        d_loc.reshape(q, d, p, 2),
        d_attn.reshape(q, d, p),
    )


_scores_core.defvjp(_scores_core_fwd, _scores_core_bwd)
