"""Exact / high-precision matmul helpers for Mosaic TPU kernels.

The TPU MXU computes f32 matmuls by truncating inputs to bf16 (one pass at
default precision). Two consequences drive every matmul in the rasterizer
kernels:

  * matrices whose entries are exactly representable in bf16 (0/1 masks,
    one-hots, triangular matrices, integer counts <= 256) multiply EXACTLY
    at native single-pass speed — no precision qualifier needed;
  * general f32 values must be decomposed: any binary32 splits exactly into
    hi + mid + lo with each part bf16-representable (24 = 3 x 8 significand
    bits), so three bf16 passes accumulated in f32 reproduce the f32 product
    exactly against a bf16-exact operand.

These helpers implement the decompositions with the parts stacked along a
free axis so each split costs ONE wider matmul instead of three.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def split3_bf16(x: jnp.ndarray, axis: int = 0) -> jnp.ndarray:
    """Exact 3-way bf16 decomposition of f32, stacked along `axis`.

    x == hi + mid + lo exactly for any finite binary32; each part is exact
    in bf16, so a bf16 matmul against a 0/1 (or otherwise bf16-exact) matrix
    accumulated in f32 reproduces the f32 routing exactly.
    """
    hi = x.astype(jnp.bfloat16)
    r1 = x - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return jnp.concatenate([hi, mid, lo], axis=axis)


def split2_bf16(x: jnp.ndarray, axis: int = 0) -> jnp.ndarray:
    """Near-exact 2-way bf16 decomposition of f32 (relative error <= 2^-18).

    hi + mid reproduces x to ~2x f32 rounding of the bf16 ladder: hi carries
    the top 8 significand bits exactly, x - hi is exact in f32 (within a
    factor 2 of x - hi's own magnitude), and mid rounds the remainder to
    another 8 bits. Use where 2^-18 relative error is acceptable (gradients,
    colors, opacities) — two MXU passes instead of three.
    """
    hi = x.astype(jnp.bfloat16)
    mid = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return jnp.concatenate([hi, mid], axis=axis)


def dot_e3(a: jnp.ndarray, b_exact: jnp.ndarray, dimension_numbers):
    """Exact a @ b for general f32 `a` and bf16-exact `b` (2D operands).

    `a` is split 3-way along its free axis; `b_exact` must have bf16-exact
    entries (0/1, small integers). Contraction must be single-axis.
    """
    ((ac,), (bc,)), _ = dimension_numbers
    free = 1 - ac
    r = a.shape[free]
    a3 = split3_bf16(a, axis=free)
    y = jax.lax.dot_general(
        a3, b_exact.astype(jnp.bfloat16), dimension_numbers=dimension_numbers,
        preferred_element_type=jnp.float32,
    )
    # The a-free axis is always axis 0 of the output for 2D dot_general.
    return y[:r] + y[r : 2 * r] + y[2 * r :]


def dot_g(a: jnp.ndarray, b: jnp.ndarray, dimension_numbers):
    """Near-f32-exact a @ b for general f32 operands (2D).

    a is split 3-way (exact), b 2-way; the five terms with magnitude above
    ~2^-24 |a||b| are kept (a_lo x b_lo products are dropped), giving errors
    at the level of f32 rounding itself — versus 2^-8 for a raw single-pass
    MXU f32 matmul. Costs 5 bf16 passes (2 matmul calls).
    """
    ((ac,), (bc,)), _ = dimension_numbers
    free = 1 - ac
    r = a.shape[free]
    a3 = split3_bf16(a, axis=free)  # [a_hi; a_mid; a_lo]
    bh = b.astype(jnp.bfloat16)
    bl = (b - bh.astype(jnp.float32)).astype(jnp.bfloat16)
    y = jax.lax.dot_general(
        a3, bh, dimension_numbers=dimension_numbers,
        preferred_element_type=jnp.float32,
    )
    a2 = jax.lax.slice_in_dim(a3, 0, 2 * r, axis=0) if free == 0 else a3[:, : 2 * r]
    y2 = jax.lax.dot_general(
        a2, bl, dimension_numbers=dimension_numbers,
        preferred_element_type=jnp.float32,
    )
    return (y[:r] + y[r : 2 * r] + y[2 * r :]) + (y2[:r] + y2[r:])
