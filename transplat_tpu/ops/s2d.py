"""Space-to-depth 3x3 convolution: full-lane MXU shapes for thin channels.

A stride-1 3x3 conv on (N, H, W, C) with C << 128 wastes most of the MXU's
K and N lanes (C=32 -> 6% utilization). The SAME function computed in the
space-to-depth domain (N, H/2, W/2, 4C) is a 3x3 conv with a
sparsity-patterned (3, 3, 4C, 4C) kernel — K = N = 4C = 128 at C = 32, full
lanes. Measured on v5e (scripts/probe_s2d_conv.py): 0.63 -> 0.28 ms per
2x256^2x32 conv, max deviation 2e-6 (same products, reassociated sums).

Derivation: output fine pixel (2i+c, 2j+d) pulls fine taps (2i+c+dy,
2j+d+dx); writing c+dy = 2u + a with a in {0, 1} maps every fine tap onto
coarse cell (i+u, j+v) phase (a, b), so output phase q=(c, d) is a coarse
3x3 conv over the phase-stacked channels. Each (q, u, a) pair matches at
most one dy, so the coarse kernel is a zero-padded rearrangement of the
fine kernel — built below with static indexing (differentiable in w).

Phase layout: s2d channels are ordered phase-major, ch = p * C + c with
p = a * 2 + b (a = row phase, b = col phase).

The transposes are NOT free (~0.1 ms each at these shapes): the win exists
only when several convs run back-to-back in the s2d domain (e.g. a U-Net
ResBlock's conv->norm->act->conv chain; GroupNorm and SiLU are computed
exactly in-domain, see group_norm_s2d).

The reference has no analog (CUDA convs via cuDNN handle thin channels
natively); this is TPU-first layout engineering for the refine U-Net
(/root/reference/src/model/encoder/matching/depth_predictor_trans.py's
depth_unet_feat_dim=32 tower).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    """(N, H, W, C) -> (N, H/2, W/2, 4C), phase-major channels."""
    n, h, w, c = x.shape
    assert h % 2 == 0 and w % 2 == 0
    return (
        x.reshape(n, h // 2, 2, w // 2, 2, c)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(n, h // 2, w // 2, 4 * c)
    )


def depth_to_space(xs: jnp.ndarray) -> jnp.ndarray:
    """(N, H/2, W/2, 4C) -> (N, H, W, C); inverse of space_to_depth."""
    n, h2, w2, c4 = xs.shape
    c = c4 // 4
    return (
        xs.reshape(n, h2, w2, 2, 2, c)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(n, h2 * 2, w2 * 2, c)
    )


def _in_channel_offsets(splits):
    """Base offset of (segment, phase) blocks for a CONCATENATED s2d input.

    splits: fine channel widths of the concatenated segments. A single s2d
    tensor is phase-major (ch = p * C + c); concatenating s2d tensors lays
    the segments out back-to-back, each phase-major internally — the
    kernel builders index input blocks through this map so concats never
    need a relayout."""
    offsets = []
    base = 0
    for c in splits:
        offsets.append([base + p * c for p in range(4)])
        base += 4 * c
    return offsets


def coarse_kernel(w: jnp.ndarray, splits=None) -> jnp.ndarray:
    """Fine (3, 3, CI, CO) kernel -> coarse (3, 3, 4CI, 4CO) s2d kernel.

    Static-index assembly (traceable and differentiable in w). splits:
    fine widths of a concatenated-s2d input layout (default: one segment
    of CI)."""
    ci, co = w.shape[2], w.shape[3]
    splits = tuple(splits) if splits is not None else (ci,)
    assert sum(splits) == ci
    offs = _in_channel_offsets(splits)
    weq = jnp.zeros((3, 3, 4 * ci, 4 * co), w.dtype)
    for c in range(2):  # output phase row
        for d in range(2):  # output phase col
            q = c * 2 + d
            for dy in range(-1, 2):
                u, a = (c + dy) // 2, (c + dy) % 2
                for dx in range(-1, 2):
                    v, b = (d + dx) // 2, (d + dx) % 2
                    p = a * 2 + b
                    base = 0
                    for seg, cw in enumerate(splits):
                        weq = weq.at[
                            u + 1, v + 1,
                            offs[seg][p] : offs[seg][p] + cw,
                            q * co : (q + 1) * co,
                        ].add(w[dy + 1, dx + 1, base : base + cw])
                        base += cw
    return weq


def coarse_kernel_1x1(w: jnp.ndarray, splits=None) -> jnp.ndarray:
    """Fine (CI, CO) 1x1-conv kernel -> coarse (1, 1, 4CI, 4CO): per-phase
    block-diagonal (a 1x1 conv never mixes phases)."""
    ci, co = w.shape
    splits = tuple(splits) if splits is not None else (ci,)
    assert sum(splits) == ci
    offs = _in_channel_offsets(splits)
    weq = jnp.zeros((1, 1, 4 * ci, 4 * co), w.dtype)
    for p in range(4):
        base = 0
        for seg, cw in enumerate(splits):
            weq = weq.at[
                0, 0, offs[seg][p] : offs[seg][p] + cw,
                p * co : p * co + co,
            ].add(w[base : base + cw])
            base += cw
    return weq


def conv3x3_s2d(xs, w, bias=None, splits=None) -> jnp.ndarray:
    """3x3 stride-1 same-pad conv in the s2d domain.

    xs: (N, H/2, W/2, 4CI) s2d input (optionally a concatenation of s2d
    segments with fine widths `splits`); w: the FINE (3, 3, CI, CO) kernel.
    Returns the s2d of conv3x3(d2s(xs), w) — without leaving the domain."""
    weq = coarse_kernel(w, splits)
    y = lax.conv_general_dilated(
        xs, weq, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if bias is not None:
        # Fine-channel bias (CO,) broadcast to every phase block.
        y = y + jnp.tile(bias, 4)[None, None, None, :]
    return y


def group_norm_s2d(
    xs: jnp.ndarray, channels: int, num_groups: int, scale, bias,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """GroupNorm over FINE channels, computed in the s2d domain — exactly
    the same statistics (each fine (group, pixel) set maps onto the phase
    axis), matching nn.GroupNorm(num_groups) on the fine tensor.

    xs: (N, h, w, 4C); scale/bias: (C,) fine-channel affine params."""
    n, h, w, c4 = xs.shape
    assert c4 == 4 * channels
    gs = channels // num_groups
    count = h * w * 4 * gs
    # Keep the lane axis flat: reduce spatial first ((N, 4C) partials),
    # fold phases/groups on the tiny result, then broadcast back with a
    # repeat/tile of the per-group stats — no 6-D reshaped reductions
    # (those forced lane-splitting relayouts and measured SLOWER than the
    # convs they accompany).
    s1 = xs.sum(axis=(1, 2))  # (N, 4C)
    s2 = (xs * xs).sum(axis=(1, 2))
    # phase-major channels: ch = p * C + c -> fold phases, then groups.
    s1g = s1.reshape(n, 4, num_groups, gs).sum(axis=(1, 3))  # (N, G)
    s2g = s2.reshape(n, 4, num_groups, gs).sum(axis=(1, 3))
    mean = s1g / count
    # Fast variance (E[x^2] - E[x]^2), matching flax nn.GroupNorm's default.
    var = s2g / count - mean**2
    inv = lax.rsqrt(var + eps)
    # Per-lane affine: fold the group stats and fine-channel params into a
    # single (N, 4C) scale/shift pair applied elementwise.
    scale4 = jnp.tile(scale, 4)  # (4C,)
    bias4 = jnp.tile(bias, 4)
    inv_c = jnp.tile(jnp.repeat(inv, gs, axis=1), (1, 4))  # (N, 4C)
    mean_c = jnp.tile(jnp.repeat(mean, gs, axis=1), (1, 4))
    mul = inv_c * scale4[None, :]
    add = bias4[None, :] - mean_c * mul
    return xs * mul[:, None, None, :] + add[:, None, None, :]


def conv1x1_s2d(xs, w, bias=None, splits=None) -> jnp.ndarray:
    """1x1 conv in the s2d domain (phase-block-diagonal matmul)."""
    weq = coarse_kernel_1x1(w, splits)
    y = lax.conv_general_dilated(
        xs, weq, (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if bias is not None:
        y = y + jnp.tile(bias, 4)[None, None, None, :]
    return y


def upsample2_s2d(h_fine: jnp.ndarray) -> jnp.ndarray:
    """Nearest-2x upsample, landing directly in the s2d domain.

    s2d(repeat2(h)) has every phase equal to h, so the result is a channel
    tile — no spatial transpose at all."""
    return jnp.tile(h_fine, (1, 1, 1, 4))
