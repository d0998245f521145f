"""Swin-style window partitioning and single-head window attention.

TPU-native reformulation of the reference's split-window attention
(/root/reference/src/model/encoder/backbone/multiview_transformer.py:57-206):
window partitioning is pure reshape/transpose, attention is batched MXU
matmuls over (num_windows, window_len, C) blocks, and the shifted-window mask
is a static numpy constant.
"""

from __future__ import annotations

import jax
import numpy as np
import jax.numpy as jnp


def window_partition(x: jnp.ndarray, splits: int) -> jnp.ndarray:
    """(N, H, W, C) -> (N * splits^2, H/splits, W/splits, C)."""
    n, h, w, c = x.shape
    s = splits
    x = x.reshape(n, s, h // s, s, w // s, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n * s * s, h // s, w // s, c)


def window_merge(x: jnp.ndarray, splits: int) -> jnp.ndarray:
    """Inverse of window_partition."""
    ns, hs, ws, c = x.shape
    s = splits
    n = ns // (s * s)
    x = x.reshape(n, s, s, hs, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, s * hs, s * ws, c)


def shifted_window_mask(
    h: int, w: int, window_h: int, window_w: int, shift_h: int, shift_w: int
) -> np.ndarray:
    """Additive attention mask (num_windows, wl, wl) for shifted windows.

    Static numpy computation (the reference builds the same mask on device,
    multiview_transformer.py:17-54).
    """
    img_mask = np.zeros((h, w), np.int32)
    cnt = 0
    for hs in (slice(0, -window_h), slice(-window_h, -shift_h), slice(-shift_h, None)):
        for ws in (slice(0, -window_w), slice(-window_w, -shift_w), slice(-shift_w, None)):
            img_mask[hs, ws] = cnt
            cnt += 1
    s = w // window_w
    blocks = img_mask.reshape(s, window_h, s, window_w).transpose(0, 2, 1, 3)
    blocks = blocks.reshape(s * s, window_h * window_w)
    diff = blocks[:, None, :] - blocks[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


def window_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    h: int,
    w: int,
    splits: int,
    with_shift: bool = False,
) -> jnp.ndarray:
    """Single-head window attention over flattened tokens.

    q: (N, L, C); k, v: (N, L, C) or (N, M, L, C) for multi-view cross
    attention (keys/values of the M other views are concatenated per window).
    Returns (N, L, C).
    """
    n, l, c = q.shape
    assert l == h * w
    multi = k.ndim == 4
    m = k.shape[1] if multi else 1

    win_h, win_w = h // splits, w // splits

    qi = q.reshape(n, h, w, c)
    if multi:
        ki = k.reshape(n * m, h, w, c)
        vi = v.reshape(n * m, h, w, c)
    else:
        ki = k.reshape(n, h, w, c)
        vi = v.reshape(n, h, w, c)

    if with_shift:
        sh, sw = win_h // 2, win_w // 2
        qi = jnp.roll(qi, (-sh, -sw), axis=(1, 2))
        ki = jnp.roll(ki, (-sh, -sw), axis=(1, 2))
        vi = jnp.roll(vi, (-sh, -sw), axis=(1, 2))
        mask = jnp.asarray(shifted_window_mask(h, w, win_h, win_w, sh, sw))
    else:
        mask = None

    wl = win_h * win_w
    qw = window_partition(qi, splits).reshape(n, splits * splits, wl, c)
    kw = window_partition(ki, splits).reshape(-1, splits * splits, wl, c)
    vw = window_partition(vi, splits).reshape(-1, splits * splits, wl, c)
    if multi:
        # (N*M, S, wl, C) -> (N, S, M*wl, C)
        kw = kw.reshape(n, m, splits * splits, wl, c).transpose(0, 2, 1, 3, 4)
        kw = kw.reshape(n, splits * splits, m * wl, c)
        vw = vw.reshape(n, m, splits * splits, wl, c).transpose(0, 2, 1, 3, 4)
        vw = vw.reshape(n, splits * splits, m * wl, c)

    scores = jnp.einsum("nsqc,nskc->nsqk", qw, kw) / (c**0.5)
    if mask is not None:
        if multi:
            # Reference quirk (multiview_transformer.py:109-131): for v>2 the
            # keys are interleaved pixel-major (key position p = l*m + i for
            # pixel l, other-view i) but the mask is tiled with plain
            # ``repeat(1, m)`` so key p receives mask[(l*m + i) % wl] — a
            # scrambled mask. Pretrained checkpoints were trained with this,
            # so parity requires reproducing it. Our key order is view-major
            # (p = i*wl + l); permute the tiled mask accordingly.
            wl_ = mask.shape[-1]
            i_idx, l_idx = np.divmod(np.arange(m * wl_), wl_)
            perm = (l_idx * m + i_idx) % wl_
            scores = scores + mask[:, :, perm][None]
        else:
            scores = scores + mask[None]
    attn = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("nsqk,nskc->nsqc", attn, vw)

    out = window_merge(out.reshape(n * splits * splits, win_h, win_w, c), splits)
    if with_shift:
        out = jnp.roll(out, (sh, sw), axis=(1, 2))
    return out.reshape(n, l, c)
