"""Workload-analysis utilities (the fork's research layer, SURVEY.md §2.12).

TPU ports of the analyzers the fork hooks into test_step:
  * Gaussian contribution stats from rasterizer radii (+ opacity threshold) —
    mirrors decoder_splatting_cuda.forward_with_gaussian_stats /
    cuda_splatting.render_cuda_with_stats
  * Gaussian redundancy: fraction of adjacent (pixel-neighbor) Gaussians with
    near-identical parameters — mirrors scripts/analyze_gaussian_redundancy.py
  * depth-PDF sharpness/entropy — mirrors the depth-candidate analyses that
    consume encoder _last_pdf / _last_depth_candidates
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def gaussian_contribution_stats(
    radii: jnp.ndarray, opacities: jnp.ndarray, opacity_threshold: float = 0.01
) -> dict:
    """radii: (..., G) screen radii; opacities: (..., G)."""
    radii = np.asarray(radii)
    opacities = np.asarray(opacities)
    total = radii.size
    visible = radii > 0
    high = visible & (opacities >= opacity_threshold)
    return {
        "total_gaussians": int(total),
        "visible_gaussians": int(visible.sum()),
        "high_contribution_gaussians": int(high.sum()),
        "visible_ratio": float(visible.mean()),
        "high_contribution_ratio": float(high.mean()),
        "opacity_threshold": opacity_threshold,
    }


def adjacent_gaussian_similarity(
    depths: jnp.ndarray, opacities: jnp.ndarray, threshold: float = 0.05
) -> dict:
    """Fraction of horizontally/vertically adjacent per-pixel Gaussians whose
    relative depth difference is below `threshold`.

    depths: (b, v, h, w); opacities: (b, v, h, w) or flattened (b, v*h*w).
    """
    d = np.asarray(depths)
    dx = np.abs(d[..., :, 1:] - d[..., :, :-1]) / np.maximum(d[..., :, :-1], 1e-6)
    dy = np.abs(d[..., 1:, :] - d[..., :-1, :]) / np.maximum(d[..., :-1, :], 1e-6)
    sim_x = (dx < threshold).mean()
    sim_y = (dy < threshold).mean()
    return {
        "similar_ratio_x": float(sim_x),
        "similar_ratio_y": float(sim_y),
        "similar_ratio": float((sim_x + sim_y) / 2),
        "threshold": threshold,
    }


def depth_pdf_stats(pdf: jnp.ndarray) -> dict:
    """pdf: (b, v, h, w, D) softmax depth distributions."""
    p = np.asarray(pdf)
    eps = 1e-12
    entropy = -(p * np.log(p + eps)).sum(-1)
    max_p = p.max(-1)
    d = p.shape[-1]
    return {
        "mean_entropy": float(entropy.mean()),
        "max_entropy": float(np.log(d)),
        "normalized_entropy": float(entropy.mean() / np.log(d)),
        "mean_peak_probability": float(max_p.mean()),
        "sharp_fraction": float((max_p > 0.5).mean()),
    }


def feature_depth_correlation(
    features: jnp.ndarray, depths: jnp.ndarray, num_pairs: int = 4096, seed: int = 0
) -> dict:
    """Challenge-1 validation (scripts/analyze_feature_depth_correlation.py):
    do feature-similar pixel pairs have consistent depth?

    features: (b, v, hf, wf, c); depths: (b, v, h, w) (downsampled to hf, wf).
    """
    f = np.asarray(features)
    d = np.asarray(depths)
    b, v, hf, wf, c = f.shape
    stride_h = d.shape[2] // hf
    stride_w = d.shape[3] // wf
    d_small = d[:, :, ::stride_h, ::stride_w][:, :, :hf, :wf]

    f_flat = f.reshape(-1, c)
    d_flat = d_small.reshape(-1)
    rng = np.random.default_rng(seed)
    i = rng.integers(len(f_flat), size=num_pairs)
    j = rng.integers(len(f_flat), size=num_pairs)
    fi = f_flat[i] / (np.linalg.norm(f_flat[i], axis=-1, keepdims=True) + 1e-8)
    fj = f_flat[j] / (np.linalg.norm(f_flat[j], axis=-1, keepdims=True) + 1e-8)
    cos = (fi * fj).sum(-1)
    depth_consistent = (
        np.abs(d_flat[i] - d_flat[j]) / np.maximum(d_flat[i], 1e-6) < 0.1
    )
    similar = cos >= 0.7
    return {
        "similar_pair_fraction": float(similar.mean()),
        "depth_consistency_given_similar": float(
            depth_consistent[similar].mean() if similar.any() else 0.0
        ),
        "depth_consistency_overall": float(depth_consistent.mean()),
    }
