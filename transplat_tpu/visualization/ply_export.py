"""Export Gaussians to a 3DGS-standard .ply.

Mirrors /root/reference/src/model/ply_export.py:26-92 (recenter/rescale,
+Z-up rotation, inverse-sigmoid opacity, f_dc/f_rest attribute layout) with a
self-contained binary-little-endian PLY writer (no plyfile dependency).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def _z_up_rotation() -> np.ndarray:
    rotation = np.array([[0, 0, 1], [-1, 0, 0], [0, -1, 0]], np.float32)
    a = np.radians(-45.0)
    adjustment = np.array(
        [[np.cos(a), -np.sin(a), 0], [np.sin(a), np.cos(a), 0], [0, 0, 1]],
        np.float32,
    )
    return adjustment @ rotation


def export_ply(
    means: np.ndarray,  # (g, 3)
    scales: np.ndarray,  # (g, 3)
    rotations: np.ndarray,  # (g, 4) xyzw
    harmonics: np.ndarray,  # (g, 3, d_sh)
    opacities: np.ndarray,  # (g,)
    path: str | Path,
) -> None:
    means = np.asarray(means, np.float32)
    scales = np.asarray(scales, np.float32)
    rotations = np.asarray(rotations, np.float32)
    harmonics = np.asarray(harmonics, np.float32)
    opacities = np.asarray(opacities, np.float32)

    # Shift so the median Gaussian is at the origin; rescale to ~[-1, 1].
    means = means - np.median(means, axis=0)
    scale_factor = np.quantile(np.abs(means), 0.95, axis=0).max()
    means = means / scale_factor
    scales = scales / scale_factor

    rotation = _z_up_rotation()
    means = means @ rotation.T

    # Rotate quaternions (xyzw) by composing with the world rotation.
    from ..geometry.gaussians import quaternion_to_matrix

    r_g = np.asarray(quaternion_to_matrix(rotations))
    r_new = rotation[None] @ r_g
    rotations_wxyz = _matrix_to_quaternion_wxyz(r_new)

    f_dc = harmonics[..., 0]  # (g, 3)
    f_rest = harmonics[..., 1:].reshape(len(means), -1)

    num_rest = f_rest.shape[1]
    fields = (
        ["x", "y", "z", "nx", "ny", "nz"]
        + [f"f_dc_{i}" for i in range(3)]
        + [f"f_rest_{i}" for i in range(num_rest)]
        + ["opacity"]
        + [f"scale_{i}" for i in range(3)]
        + [f"rot_{i}" for i in range(4)]
    )

    eps = 1e-8
    inv_sigmoid_opacity = np.log(
        np.clip(opacities, eps, 1 - eps) / np.clip(1 - opacities, eps, 1 - eps)
    )
    data = np.concatenate(
        [
            means,
            np.zeros_like(means),
            f_dc,
            f_rest,
            inv_sigmoid_opacity[:, None],
            np.log(np.clip(scales, eps, None)),
            rotations_wxyz,
        ],
        axis=1,
    ).astype("<f4")

    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    header = (
        "ply\nformat binary_little_endian 1.0\n"
        f"element vertex {len(data)}\n"
        + "".join(f"property float {name}\n" for name in fields)
        + "end_header\n"
    )
    with open(path, "wb") as f:
        f.write(header.encode("ascii"))
        f.write(data.tobytes())


def _matrix_to_quaternion_wxyz(r: np.ndarray) -> np.ndarray:
    """(g, 3, 3) -> (g, 4) wxyz quaternions."""
    m = r
    t = np.trace(m, axis1=1, axis2=2)
    q = np.zeros((len(m), 4), np.float32)
    for i in range(len(m)):
        ri = m[i]
        tr = t[i]
        if tr > 0:
            s = np.sqrt(tr + 1.0) * 2
            q[i] = [0.25 * s, (ri[2, 1] - ri[1, 2]) / s, (ri[0, 2] - ri[2, 0]) / s, (ri[1, 0] - ri[0, 1]) / s]
        elif ri[0, 0] > ri[1, 1] and ri[0, 0] > ri[2, 2]:
            s = np.sqrt(1.0 + ri[0, 0] - ri[1, 1] - ri[2, 2]) * 2
            q[i] = [(ri[2, 1] - ri[1, 2]) / s, 0.25 * s, (ri[0, 1] + ri[1, 0]) / s, (ri[0, 2] + ri[2, 0]) / s]
        elif ri[1, 1] > ri[2, 2]:
            s = np.sqrt(1.0 + ri[1, 1] - ri[0, 0] - ri[2, 2]) * 2
            q[i] = [(ri[0, 2] - ri[2, 0]) / s, (ri[0, 1] + ri[1, 0]) / s, 0.25 * s, (ri[1, 2] + ri[2, 1]) / s]
        else:
            s = np.sqrt(1.0 + ri[2, 2] - ri[0, 0] - ri[1, 1]) * 2
            q[i] = [(ri[1, 0] - ri[0, 1]) / s, (ri[0, 2] + ri[2, 0]) / s, (ri[1, 2] + ri[2, 1]) / s, 0.25 * s]
    return q
