"""Decoder-facing Gaussian container (pytree).

Mirrors /root/reference/src/model/types.py:7-12.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Gaussians(NamedTuple):
    means: jnp.ndarray  # (b, g, 3)
    covariances: jnp.ndarray  # (b, g, 3, 3)
    harmonics: jnp.ndarray  # (b, g, 3, d_sh)
    opacities: jnp.ndarray  # (b, g)
