"""Device mesh construction and sharding rules.

Replaces the reference's Lightning DDP (SURVEY.md §2.11) with jax.sharding:
  * dp — data parallel over the batch axis; gradient all-reduce is inserted by
    GSPMD (params replicated, batch sharded) and overlapped with the backward
    pass by XLA's latency-hiding scheduler
  * sp — splat/sequence parallel: shards the Gaussian / target-view axes in
    the decoder and the pair axis in the cost-volume matcher
Collectives ride ICI within a slice; DCN only sees the dp axis on multi-host.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: int | None = None, sp: int = 1, devices=None) -> Mesh:
    """Build a (dp, sp) mesh. dp defaults to n_devices // sp."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp is None:
        dp = n // sp
    assert dp * sp == n, f"dp({dp}) * sp({sp}) != devices({n})"
    arr = np.asarray(devices).reshape(dp, sp)
    return Mesh(arr, ("dp", "sp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over dp."""
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Assemble a global device batch from host arrays, batch axis over dp.

    Single-process: a plain device_put. Multi-host: each process holds only
    its local batch slice (the data pipeline stripes chunks per process, the
    reference's per-rank generator seeding, data_module.py:83-88), so the
    global array is assembled with make_array_from_process_local_data —
    no cross-host data movement, each host feeds its own chips.
    """
    s = batch_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(s, np.asarray(x)),
            batch,
        )
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)
