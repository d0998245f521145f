"""Child process for the 2-process jax.distributed smoke test.

Run by tests/test_multichip.py::test_two_process_shard_batch via subprocess.
Exercises the ONLY code path a single-process suite can never reach: the
`jax.process_count() > 1` branch of parallel/mesh.py shard_batch
(make_array_from_process_local_data — each host feeds its own chips, the
reference's per-rank DataLoader feeding, data_module.py:83-88) plus the
per-process chunk striping in Trainer.make_dataset (shard_id=process_index).

Protocol: each process assembles the global batch from its LOCAL slice,
replicates it, and process 0 asserts bit-equality with the full host batch;
both processes then print their striped chunk basenames for the parent to
check the union/disjointness property.
"""

import os
import sys

proc_id = int(sys.argv[1])
num_procs = int(sys.argv[2])
port = sys.argv[3]
chunk_root = sys.argv[4] if len(sys.argv) > 4 else ""

# 2 virtual CPU devices per process -> 4 global devices over 2 processes.
os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=2"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=f"localhost:{port}",
    num_processes=num_procs,
    process_id=proc_id,
)

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from transplat_tpu.parallel.mesh import make_mesh, replicated, shard_batch

assert jax.process_count() == num_procs, jax.process_count()
assert jax.device_count() == 2 * num_procs
assert len(jax.local_devices()) == 2

# Deterministic full global batch (nested dict, like a real batch tree).
B = 2 * num_procs
full = {
    "context": {
        "image": np.arange(B * 3 * 4, dtype=np.float32).reshape(B, 3, 4) / 7.0,
        "near": np.arange(B, dtype=np.float32) + 1.0,
    },
    "target": {"image": np.arange(B * 5, dtype=np.float32).reshape(B, 5) * -0.5},
}
per = B // num_procs
local = jax.tree.map(lambda x: x[proc_id * per : (proc_id + 1) * per], full)

mesh = make_mesh(dp=2 * num_procs, sp=1)
gbatch = shard_batch(local, mesh)

# Every leaf must be a fully-addressable-by-nobody global array sharded dp.
for leaf in jax.tree.leaves(gbatch):
    assert leaf.shape[0] == B, leaf.shape
    assert not leaf.is_fully_addressable

# Replicate and compare to the single-process full batch on every process.
rep = jax.jit(lambda t: t, out_shardings=replicated(mesh))(gbatch)
for got, want in zip(jax.tree.leaves(rep), jax.tree.leaves(full)):
    np.testing.assert_array_equal(np.asarray(got), want)

# A global-reduction step (what the train step's loss does under GSPMD):
gmean = float(
    jax.jit(lambda t: sum(x.mean() for x in jax.tree.leaves(t)))(gbatch)
)
want_mean = float(sum(x.mean() for x in jax.tree.leaves(full)))
assert abs(gmean - want_mean) < 1e-5, (gmean, want_mean)

# Per-process chunk striping (Trainer.make_dataset wiring: shard_id comes
# from jax.process_index()).
if chunk_root:
    from transplat_tpu.config import load_config
    from transplat_tpu.dataset.re10k import ChunkDataset
    from transplat_tpu.dataset.view_samplers import ViewSamplerBounded

    cfg = load_config(
        "re10k", dataset={"roots": [chunk_root], "image_shape": [64, 64]}
    )
    sampler = ViewSamplerBounded(cfg.view_sampler, stage="train")
    ds = ChunkDataset(
        cfg.dataset,
        "train",
        sampler,
        seed=0,
        shard_id=jax.process_index(),
        num_shards=jax.process_count(),
    )
    names = sorted(os.path.basename(c) for c in ds.chunks)
    print(f"STRIPE {proc_id}: {','.join(names)}", flush=True)

print(f"OK {proc_id} mean={gmean:.6f}", flush=True)
