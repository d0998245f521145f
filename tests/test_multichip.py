"""Multi-chip decode: camera-sharded shard_map rasterizer under (dp, sp).

Front-to-back compositing needs per-camera depth order over ALL Gaussians, so
the decoder shards target views over sp and all-gathers the (sp-sharded)
Gaussian tensors once at the shard_map boundary (model/decoder.py docstring).
These tests pin: bit-parity with the unsharded path, gradients, the Pallas
kernel path under sp>1 (interpret mode), and the boundary collective.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transplat_tpu.model.decoder import DecoderCfg, decode_splatting
from transplat_tpu.model.types import Gaussians
from transplat_tpu.ops.rasterizer.api import RasterizeConfig
from transplat_tpu.parallel.mesh import make_mesh

B, TV, G = 4, 2, 2048


def scene(g=G, b=B):
    k = jax.random.PRNGKey(0)
    means = jax.random.normal(k, (b, g, 3)) * 2 + jnp.array([0, 0, 5.0])
    covs = jnp.broadcast_to(jnp.eye(3) * 0.01, (b, g, 3, 3))
    sh = jax.random.uniform(k, (b, g, 3, 25)) * 0.3
    opac = jax.random.uniform(k, (b, g)) * 0.8
    extr = jnp.broadcast_to(jnp.eye(4), (b, TV, 4, 4))
    intr = jnp.broadcast_to(
        jnp.array([[1.2, 0, 0.5], [0, 1.2, 0.5], [0, 0, 1.0]]), (b, TV, 3, 3)
    )
    near = jnp.full((b, TV), 1.0)
    far = jnp.full((b, TV), 100.0)
    return Gaussians(means, covs, sh, opac), extr, intr, near, far


TILED = DecoderCfg(
    rasterize=RasterizeConfig(mode="tiled", binning="fast", capacity=256, chunk=64)
)


def test_sharded_decode_matches_unsharded():
    mesh = make_mesh(dp=4, sp=2)
    gs, extr, intr, near, far = scene()

    def f(mesh_):
        return decode_splatting(
            gs, extr, intr, near, far, (64, 64), cfg=TILED, mesh=mesh_
        ).color

    ref = jax.jit(lambda: f(None))()
    out = jax.jit(lambda: f(mesh))()
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))


def test_sharded_decode_grads_match():
    mesh = make_mesh(dp=4, sp=2)
    gs, extr, intr, near, far = scene()

    def loss(means, mesh_):
        g2 = Gaussians(means, gs.covariances, gs.harmonics, gs.opacities)
        return jnp.sum(
            decode_splatting(
                g2, extr, intr, near, far, (64, 64), cfg=TILED, mesh=mesh_
            ).color
            ** 2
        )

    g_ref = jax.jit(jax.grad(lambda m: loss(m, None)))(gs.means)
    g_sh = jax.jit(jax.grad(lambda m: loss(m, mesh)))(gs.means)
    assert bool(jnp.all(jnp.isfinite(g_sh)))
    np.testing.assert_allclose(np.asarray(g_ref), np.asarray(g_sh), rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_sharded_pallas_interpret_grads():
    """The Pallas kernel path itself under sp>1 (interpret mode on CPU)."""
    mesh = make_mesh(dp=4, sp=2)
    gs, extr, intr, near, far = scene(g=4096)
    cfg = DecoderCfg(
        rasterize=RasterizeConfig(
            mode="pallas",
            interpret=True,
            capacity=256,
            chunk=128,
            bin_chunk=128,
            stream_window=1024,
        )
    )

    def loss(means):
        g2 = Gaussians(means, gs.covariances, gs.harmonics, gs.opacities)
        return jnp.sum(
            decode_splatting(
                g2, extr, intr, near, far, (64, 64), cfg=cfg, mesh=mesh
            ).color
            ** 2
        )

    gr = jax.jit(jax.grad(loss))(gs.means)
    assert bool(jnp.all(jnp.isfinite(gr)))
    assert float(jnp.linalg.norm(gr)) > 0.0


def test_gaussians_stay_sharded_until_boundary():
    """With the Gaussian axis sp-sharded on input, the compiled module
    all-gathers over sp exactly at the decode boundary — the upstream arrays
    keep their sharding (no hidden full replication before the shard_map)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh(dp=4, sp=2)
    gs, extr, intr, near, far = scene()
    shard_g = NamedSharding(mesh, P("dp", "sp"))

    def f(means, covs, sh, opac):
        means = jax.lax.with_sharding_constraint(means, shard_g)
        g2 = Gaussians(means, covs, sh, opac)
        return decode_splatting(
            g2, extr, intr, near, far, (64, 64), cfg=TILED, mesh=mesh
        ).color

    lowered = jax.jit(f).lower(gs.means, gs.covariances, gs.harmonics, gs.opacities)
    hlo = lowered.compile().as_text()
    assert "all-gather" in hlo


def test_two_process_shard_batch(tmp_path):
    """2-process jax.distributed CPU smoke test: drives shard_batch's
    process_count()>1 branch (make_array_from_process_local_data,
    parallel/mesh.py) and the per-process chunk striping that
    Trainer.make_dataset wires from jax.process_index() — the multi-host
    seams no single-process test can reach. Asserts (in the children) that
    the assembled global batch is bit-equal to the single-process batch and
    (here) that the chunk stripes are disjoint and cover all chunks.
    Reference behavior mirrored: per-rank DataLoader feeding
    (src/dataset/data_module.py:83-88) + rank-striped chunks
    (src/dataset/dataset_re10k.py:98-103)."""
    import socket
    import subprocess
    import sys

    from test_dataset import make_chunk

    root = tmp_path / "ds"
    (root / "train").mkdir(parents=True)
    for i in range(3):
        make_chunk(root / "train" / f"{i:06d}.torch", num_scenes=1, hw=(72, 96))

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    child = os.path.join(os.path.dirname(__file__), "_multiproc_child.py")
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "JAX_PLATFORM_NAME")
    }
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]
        + env.get("PYTHONPATH", "").split(os.pathsep)
    )
    procs = [
        subprocess.Popen(
            [sys.executable, child, str(i), "2", str(port), str(root)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            env=env,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, f"child failed rc={rc}\nstdout:\n{out}\nstderr:\n{err}"
        assert "OK" in out

    stripes = []
    for _, out, _ in outs:
        for line in out.splitlines():
            if line.startswith("STRIPE"):
                names = line.split(": ", 1)[1]
                stripes.append(set(names.split(",")) if names else set())
    assert len(stripes) == 2
    assert stripes[0] & stripes[1] == set(), "stripes must be disjoint"
    assert stripes[0] | stripes[1] == {f"{i:06d}.torch" for i in range(3)}
