"""Benchmark: tile rasterizer forward+backward throughput (Mpix/s/chip).

Flagship workload (SURVEY.md §6): G = 131072 Gaussians (2 views x 256^2,
1/pixel), 256x256 render, batch of 4 target views — forward + full backward
(grads to means/covariances/SH/opacities), jitted on one chip.

Prints ONE JSON line. vs_baseline is measured against a 13 Mpix/s fwd+bwd
estimate for the reference's CUDA diff-gaussian-rasterization on RTX 3090 at
this workload (~3-6 ms per 256^2 render+backward at 131k Gaussians; the
reference repo publishes no rasterizer numbers — BASELINE.md — so re-measure
when reference hardware is available).

Timing methodology: `inner` fwd+bwd steps are chained on-device inside one
jitted lax.fori_loop (each iteration consumes the previous gradients, so
steps are serialized and cannot be elided), and the loop is dispatched
`outer` times. This measures device throughput the same way the CUDA
baseline is measured (CUDA events around kernels, locally-attached GPU) —
excluding this dev environment's ~25 ms/dispatch remote-tunnel RPC latency,
which production TPU runtimes (~100 us dispatch) do not have.
"""

import json
import os
import time

import jax

# Persistent compile cache: TPU sort kernels are slow to compile the first
# time; cached runs start in seconds.
_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import jax.numpy as jnp

from transplat_tpu.ops.rasterizer import render
from transplat_tpu.ops.rasterizer.api import RasterizeConfig

BASELINE_MPIX_S = 13.0


def main():
    key = jax.random.PRNGKey(0)
    # 8 views per dispatch amortizes the axon tunnel's ~25ms per-call latency
    # (production TPU runtimes dispatch in ~100us).
    b, g = 8, 131072
    h = w = 256

    k = jax.random.split(key, 6)
    means = jnp.concatenate(
        [
            jax.random.uniform(k[0], (b, g, 2), minval=-3.0, maxval=3.0),
            jax.random.uniform(k[1], (b, g, 1), minval=1.0, maxval=12.0),
        ],
        axis=-1,
    )
    scales = jax.random.uniform(k[2], (b, g, 3), minval=0.005, maxval=0.03)
    cov = jnp.einsum("bgi,ij->bgij", scales**2, jnp.eye(3))
    sh = jax.random.normal(k[3], (b, g, 3, 25)) * 0.3
    opac = jax.random.uniform(k[4], (b, g), minval=0.3, maxval=0.95)

    extr = jnp.broadcast_to(jnp.eye(4), (b, 4, 4))
    intr = jnp.broadcast_to(
        jnp.array([[1.0, 0.0, 0.5], [0.0, 1.0, 0.5], [0.0, 0.0, 1.0]]), (b, 3, 3)
    )
    near = jnp.ones((b,))
    far = jnp.full((b,), 100.0)
    bg = jnp.zeros((b, 3))

    # chunk=256: composite sweep granularity (measured faster than 128).
    # bin_chunk=128: routing matmul cycles scale with ceil(CG/128) per lane;
    # at the tree's fan-out of 4, CG=128 halves them vs CG=256.
    import os as _o
    tile = int(_o.environ.get("TRANSPLAT_BENCH_TILE", "16"))
    cfg = RasterizeConfig(
        tile_size=tile,
        capacity=int(
            _o.environ.get("TRANSPLAT_BENCH_CAPACITY", str(1024 * (tile // 16) ** 2))
        ),
        chunk=int(_o.environ.get("TRANSPLAT_BENCH_CHUNK", "256")),
        bin_chunk=128,
    )

    def loss_fn(means, cov, sh, opac):
        out = render(extr, intr, near, far, (h, w), bg, means, cov, sh, opac, cfg=cfg)
        return jnp.sum(out.color**2)

    grad_fn = jax.grad(loss_fn, argnums=(0, 1, 2, 3))

    inner = 16

    @jax.jit
    def chained(means, cov, sh, opac):
        # Serialize `inner` fwd+bwd steps on-device: each step's means are
        # perturbed by the previous gradients (scaled to keep the workload
        # distribution unchanged), so XLA cannot overlap or elide steps.
        def body(_, carry):
            means, cov, sh, opac = carry
            g_means, g_cov, g_sh, g_opac = grad_fn(means, cov, sh, opac)
            return (
                means + 1e-30 * g_means,
                cov + 1e-30 * g_cov,
                sh + 1e-30 * g_sh,
                opac + 1e-30 * g_opac,
            )

        out = jax.lax.fori_loop(0, inner, body, (means, cov, sh, opac))
        # Reduce to one scalar ON DEVICE: syncing via `arr.ravel()[0]` would
        # dispatch two extra ops through the ~25 ms/dispatch tunnel per call.
        return out[0][0, 0, 0] + out[3][0, 0]

    def sync(x):
        # block_until_ready is a no-op on the axon tunnel backend; a host
        # transfer is the only reliable sync.
        return float(x)

    # Warmup / compile.
    sync(chained(means, cov, sh, opac))

    outer = 3
    t0 = time.perf_counter()
    for _ in range(outer):
        out = chained(means, cov, sh, opac)
        sync(out)
    dt = time.perf_counter() - t0

    mpix_s = b * h * w * inner * outer / dt / 1e6
    record = {
        "metric": "rasterizer_fwd_bwd_throughput",
        "value": round(mpix_s, 2),
        "unit": "Mpix/s/chip",
        "vs_baseline": round(mpix_s / BASELINE_MPIX_S, 3),
    }
    record["bf16_tier_fwd_mpix_s"] = _bf16_tier_metric(
        extr, intr, near, far, (h, w), bg, means, cov, sh, opac
    )
    record.update(_train_step_metric())
    print(json.dumps(record))


def _bf16_tier_metric(extr, intr, near, far, shape, bg, means, cov, sh, opac):
    """Inference-tier rendering throughput: precision='bf16' forward-only
    (the eval/preview path — the reference's CUDA rasterizer has no reduced-
    precision tier, so this is TPU-only headroom). Same chained-steps
    methodology as the exact number."""
    import jax.numpy as jnp

    # Same env-resolved chunk as the exact tier so the two numbers are
    # measured at identical sweep granularity (TRANSPLAT_BENCH_CHUNK).
    cfg = RasterizeConfig(
        capacity=1024,
        chunk=int(os.environ.get("TRANSPLAT_BENCH_CHUNK", "256")),
        bin_chunk=128,
        precision="bf16",
    )
    b, (h, w) = means.shape[0], shape
    inner = 16

    # Scene tensors are jit ARGUMENTS: closing over them bakes ~400 MB of
    # constants into the HLO and the remote-compile tunnel 413s.
    @jax.jit
    def chained(means, cov, sh, opac):
        def body(_, means):
            out = render(
                extr, intr, near, far, (h, w), bg, means, cov, sh, opac,
                cfg=cfg,
            )
            # Feed a pixel back into the means so steps serialize.
            return means + 1e-30 * out.color[0, 0, 0, 0]

        out = jax.lax.fori_loop(0, inner, body, means)
        return out[0, 0, 0]

    float(chained(means, cov, sh, opac))  # compile + warm
    outer = 3
    t0 = time.perf_counter()
    for _ in range(outer):
        float(chained(means, cov, sh, opac))
    dt = time.perf_counter() - t0
    return round(b * h * w * inner * outer / dt / 1e6, 2)


def _train_step_metric(timeout_s: int = 1500) -> dict:
    """Full-train-step ms (encoder+decoder+losses+Adam, b=1, 4 target views)
    as extra fields on the benchmark line, so encoder/decoder regressions
    surface in BENCH_r*.json next to the rasterizer number. Runs in a bounded
    subprocess: a cold-cache compile or failure must not cost the headline
    metric. Skip with TRANSPLAT_BENCH_TRAIN=0.

    --inner 4 chains 4 full steps on-device inside one jit (state carry
    serializes them), so per-dispatch tunnel latency and its run-to-run
    jitter amortize away — the round-4 per-dispatch method overstated the
    step by ~20 ms of host overhead (ROUND5_NOTES)."""
    if os.environ.get("TRANSPLAT_BENCH_TRAIN", "1") == "0":
        return {}
    import subprocess
    import sys

    script = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "scripts", "bench_train_step.py"
    )
    try:
        out = subprocess.run(
            [sys.executable, script, "--inner", "4", "--iters", "4"],
            capture_output=True,
            text=True,
            timeout=timeout_s,
        )
        for line in reversed(out.stdout.strip().splitlines()):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                continue
    except Exception:
        pass
    return {"train_step_ms": None}


if __name__ == "__main__":
    main()
