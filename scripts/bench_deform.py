"""Micro-benchmark: deform_sample_scores fwd / fwd+bwd at flagship shapes.

Times the cost-volume sampling core (Q=4096, D=128, P=4, 64x64 maps) that
the UV matching layers call — the geometry-guided sampling the reference
fork measured at 22-25% of encoder time (SURVEY.md §6). Used to validate
MXU-shape changes to ops/deform.py against the real chip.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import jax.numpy as jnp

from transplat_tpu.ops.deform import deform_sample_scores, deform_sample_vectors

TUNNEL_MS = 25.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--pairs", type=int, default=4, help="batched pair count")
    args = ap.parse_args()

    n = args.pairs
    q, d, p, h, w = 4096, 128, 4, 64, 64
    k = jax.random.split(jax.random.PRNGKey(0), 4)
    scores = jax.random.normal(k[0], (n, q, h * w))
    loc = jax.random.uniform(k[1], (n, q, d, p, 2))
    aw = jax.nn.softmax(jax.random.normal(k[2], (n, q, d, p)), axis=-1)
    value = jax.random.normal(k[3], (n, h * w, 128))
    loc_v = jax.random.uniform(k[1], (n, q, p, 2))
    aw_v = jax.nn.softmax(jax.random.normal(k[2], (n, q, p)), axis=-1)

    def sync(x):
        return float(jax.tree.leaves(x)[0].ravel()[0])

    def timeit(fn, *xs):
        sync(fn(*xs))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            sync(fn(*xs))
        ms = (time.perf_counter() - t0) / args.iters * 1e3
        return ms, ms - TUNNEL_MS

    scores_fwd = jax.jit(
        jax.vmap(lambda s, l, a: deform_sample_scores(s, (h, w), l, a))
    )

    def loss(s, l, a):
        return jnp.sum(scores_fwd(s, l, a) ** 2)

    scores_bwd = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))

    vec_fwd = jax.jit(
        jax.vmap(lambda v, l, a: deform_sample_vectors(v, (h, w), l, a))
    )

    def vloss(v, l, a):
        return jnp.sum(vec_fwd(v, l, a) ** 2)

    vec_bwd = jax.jit(jax.grad(vloss, argnums=(0, 1, 2)))

    rows = [
        ("scores fwd", *timeit(scores_fwd, scores, loc, aw)),
        ("scores fwd+bwd", *timeit(scores_bwd, scores, loc, aw)),
        ("vectors fwd", *timeit(vec_fwd, value, loc_v, aw_v)),
        ("vectors fwd+bwd", *timeit(vec_bwd, value, loc_v, aw_v)),
    ]
    print(f"({n} pairs batched/dispatch)")
    print(f"{'op':20s} {'ms/call':>9s} {'real ms':>9s}")
    for name, ms, real in rows:
        print(f"{name:20s} {ms:9.2f} {real:9.2f}")


if __name__ == "__main__":
    main()
