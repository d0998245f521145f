"""Chain probe: [conv -> GN -> SiLU] x8 fine vs s2d-domain (level-scope model)."""
import time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
import jax.numpy as jnp
import flax.linen as nn
import sys; sys.path.insert(0, "/root/repo")
from transplat_tpu.ops.s2d import (
    space_to_depth, depth_to_space, conv3x3_s2d, group_norm_s2d)

N, H, W, C = 2, 256, 256, 32
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((N, H, W, C)), jnp.float32)
w = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.05, jnp.float32)
scale = jnp.ones((C,)); bias = jnp.zeros((C,))

def fine_block(x, w):
    y = jax.lax.conv_general_dilated(x, w, (1,1), [(1,1),(1,1)],
        dimension_numbers=("NHWC","HWIO","NHWC"))
    gn = nn.GroupNorm(num_groups=8, epsilon=1e-5)
    y = gn.apply({"params": {"scale": scale, "bias": bias}}, y)
    return nn.silu(y)

def s2d_block(xs, w):
    y = conv3x3_s2d(xs, w)
    y = group_norm_s2d(y, C, 8, scale, bias)
    return nn.silu(y)

def timeit(fn, *xs, iters=10):
    float(fn(*xs)); t0 = time.perf_counter()
    for _ in range(iters): float(fn(*xs))
    return (time.perf_counter()-t0)/iters*1e3 - 25.0

def chain_fine(n=8):
    @jax.jit
    def run(x, w):
        def body(i, x):
            return fine_block(x, w) * 0.9 + x * 0.1
        out = jax.lax.fori_loop(0, n, body, x)
        return jnp.sum(out[0,0,0,:3])
    return run

def chain_s2d(n=8):
    @jax.jit
    def run(x, w):
        xs = space_to_depth(x)
        def body(i, xs):
            return s2d_block(xs, w) * 0.9 + xs * 0.1
        out = jax.lax.fori_loop(0, n, body, xs)
        return jnp.sum(out[0,0,0,:3])
    return run

def chain_fine_grad(n=4):
    def loss(x, w):
        def body(i, x):
            return fine_block(x, w) * 0.9 + x * 0.1
        return jnp.sum(jax.lax.fori_loop(0, n, body, x) ** 2) * 1e-6
    g = jax.grad(loss, argnums=(0,1))
    @jax.jit
    def run(x, w):
        gx, gw = g(x, w)
        return gx[0,0,0,0] + gw[0,0,0,0]
    return run

def chain_s2d_grad(n=4):
    def loss(x, w):
        xs = space_to_depth(x)
        def body(i, xs):
            return s2d_block(xs, w) * 0.9 + xs * 0.1
        return jnp.sum(jax.lax.fori_loop(0, n, body, xs) ** 2) * 1e-6
    g = jax.grad(loss, argnums=(0,1))
    @jax.jit
    def run(x, w):
        gx, gw = g(x, w)
        return gx[0,0,0,0] + gw[0,0,0,0]
    return run

print("fine  conv+GN+silu fwd ms/block:", timeit(chain_fine(), x, w) / 8)
print("s2d   conv+GN+silu fwd ms/block:", timeit(chain_s2d(), x, w) / 8)
print("fine  f+b ms/block:", timeit(chain_fine_grad(), x, w) / 4)
print("s2d   f+b ms/block:", timeit(chain_s2d_grad(), x, w) / 4)
