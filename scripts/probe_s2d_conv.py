"""Space-to-depth 3x3-conv equivalence probe.

A stride-1 3x3 conv on (N,H,W,C) equals, in the s2d domain (N,H/2,W/2,4C),
a 3x3 conv with a sparsity-patterned (3,3,4C,4C) kernel: output phase
q=(c,d) at coarse (i,j) pulls fine taps 2i+c+dy -> coarse i+u, phase a,
u = (c+dy)//2, a = (c+dy)%2. K and N become 4C (full MXU lanes at C=32).
"""
import time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
import jax.numpy as jnp

N, H, W, C = 2, 256, 256, 32

def s2d(x):
    n, h, w, c = x.shape
    return (
        x.reshape(n, h // 2, 2, w // 2, 2, c)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(n, h // 2, w // 2, 4 * c)
    )

def d2s(xs):
    n, h2, w2, c4 = xs.shape
    c = c4 // 4
    return (
        xs.reshape(n, h2, w2, 2, 2, c)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(n, h2 * 2, w2 * 2, c)
    )

def make_weq(w):
    # w: (3,3,C,C) fine kernel -> (3,3,4C,4C) coarse kernel.
    c = w.shape[2]
    weq = np.zeros((3, 3, 4 * c, 4 * c), w.dtype)
    for cc in range(2):          # output phase row
        for d in range(2):       # output phase col
            q = cc * 2 + d
            for dy in range(-1, 2):
                for dx in range(-1, 2):
                    u, a = (cc + dy) // 2, (cc + dy) % 2
                    v, b = (d + dx) // 2, (d + dx) % 2
                    p = a * 2 + b
                    weq[u + 1, v + 1, p * c:(p + 1) * c, q * c:(q + 1) * c] += \
                        w[dy + 1, dx + 1]
    return weq

def conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))

rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((N, H, W, C)), jnp.float32)
w = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.1, jnp.float32)
weq = jnp.asarray(make_weq(np.asarray(w)))

y1 = jax.jit(conv)(x, w)
y2 = jax.jit(lambda x, weq: d2s(conv(s2d(x), weq)))(x, weq)
print("equivalence max err:", float(jnp.abs(y1 - y2).max()))

def timeit(fn, *xs, iters=10):
    float(fn(*xs)); t0 = time.perf_counter()
    for _ in range(iters): float(fn(*xs))
    return (time.perf_counter() - t0) / iters * 1e3 - 25.0

def chain(f, n=8):
    @jax.jit
    def run(x, w):
        def body(i, x):
            return f(x, w) * 0.5 + x * 0.5
        out = jax.lax.fori_loop(0, n, body, x)
        return jnp.sum(out[0, 0, 0, :3])
    return run

def chain_s2d(n=8):
    # stays in the s2d domain across the chain (the intended U-Net usage)
    @jax.jit
    def run(x, weq):
        xs = s2d(x)
        def body(i, xs):
            return conv(xs, weq) * 0.5 + xs * 0.5
        out = jax.lax.fori_loop(0, n, body, xs)
        return jnp.sum(out[0, 0, 0, :3])
    return run

def chain_s2d_roundtrip(n=8):
    # s2d + d2s around EVERY conv (upper bound on transpose overhead)
    @jax.jit
    def run(x, weq):
        def body(i, x):
            return d2s(conv(s2d(x), weq)) * 0.5 + x * 0.5
        out = jax.lax.fori_loop(0, n, body, x)
        return jnp.sum(out[0, 0, 0, :3])
    return run

print("naive 32ch conv   ms/conv:", timeit(chain(conv), x, w) / 8)
print("s2d-domain conv   ms/conv:", timeit(chain_s2d(), x, weq) / 8)
print("s2d+d2s per conv  ms/conv:", timeit(chain_s2d_roundtrip(), x, weq) / 8)
