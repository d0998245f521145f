"""Training-step stage attribution on the real chip.

Times jitted sub-graphs of the flagship RE10K training step separately —
encoder fwd, encoder fwd+bwd, decoder (render) fwd+bwd, LPIPS fwd+bwd,
optimizer update — so train-step optimization effort can be aimed. The axon
tunnel costs ~25 ms per dispatch; the "real" column subtracts it.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import argparse
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import jax.numpy as jnp

from transplat_tpu.config import load_config
from transplat_tpu.dataset.loader import synthetic_batch
from transplat_tpu.loss.losses import LossCfg, compute_losses
from transplat_tpu.loss.vgg import LPIPS
from transplat_tpu.model.decoder import DecoderCfg, decode_splatting
from transplat_tpu.model.encoder import EncoderTranSplat
from transplat_tpu.training.schedule import make_lr_schedule
from transplat_tpu.training.step import create_train_state, make_optimizer

TUNNEL_MS = 25.0


def sync(tree):
    return float(jax.tree.leaves(tree)[0].ravel()[0])


def timeit(fn, *args, iters=10):
    sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        sync(fn(*args))
    ms = (time.perf_counter() - t0) / iters * 1e3
    return ms, ms - TUNNEL_MS


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    cfg = load_config("re10k")
    batch = synthetic_batch(0, batch_size=1, image_shape=(256, 256))
    ctx = {k: jnp.asarray(v) for k, v in batch["context"].items() if k != "index"}
    tgt = {k: jnp.asarray(v) for k, v in batch["target"].items() if k != "index"}

    optimizer = make_optimizer(make_lr_schedule(2e-4, 300001))
    state = create_train_state(
        jax.random.PRNGKey(0), cfg.encoder, optimizer, batch
    )
    model = EncoderTranSplat(cfg.encoder)
    lpips = LPIPS()
    # Random-init LPIPS params: fine for timing (same FLOPs as calibrated).
    lpips_params = jax.jit(lpips.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 256, 256, 3)),
        jnp.zeros((1, 256, 256, 3)),
    )["params"]
    dec_cfg = DecoderCfg()
    rng = jax.random.PRNGKey(2)

    def enc_fwd(params, batch_stats):
        variables = {"params": params, "batch_stats": batch_stats}
        gaussians = model.apply(
            variables, ctx["image"], ctx["intrinsics"], ctx["extrinsics"],
            ctx["near"], ctx["far"],
        )
        return gaussians

    def render_from(gaussians):
        out = decode_splatting(
            gaussians, tgt["extrinsics"], tgt["intrinsics"], tgt["near"],
            tgt["far"], (256, 256), cfg=dec_cfg,
        )
        return out.color

    def enc_loss(params, batch_stats):
        g = enc_fwd(params, batch_stats)
        # Cheap scalar head so the backward covers the encoder only.
        return (
            jnp.sum(g.means**2) * 1e-6
            + jnp.sum(g.opacities**2) * 1e-6
            + jnp.sum(g.harmonics**2) * 1e-6
            + jnp.sum(g.covariances**2) * 1e-6
        )

    gaussians = jax.jit(enc_fwd)(state.params, state.batch_stats)
    color = jax.jit(render_from)(gaussians)

    def render_loss(gaussians):
        c = render_from(gaussians)
        return jnp.sum((c - tgt["image"]) ** 2)

    def lpips_loss(pred):
        b, v = pred.shape[:2]
        p = pred.reshape(b * v, *pred.shape[2:])
        t = tgt["image"].reshape(b * v, *pred.shape[2:])
        return jnp.sum(lpips.apply({"params": lpips_params}, p, t))

    rows = [
        ("encoder fwd", *timeit(jax.jit(enc_fwd), state.params, state.batch_stats, iters=args.iters)),
        ("encoder fwd+bwd", *timeit(jax.jit(jax.grad(enc_loss)), state.params, state.batch_stats, iters=args.iters)),
        ("render fwd", *timeit(jax.jit(render_from), gaussians, iters=args.iters)),
        ("render fwd+bwd", *timeit(jax.jit(jax.grad(render_loss)), gaussians, iters=args.iters)),
        ("lpips fwd", *timeit(jax.jit(lpips_loss), color, iters=args.iters)),
        ("lpips fwd+bwd", *timeit(jax.jit(jax.grad(lpips_loss)), color, iters=args.iters)),
    ]
    print(f"{'stage':20s} {'ms/call':>9s} {'real ms':>9s}")
    for name, ms, real in rows:
        print(f"{name:20s} {ms:9.2f} {real:9.2f}")


if __name__ == "__main__":
    main()
