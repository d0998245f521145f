"""Training step: forward (encoder -> decoder -> losses), grads, Adam update.

Mirrors /root/reference/src/model/model_wrapper.py:129-183 (training_step) as
a single jitted function over a (dp, sp) mesh: params replicated, batch
sharded over dp; GSPMD inserts the gradient all-reduce, overlapped with the
backward pass by the XLA latency-hiding scheduler (SURVEY.md §5.8).
"""

from __future__ import annotations

from functools import partial
from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ..loss.losses import LossCfg, compute_losses
from ..loss.vgg import LPIPS
from ..model.decoder import DecoderCfg, decode_splatting
from ..model.encoder import EncoderCfg, EncoderTranSplat


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    lpips_params: Any  # frozen (buffers in the reference, loss_lpips.py:27-54)
    opt_state: Any


def make_optimizer(lr_schedule, grad_clip: float = 0.5):
    return optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.adam(lr_schedule),
    )


def init_lpips_params(image_shape: tuple[int, int], torch_state: dict | None = None):
    """LPIPS params: random-init structure + converted torch weights.

    Returns None when no calibrated weights are given — a random-init LPIPS is
    a noise gradient in the loss and a meaningless metric, so the trainer and
    evaluator skip LPIPS entirely until scripts/convert_weights.py --kind
    lpips provides real weights.
    """
    if torch_state is None:
        return None
    from ..loss.vgg import load_lpips_weights

    lpips = LPIPS()
    variables = jax.jit(lpips.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((1, *image_shape, 3)),
        jnp.zeros((1, *image_shape, 3)),
    )
    return load_lpips_weights(variables, torch_state)["params"]


def create_train_state(
    rng: jax.Array,
    encoder_cfg: EncoderCfg,
    optimizer,
    batch_example: dict,
    lpips_params=None,
    ckpt_cfg=None,
) -> TrainState:
    """Initialize model variables from a (host) example batch.

    lpips_params: converted LPIPS weights (init_lpips_params) or None to train
    without the perceptual term (reference trains with it, but only because it
    ships calibrated weights — loss_lpips.py:27-54).
    ckpt_cfg: CheckpointingCfg whose pretrained_model / dav2_weights .npy
    trees (scripts/convert_weights.py) are merged over the random init —
    the reference's encoder-construction weight loads
    (encoder_trans.py:84-98,113-118).
    """
    model = EncoderTranSplat(encoder_cfg)
    ctx = batch_example["context"]
    # jit the inits: un-jitted flax init runs op-by-op (thousands of
    # dispatches — minutes on high-latency backends instead of seconds).
    variables = jax.jit(partial(model.init, train=False))(
        rng,
        jnp.asarray(ctx["image"]),
        jnp.asarray(ctx["intrinsics"]),
        jnp.asarray(ctx["extrinsics"]),
        jnp.asarray(ctx["near"]),
        jnp.asarray(ctx["far"]),
    )
    if ckpt_cfg is not None and (
        getattr(ckpt_cfg, "pretrained_model", None)
        or getattr(ckpt_cfg, "dav2_weights", None)
    ):
        from .pretrained import load_pretrained_variables

        variables, lpips_state = load_pretrained_variables(variables, ckpt_cfg)
        if lpips_state and lpips_params is None:
            lpips_params = init_lpips_params(
                tuple(ctx["image"].shape[-3:-1]), lpips_state
            )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    opt_state = optimizer.init(params)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        lpips_params=lpips_params,
        opt_state=opt_state,
    )


def make_train_step(
    encoder_cfg: EncoderCfg,
    loss_cfg: LossCfg,
    decoder_cfg: DecoderCfg,
    optimizer,
    image_shape: tuple[int, int],
    donate: bool = True,
    mesh=None,
    lr_schedule=None,
):
    model = EncoderTranSplat(encoder_cfg)
    # LPIPS rides the training loss at the encoder's compute precision (its
    # score math stays f32 inside the module); the evaluator's metric LPIPS
    # is a separate full-f32 instance.
    lpips = LPIPS(
        dtype=jnp.bfloat16 if encoder_cfg.compute_dtype == "bfloat16" else None
    )

    def constrain(x, *axes):
        """Pin a sharding on intermediate values when a mesh is given (sp
        shards the Gaussian axis across chips; dp follows the batch)."""
        if mesh is None:
            return x
        from jax.sharding import NamedSharding, PartitionSpec as P

        return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P(*axes)))

    def loss_fn(params, batch_stats, lpips_params, batch, step, rng):
        ctx, tgt = batch["context"], batch["target"]
        variables = {"params": params, "batch_stats": batch_stats}
        (gaussians, aux), updates = model.apply(
            variables,
            ctx["image"],
            ctx["intrinsics"],
            ctx["extrinsics"],
            ctx["near"],
            ctx["far"],
            global_step=step,
            train=True,
            deterministic=False,
            return_aux=True,
            mutable=["batch_stats"],
            rngs={"dropout": rng},
        )
        gaussians = type(gaussians)(
            means=constrain(gaussians.means, "dp", "sp"),
            covariances=constrain(gaussians.covariances, "dp", "sp"),
            harmonics=constrain(gaussians.harmonics, "dp", "sp"),
            opacities=constrain(gaussians.opacities, "dp", "sp"),
        )
        out = decode_splatting(
            gaussians,
            tgt["extrinsics"],
            tgt["intrinsics"],
            tgt["near"],
            tgt["far"],
            image_shape,
            cfg=decoder_cfg,
            mesh=mesh,
        )

        if lpips_params is None:
            lpips_fn = None  # uncalibrated: skip the perceptual term entirely
        else:

            def lpips_fn(a, b):
                return lpips.apply({"params": lpips_params}, a, b)

        total, parts = compute_losses(
            loss_cfg, out.color, tgt["image"], step, lpips_fn=lpips_fn
        )
        metrics = dict(parts)
        # Capacity-clamp observability: dropped worklist entries silently
        # degrade quality on dense scenes (VERDICT r2 weak #6) — surface the
        # counter in every step's metrics.
        metrics["render_overflow"] = jnp.sum(out.overflow).astype(jnp.float32)
        metrics["psnr"] = -10.0 * jnp.log10(
            jnp.mean(
                (jnp.clip(out.color, 0, 1) - jnp.clip(tgt["image"], 0, 1)) ** 2
            )
            + 1e-12
        )
        return total, (updates.get("batch_stats", batch_stats), metrics)

    @partial(jax.jit, donate_argnums=(0,) if donate else ())
    def train_step(state: TrainState, batch: dict, rng: jax.Array):
        (loss, (new_bs, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(
            state.params,
            state.batch_stats,
            state.lpips_params,
            batch,
            state.step,
            rng,
        )
        updates, new_opt_state = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics["loss"] = loss
        metrics["grad_norm"] = optax.global_norm(grads)
        if lr_schedule is not None:
            # LearningRateMonitor parity (reference src/main.py:103-108).
            metrics["lr"] = lr_schedule(state.step)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt_state,
        )
        return new_state, metrics

    return train_step
