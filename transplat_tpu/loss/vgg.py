"""VGG16 feature extractor + LPIPS perceptual distance (Flax).

Structure mirrors the lpips package's VGG variant used by the reference
(/root/reference/src/loss/loss_lpips.py, src/evaluation/metrics.py:22-33):
five conv stages tapped after relu1_2/relu2_2/relu3_3/relu4_3/relu5_3,
unit-normalized channelwise, 1x1 linear heads, spatial mean.

Pretrained weights are not bundled (zero-egress build): use
`load_lpips_weights` to inject converted torch weights when available; until
then the module runs with its random init — fine for pipeline/grad tests, NOT
a calibrated perceptual metric.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

# VGG16 conv plan: (channels, num_convs) per stage.
_STAGES = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))

# lpips input normalization (the "scaling layer").
_SHIFT = (-0.030, -0.088, -0.188)
_SCALE = (0.458, 0.448, 0.450)


class VGG16Features(nn.Module):
    # Computation dtype for the conv stack (params stay f32). bfloat16 halves
    # the VGG activation traffic when LPIPS rides the training loss; the
    # unit-normalization and heads in LPIPS stay f32 either way.
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        """x: (N, H, W, 3) in [-1, 1] (lpips convention). Returns 5 taps."""
        shift = jnp.asarray(_SHIFT, x.dtype)
        scale = jnp.asarray(_SCALE, x.dtype)
        h = (x - shift) / scale
        taps = []
        idx = 0
        for stage, (ch, n_convs) in enumerate(_STAGES):
            for i in range(n_convs):
                h = nn.Conv(
                    ch, (3, 3), padding=1, name=f"conv{idx}", dtype=self.dtype
                )(h)
                h = nn.relu(h)
                idx += 1
            taps.append(h)
            if stage != len(_STAGES) - 1:
                h = nn.max_pool(h, (2, 2), strides=(2, 2))
        return taps


class LPIPS(nn.Module):
    """Learned perceptual distance; __call__(a, b) -> (N,) distances."""

    dtype: jnp.dtype | None = None  # VGG conv dtype; score math stays f32

    @nn.compact
    def __call__(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """a, b: (N, H, W, 3) in [0, 1]."""
        vgg = VGG16Features(dtype=self.dtype, name="vgg")
        fa = vgg(2.0 * a - 1.0)
        fb = vgg(2.0 * b - 1.0)
        total = 0.0
        for i, (xa, xb) in enumerate(zip(fa, fb)):
            xa = xa.astype(jnp.float32)
            xb = xb.astype(jnp.float32)
            na = xa / (jnp.linalg.norm(xa, axis=-1, keepdims=True) + 1e-10)
            nb = xb / (jnp.linalg.norm(xb, axis=-1, keepdims=True) + 1e-10)
            diff = (na - nb) ** 2
            w = self.param(
                f"lin{i}",
                nn.initializers.uniform(scale=0.1),
                (diff.shape[-1],),
            )
            # 1x1 non-negative linear head, then spatial mean.
            total = total + jnp.mean(
                jnp.sum(diff * jnp.abs(w), axis=-1), axis=(-2, -1)
            )
        return total


def load_lpips_weights(variables, torch_state_dict, strict: bool = True):
    """Inject converted lpips(net='vgg') torch weights into LPIPS variables.

    torch_state_dict: flat dict of numpy arrays in either naming scheme —
    torchvision ('features.N.weight') or the lpips package's slice wrapper
    ('net.sliceK.N.weight', where N keeps torchvision's global feature
    index), optionally under an extra prefix (e.g. a Lightning checkpoint's
    'losses.*.lpips.'). Heads match any key ending 'lin{i}.model.1.weight'.
    strict: require all 13 VGG convs (a partial load silently leaves random
    conv weights — worse than failing).
    """
    import numpy as np

    def conv_index(k):
        parts = k.split(".")
        if not k.endswith(".weight") or "model" in parts:
            return None
        if not ("features" in parts or any(p.startswith("slice") for p in parts)):
            return None
        try:
            return int(parts[-2])  # torchvision feature index (globally unique)
        except ValueError:
            return None

    params = dict(variables["params"])
    vgg_params = {k: dict(v) for k, v in params["vgg"].items()}

    conv_keys = sorted(
        (k for k in torch_state_dict if conv_index(k) is not None),
        key=conv_index,
    )
    if strict and len(conv_keys) != 13:
        raise ValueError(
            f"expected 13 VGG conv weights, matched {len(conv_keys)}: "
            f"{conv_keys[:4]}..."
        )
    for i, wk in enumerate(conv_keys):
        bk = wk[: -len("weight")] + "bias"
        w = np.asarray(torch_state_dict[wk]).transpose(2, 3, 1, 0)
        vgg_params[f"conv{i}"] = {
            "kernel": jnp.asarray(w),
            "bias": jnp.asarray(torch_state_dict[bk]),
        }
    params["vgg"] = vgg_params
    n_heads = 0
    for i in range(5):
        suffix = f"lin{i}.model.1.weight"
        for key in torch_state_dict:
            if key.endswith(suffix):
                params[f"lin{i}"] = jnp.asarray(
                    np.asarray(torch_state_dict[key]).reshape(-1)
                )
                n_heads += 1
                break
    if strict and n_heads != 5:
        raise ValueError(f"expected 5 LPIPS linear heads, matched {n_heads}")
    return {**variables, "params": params}
