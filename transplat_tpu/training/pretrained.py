"""Pretrained-weight bootstrap: merge converted checkpoint trees into
freshly-initialized model variables, driven by config alone.

Mirrors the reference's weight-loading paths:
  * UniMatch backbone partial load at encoder construction
    (/root/reference/src/model/encoder/encoder_trans.py:84-98)
  * DAv2 full load (/root/reference/src/model/encoder/encoder_trans.py:113-118)
  * full Lightning checkpoint restore for eval
    (/root/reference/src/main.py:112,154-158)

The .npy trees come from scripts/convert_weights.py (--kind unimatch / dav2 /
lightning) and are consumed through cfg.checkpointing.pretrained_model and
cfg.checkpointing.dav2_weights. Partial trees merge over random init: only
leaves present in the converted tree replace their counterparts, and every
converted leaf must exist in the model with a matching shape (loud failure
beats silently-ignored weights).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def merge_tree(base: dict, override: dict, path: str = "") -> dict:
    """Recursively replace leaves of `base` with leaves of `override`.

    Strict: every override leaf must exist in base with a matching shape.
    """
    out = dict(base)
    for k, v in override.items():
        here = f"{path}/{k}" if path else str(k)
        if k not in base:
            raise KeyError(f"pretrained key '{here}' not present in model tree")
        if isinstance(v, dict):
            if not isinstance(base[k], dict):
                raise ValueError(f"'{here}' is a subtree in the checkpoint "
                                 "but a leaf in the model")
            out[k] = merge_tree(base[k], v, here)
        else:
            b = base[k]
            if tuple(np.shape(b)) != tuple(np.shape(v)):
                raise ValueError(
                    f"shape mismatch at '{here}': model {np.shape(b)} vs "
                    f"checkpoint {np.shape(v)}"
                )
            out[k] = jnp.asarray(v, dtype=jnp.asarray(b).dtype)
    return out


def _nest_for_encoder(tree: dict) -> dict:
    """Normalize a converted tree to encoder-level {'params', 'batch_stats'}.

    scripts/convert_weights.py emits three shapes:
      * lightning/encoder: params top keys {backbone, da_model,
        depth_predictor} — already encoder-level
      * unimatch: params top keys {backbone, transformer} — a
        BackboneMultiview subtree; nest under 'backbone'
      * dav2: a DAv2 subtree (params top keys {pretrained|dinov2-ish,
        depth_head}) — nest under 'da_model'
    """
    params = tree.get("params", {})
    top = set(params.keys())
    if top <= {"backbone", "da_model", "depth_predictor"}:
        return tree
    if "transformer" in top:  # BackboneMultiview subtree (unimatch)
        return {
            "params": {"backbone": params},
            "batch_stats": {"backbone": tree.get("batch_stats", {})},
        }
    # Anything else: treat as the frozen DAv2 module subtree.
    return {
        "params": {"da_model": params},
        "batch_stats": (
            {"da_model": tree["batch_stats"]} if tree.get("batch_stats") else {}
        ),
    }


def load_pretrained_variables(variables: dict, ckpt_cfg) -> tuple[dict, dict | None]:
    """Merge cfg.checkpointing.{pretrained_model,dav2_weights} .npy trees
    into `variables` ({'params':..., 'batch_stats':...}).

    Returns (variables, lpips_state): lpips_state is the raw torch LPIPS
    state embedded in a Lightning checkpoint ('losses.*' keys), or None.
    """
    lpips_state = None
    for attr in ("pretrained_model", "dav2_weights"):
        src = getattr(ckpt_cfg, attr, None)
        if not src:
            continue
        tree = np.load(src, allow_pickle=True).item()
        embedded = tree.pop("lpips_state", None)
        if embedded:
            lpips_state = embedded
        tree = _nest_for_encoder(tree)
        new_params = merge_tree(variables["params"], tree.get("params", {}))
        bs = variables.get("batch_stats", {})
        if tree.get("batch_stats"):
            bs = merge_tree(bs, tree["batch_stats"])
        variables = {**variables, "params": new_params, "batch_stats": bs}
    return variables, lpips_state
