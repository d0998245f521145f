"""Convert reference PyTorch checkpoints into transplat_tpu Flax variables.

Covers every pretrained source the reference loads:
  * --kind unimatch : UniMatch gmdepth checkpoint -> backbone CNN+transformer
                      partial load (encoder_trans.py:84-98, incl. the
                      matching-transformer keys)
  * --kind dav2     : Depth-Anything-V2 (vits/vitb/vitl) -> model.da_model
  * --kind lpips    : lpips(net='vgg') state dict -> LPIPS loss/metric weights
  * --kind lightning: full TranSplat Lightning checkpoint -> the WHOLE encoder
                      (+ the losses.* LPIPS buffers it embeds)

Output: a numpy .npy holding the variables dict (np.load(..,
allow_pickle=True).item()), consumable by CheckpointManager/pretrained-load
paths and by cfg.checkpointing.{pretrained_model,dav2_weights,lpips_weights}.

The per-module mappings live in transplat_tpu/convert/ and are validated by
tests/parity/ against the reference modules with random-init state dicts;
running on a real checkpoint only re-exercises the same code path.
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse

import numpy as np

from transplat_tpu.convert.backbone import convert_unimatch_checkpoint
from transplat_tpu.convert.dav2 import convert_dav2
from transplat_tpu.convert.encoder import convert_lightning_checkpoint


def convert_lpips(sd: dict) -> dict:
    """lpips(net='vgg') torch state dict -> the flat numpy dict consumed by
    transplat_tpu.loss.vgg.load_lpips_weights (keys kept verbatim)."""
    wanted = {
        k: np.asarray(v)
        for k, v in sd.items()
        if ("net." in k or k.startswith(("lin", "scaling_layer")) or "features" in k)
    }
    if not wanted:
        raise ValueError("no lpips VGG keys found in checkpoint")
    return wanted


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("source", help="torch checkpoint (.pth/.ckpt)")
    parser.add_argument(
        "--kind", choices=["dav2", "unimatch", "lpips", "lightning"], required=True
    )
    parser.add_argument("--encoder", default="vitb", help="DAv2 variant (dav2 kind)")
    parser.add_argument("--out", required=True, help="output .npy path")
    parser.add_argument(
        "--dry-run", action="store_true", help="print the converted tree and exit"
    )
    args = parser.parse_args()

    import torch

    ckpt = torch.load(args.source, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt.get("state_dict", ckpt))
    sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}

    if args.kind == "dav2":
        out = convert_dav2(sd, encoder=args.encoder)
    elif args.kind == "unimatch":
        out = convert_unimatch_checkpoint(sd)
    elif args.kind == "lightning":
        out = convert_lightning_checkpoint(ckpt if "state_dict" in ckpt else sd)
    else:
        out = convert_lpips(sd)

    if args.dry_run:
        import jax

        for path, leaf in jax.tree_util.tree_leaves_with_path(out):
            print("/".join(str(getattr(p, "key", p)) for p in path), leaf.shape)
        return

    np.save(args.out, out, allow_pickle=True)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
