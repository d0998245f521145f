"""Import machinery for reference-parity tests.

The reference repo (/root/reference, PyTorch) depends on packages absent from
this image (mmcv, torchvision, e3nn, lpips, dacite, ...). `install_stubs()`
injects minimal stand-ins into sys.modules so the reference *model* modules
import and run on CPU. The deformable-attention fallback is implemented here
from the documented mmcv semantics (value gather via grid_sample) — the
reference routes to it on CPU anyway (attention.py:268-270).
"""

from __future__ import annotations

import sys
import types

REFERENCE_ROOT = "/root/reference"


def _multi_scale_deformable_attn_pytorch(
    value, value_spatial_shapes, sampling_locations, attention_weights
):
    """CPU fallback of mmcv's ms_deform_attn.

    value: (bs, num_keys, num_heads, C); spatial_shapes: (L, 2) of (H, W);
    sampling_locations: (bs, num_q, num_heads, L, P, 2) in [0, 1] (x, y);
    attention_weights: (bs, num_q, num_heads, L, P).
    Returns (bs, num_q, num_heads * C).
    """
    import torch
    import torch.nn.functional as F

    bs, _, num_heads, c = value.shape
    _, num_q, _, levels, points, _ = sampling_locations.shape
    value_list = value.split(
        [int(h) * int(w) for h, w in value_spatial_shapes], dim=1
    )
    # grid_sample wants coords in [-1, 1]
    sampling_grids = 2 * sampling_locations - 1
    out = []
    for lvl, (h, w) in enumerate(value_spatial_shapes):
        h, w = int(h), int(w)
        # (bs, HW, heads, C) -> (bs*heads, C, H, W)
        v_l = (
            value_list[lvl]
            .flatten(2)
            .transpose(1, 2)
            .reshape(bs * num_heads, c, h, w)
        )
        # (bs, num_q, heads, P, 2) -> (bs*heads, num_q, P, 2)
        grid_l = sampling_grids[:, :, :, lvl].transpose(1, 2).flatten(0, 1)
        sampled = F.grid_sample(
            v_l, grid_l, mode="bilinear", padding_mode="zeros", align_corners=False
        )  # (bs*heads, C, num_q, P)
        out.append(sampled)
    # (bs, heads, num_q, L, P)
    attn = attention_weights.transpose(1, 2).reshape(
        bs * num_heads, 1, num_q, levels * points
    )
    stacked = torch.stack(out, dim=-2).flatten(-2)  # (bs*heads, C, num_q, L*P)
    result = (stacked * attn).sum(-1)  # (bs*heads, C, num_q)
    return result.view(bs, num_heads * c, num_q).transpose(1, 2).contiguous()


def install_stubs() -> None:
    if "mmcv" in sys.modules and getattr(sys.modules["mmcv"], "__parity_stub__", False):
        return

    # ---- mmcv ----
    mmcv = types.ModuleType("mmcv")
    mmcv.__parity_stub__ = True
    mmcv_utils = types.ModuleType("mmcv.utils")

    class _ExtLoader:
        @staticmethod
        def load_ext(name, funcs):
            class _Ext:
                def __getattr__(self, item):
                    raise RuntimeError(
                        "mmcv CUDA ext unavailable in parity tests (CPU only)"
                    )

            return _Ext()

    mmcv_utils.ext_loader = _ExtLoader()
    mmcv_ops = types.ModuleType("mmcv.ops")
    mmcv_msda = types.ModuleType("mmcv.ops.multi_scale_deform_attn")
    mmcv_msda.multi_scale_deformable_attn_pytorch = (
        _multi_scale_deformable_attn_pytorch
    )
    mmcv_ops.multi_scale_deform_attn = mmcv_msda
    mmcv.utils = mmcv_utils
    mmcv.ops = mmcv_ops
    sys.modules["mmcv"] = mmcv
    sys.modules["mmcv.utils"] = mmcv_utils
    sys.modules["mmcv.ops"] = mmcv_ops
    sys.modules["mmcv.ops.multi_scale_deform_attn"] = mmcv_msda

    # ---- torchvision (dpt.py only uses transforms.Compose) ----
    tv = types.ModuleType("torchvision")
    tv_tr = types.ModuleType("torchvision.transforms")

    class Compose:
        def __init__(self, fns):
            self.fns = fns

        def __call__(self, x):
            for f in self.fns:
                x = f(x)
            return x

    import numpy as _np
    import torch as _torch_tv

    class ToTensor:
        """HWC uint8/float image (ndarray or PIL) -> CHW float tensor in [0,1]."""

        def __call__(self, pic):
            arr = _np.asarray(pic)
            if arr.ndim == 2:
                arr = arr[:, :, None]
            t = _torch_tv.from_numpy(arr.copy()).permute(2, 0, 1).contiguous()
            if t.dtype == _torch_tv.uint8:
                t = t.float() / 255.0
            return t

    tv_tr.Compose = Compose
    tv_tr.ToTensor = ToTensor
    tv_utils = types.ModuleType("torchvision.utils")
    tv.transforms = tv_tr
    tv.utils = tv_utils
    tv.__path__ = []  # mark as package so 'import torchvision.utils' works
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = tv_tr
    sys.modules["torchvision.utils"] = tv_utils

    # ---- e3nn (sh_rotation imports at module scope; tests monkeypatch
    # rotate_sh itself, so the symbols only need to exist) ----
    e3nn = types.ModuleType("e3nn")
    e3nn_o3 = types.ModuleType("e3nn.o3")

    def _unavailable(*a, **k):
        raise RuntimeError("e3nn unavailable in parity tests")

    e3nn_o3.matrix_to_angles = _unavailable
    e3nn_o3.wigner_D = _unavailable
    e3nn.o3 = e3nn_o3
    sys.modules["e3nn"] = e3nn
    sys.modules["e3nn.o3"] = e3nn_o3

    # ---- dacite (view_sampler_evaluation imports from_dict/Config) ----
    dacite = types.ModuleType("dacite")

    class _DaciteConfig:
        def __init__(self, cast=(), **kw):
            self.cast = cast

    def _from_dict(data_class, data, config=None):
        import dataclasses

        kwargs = {}
        for f in dataclasses.fields(data_class):
            if f.name not in data:
                continue
            v = data[f.name]
            if dataclasses.is_dataclass(f.type) and isinstance(v, dict):
                v = _from_dict(f.type, v, config)
            elif config is not None:
                for typ in config.cast:
                    try:
                        if isinstance(typ, type) and not isinstance(v, typ):
                            v = typ(v)
                    except Exception:
                        pass
            kwargs[f.name] = v
        return data_class(**kwargs)

    dacite.from_dict = _from_dict
    dacite.Config = _DaciteConfig
    sys.modules["dacite"] = dacite

    # ---- pytorch_lightning (evaluation_index_generator subclasses
    # LightningModule at import time; parity tests never run Lightning) ----
    import torch as _torch

    pl = types.ModuleType("pytorch_lightning")

    class LightningModule(_torch.nn.Module):
        def log(self, *a, **k):
            pass

        def log_dict(self, *a, **k):
            pass

    class LightningDataModule:
        pass

    pl.LightningModule = LightningModule
    pl.LightningDataModule = LightningDataModule
    sys.modules["pytorch_lightning"] = pl

    # ---- omegaconf (global_cfg type-annotates DictConfig; encoder_trans
    # reads cfg.mode / cfg.dataset.view_sampler.num_context_views) ----
    omegaconf = types.ModuleType("omegaconf")

    class DictConfig(dict):
        """dict with attribute access, recursively wrapping nested dicts."""

        def __getattr__(self, item):
            try:
                v = self[item]
            except KeyError as e:
                raise AttributeError(item) from e
            if isinstance(v, dict) and not isinstance(v, DictConfig):
                v = DictConfig(v)
                self[item] = v
            return v

        def __setattr__(self, key, value):
            self[key] = value

    class OmegaConf:
        @staticmethod
        def create(d=None):
            return DictConfig(d or {})

        @staticmethod
        def to_container(cfg, **kw):
            return dict(cfg)

    omegaconf.DictConfig = DictConfig
    omegaconf.OmegaConf = OmegaConf
    sys.modules["omegaconf"] = omegaconf

    # ---- leaf libraries used only at runtime by IO/logging paths the
    # parity tests never exercise: any attribute resolves to a raiser.
    def _make_lazy_stub(name):
        mod = types.ModuleType(name)

        def _getattr(item, _name=name):
            if item.startswith("__"):
                raise AttributeError(item)

            def _raiser(*a, **k):
                raise RuntimeError(f"{_name}.{item} unavailable in parity tests")

            return _raiser

        mod.__getattr__ = _getattr
        sys.modules[name] = mod
        return mod

    for leaf in (
        "skvideo",
        "skvideo.io",
        "wandb",
        "colorspacious",
        "plyfile",
        "lpips",
        "skimage",
        "skimage.metrics",
    ):
        if leaf not in sys.modules:
            _make_lazy_stub(leaf)

    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)


def import_ref(name: str):
    """Import a reference module (e.g. 'src.model.utils.attention').

    The reference has a src.model.utils <-> src.model.encoder import cycle
    that only resolves when src.model.encoder initializes first; pre-import
    it for any module inside the cycle.
    """
    import importlib

    install_stubs()
    if name.startswith(("src.model.utils", "src.model.encoder")):
        importlib.import_module("src.model.encoder")
    return importlib.import_module(name)
