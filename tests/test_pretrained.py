"""Pretrained-weight bootstrap through config alone.

The reference loads UniMatch/DAv2 partial weights at encoder construction
(encoder_trans.py:84-98,113-118) and full Lightning checkpoints for eval
(src/main.py:112,154-158). Here the equivalent path is
cfg.checkpointing.{pretrained_model,dav2_weights} -> .npy trees merged over
random init inside create_train_state. Tree-structure conversion itself is
covered by tests/parity/; these tests cover the config glue."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transplat_tpu.config import CheckpointingCfg
from transplat_tpu.dataset.loader import synthetic_batch
from transplat_tpu.model.adapter import GaussianAdapterCfg
from transplat_tpu.model.encoder import EncoderCfg
from transplat_tpu.training.pretrained import load_pretrained_variables, merge_tree
from transplat_tpu.training.schedule import make_lr_schedule
from transplat_tpu.training.step import create_train_state, make_optimizer

pytestmark = pytest.mark.slow

H = W = 16


def tiny_encoder_cfg():
    return EncoderCfg(
        d_feature=16,
        num_depth_candidates=16,
        num_context_views=2,
        costvolume_unet_feat_dim=16,
        costvolume_unet_channel_mult=(1, 1),
        costvolume_unet_attn_res=(2,),
        depth_unet_feat_dim=8,
        depth_unet_attn_res=(4,),
        depth_unet_channel_mult=(1, 1, 1),
        dav2_encoder="vits",
        dav2_input_size=28,
        gaussian_adapter=GaussianAdapterCfg(sh_degree=1),
    )


@pytest.fixture(scope="module")
def base_state():
    cfg = tiny_encoder_cfg()
    batch = synthetic_batch(0, batch_size=1, image_shape=(H, W), num_target=1)
    optimizer = make_optimizer(make_lr_schedule(2e-4, 100))
    state = create_train_state(jax.random.PRNGKey(0), cfg, optimizer, batch)
    return cfg, optimizer, batch, state


def _perturb(tree):
    return jax.tree.map(lambda x: np.asarray(x) + 1.0, tree)


class TestMergeTree:
    def test_partial_merge_and_untouched_leaves(self):
        base = {"a": {"x": jnp.zeros(3), "y": jnp.ones(2)}, "b": jnp.zeros(1)}
        out = merge_tree(base, {"a": {"x": np.full(3, 7.0)}})
        np.testing.assert_array_equal(np.asarray(out["a"]["x"]), 7.0)
        np.testing.assert_array_equal(np.asarray(out["a"]["y"]), 1.0)

    def test_unknown_key_raises(self):
        with pytest.raises(KeyError, match="nope"):
            merge_tree({"a": jnp.zeros(2)}, {"nope": np.zeros(2)})

    def test_shape_mismatch_raises(self):
        with pytest.raises(ValueError, match="shape mismatch"):
            merge_tree({"a": jnp.zeros(2)}, {"a": np.zeros(3)})


class TestConfigDrivenLoad:
    def test_encoder_level_tree_via_config(self, tmp_path, base_state):
        cfg, optimizer, batch, state = base_state
        # A "lightning"-shaped tree: encoder-level params, one subtree only.
        tree = {
            "params": {"depth_predictor": _perturb(state.params["depth_predictor"])},
            "batch_stats": {},
        }
        path = tmp_path / "pretrained.npy"
        np.save(path, tree, allow_pickle=True)
        ckpt_cfg = CheckpointingCfg(pretrained_model=str(path))
        loaded = create_train_state(
            jax.random.PRNGKey(0), cfg, optimizer, batch, ckpt_cfg=ckpt_cfg
        )
        # Overridden subtree took the checkpoint values ...
        got = jax.tree.leaves(loaded.params["depth_predictor"])
        want = jax.tree.leaves(tree["params"]["depth_predictor"])
        for g, w in zip(got, want):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
        # ... while untouched subtrees keep the (same-seed) random init.
        for g, w in zip(
            jax.tree.leaves(loaded.params["backbone"]),
            jax.tree.leaves(state.params["backbone"]),
        ):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(w))

    def test_unimatch_and_dav2_trees_nest(self, base_state, tmp_path):
        cfg, optimizer, batch, state = base_state
        # unimatch converter shape: BackboneMultiview subtree (has
        # 'transformer' at top level).
        uni = {
            "params": {
                "backbone": _perturb(state.params["backbone"]["backbone"]),
                "transformer": _perturb(state.params["backbone"]["transformer"]),
            },
            "batch_stats": {},
        }
        p1 = tmp_path / "unimatch.npy"
        np.save(p1, uni, allow_pickle=True)
        # dav2 converter shape: the DAv2 module subtree.
        dav2 = {"params": _perturb(state.params["da_model"]), "batch_stats": {}}
        p2 = tmp_path / "dav2.npy"
        np.save(p2, dav2, allow_pickle=True)

        variables = {"params": state.params, "batch_stats": state.batch_stats}
        merged, lpips_state = load_pretrained_variables(
            variables,
            CheckpointingCfg(pretrained_model=str(p1), dav2_weights=str(p2)),
        )
        assert lpips_state is None
        for g, w in zip(
            jax.tree.leaves(merged["params"]["backbone"]["transformer"]),
            jax.tree.leaves(uni["params"]["transformer"]),
        ):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
        for g, w in zip(
            jax.tree.leaves(merged["params"]["da_model"]),
            jax.tree.leaves(dav2["params"]),
        ):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
        # cam_param_encoder is NOT in the unimatch tree -> stays random init.
        for g, w in zip(
            jax.tree.leaves(merged["params"]["backbone"]["cam_param_encoder"]),
            jax.tree.leaves(state.params["backbone"]["cam_param_encoder"]),
        ):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(w))

    def test_lightning_embedded_lpips(self, base_state, tmp_path):
        cfg, optimizer, batch, state = base_state
        # Lightning checkpoints embed the frozen LPIPS VGG under 'losses.*'
        # (lpips-package naming: net.sliceK.<torchvision idx>.weight).
        plan = [
            (3, 64), (64, 64), (64, 128), (128, 128), (128, 256), (256, 256),
            (256, 256), (256, 512), (512, 512), (512, 512), (512, 512),
            (512, 512), (512, 512),
        ]
        tv_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
        rng = np.random.RandomState(0)
        lpips_state = {}
        for (cin, cout), idx in zip(plan, tv_idx):
            s = 1 + (0 if idx <= 3 else 1 if idx <= 8 else 2 if idx <= 15 else 3 if idx <= 22 else 4)
            lpips_state[f"losses.0.lpips.net.slice{s}.{idx}.weight"] = rng.randn(
                cout, cin, 3, 3
            ).astype(np.float32)
            lpips_state[f"losses.0.lpips.net.slice{s}.{idx}.bias"] = rng.randn(
                cout
            ).astype(np.float32)
        for i, ch in enumerate([64, 128, 256, 512, 512]):
            lpips_state[f"losses.0.lpips.lin{i}.model.1.weight"] = rng.rand(
                1, ch, 1, 1
            ).astype(np.float32)
        tree = {
            "params": {"depth_predictor": state.params["depth_predictor"]},
            "batch_stats": {},
            "lpips_state": lpips_state,
        }
        path = tmp_path / "lightning.npy"
        np.save(path, tree, allow_pickle=True)
        loaded = create_train_state(
            jax.random.PRNGKey(0), cfg, optimizer, batch,
            ckpt_cfg=CheckpointingCfg(pretrained_model=str(path)),
        )
        assert loaded.lpips_params is not None
        conv0 = np.asarray(loaded.lpips_params["vgg"]["conv0"]["kernel"])
        want = lpips_state["losses.0.lpips.net.slice1.0.weight"].transpose(2, 3, 1, 0)
        np.testing.assert_array_equal(conv0, want)
        lin0 = np.asarray(loaded.lpips_params["lin0"])
        np.testing.assert_array_equal(
            lin0, lpips_state["losses.0.lpips.lin0.model.1.weight"].reshape(-1)
        )
