"""Checkpoint plumbing: config round-trip, Lightning-style torch .ckpt
loading (model. prefixes + legacy remaps), orbax save/restore round-trip."""

import numpy as np
import torch
import jax
import jax.numpy as jnp
import yaml

from handmvnet_tpu.checkpoint import (
    convert_torch_state_dict,
    restore_checkpoint,
    save_checkpoint,
)
from handmvnet_tpu.config import Config


class TestConfigRoundTrip:
    def test_dump_and_reload(self, tmp_path):
        cfg = Config.from_yaml("configs/release/DexYCB_HandMvNet_HR_wo_cam.yaml")
        path = cfg.dump(tmp_path)
        raw = yaml.safe_load(path.read_text())
        assert "git_hash" in raw and "slurm_job_id" in raw
        cfg2 = Config.from_dict(raw)
        assert cfg2.model == cfg.model
        assert cfg2.data == cfg.data
        assert cfg2.train == cfg.train

    def test_all_release_configs_parse(self):
        import glob

        for path in sorted(glob.glob("configs/release/*.yaml")):
            cfg = Config.from_yaml(path)
            assert cfg.model.num_views in (4, 5, 8)
            assert cfg.model.feat_dim in (302, 312, 514, 524)
            assert cfg.root_idx in (0, 2, 3)


class TestLightningCheckpointLoad:
    def test_lightning_prefix_and_legacy_remap(self, tmp_path):
        """A Lightning-style ckpt with model. prefixes and LEGACY keys
        (pose_net.conv.*, sample_net.*) converts to the expected flax paths
        (reference eval.py:15-52)."""
        sd = {
            "model.pose_net.conv.0.weight": torch.randn(512, 1024, 1, 1),
            "model.pose_net.conv.0.bias": torch.randn(512),
            "model.sample_net.conv.0.weight": torch.randn(512, 1024, 1, 1),
            "model.backbone.conv1.weight": torch.randn(64, 3, 7, 7),
            "model.backbone.bn1.weight": torch.ones(64),
            "model.backbone.bn1.running_mean": torch.zeros(64),
            "model.backbone.bn1.num_batches_tracked": torch.tensor(5),
        }
        ckpt_path = tmp_path / "legacy.ckpt"
        torch.save({"state_dict": sd, "hyper_parameters": {}}, ckpt_path)

        payload = torch.load(ckpt_path, map_location="cpu", weights_only=False)
        variables = convert_torch_state_dict(payload["state_dict"])
        p = variables["params"]
        assert p["pose_net_0"]["kernel"].shape == (1, 1, 1024, 512)
        assert p["sample_nets_0"]["conv_0"]["kernel"].shape == (1, 1, 1024, 512)
        assert p["backbone"]["conv1"]["kernel"].shape == (7, 7, 3, 64)
        assert p["backbone"]["bn1"]["scale"].shape == (64,)
        assert variables["batch_stats"]["backbone"]["bn1"]["mean"].shape == (64,)
        # num_batches_tracked dropped
        flat = jax.tree.leaves(variables)
        assert all(np.asarray(x).ndim > 0 for x in flat)


class TestOrbaxRoundTrip:
    def test_save_restore_pytree(self, tmp_path):
        state = {
            "params": {"a": jnp.arange(6.0).reshape(2, 3), "b": jnp.ones((4,))},
            "step": jnp.asarray(7),
        }
        save_checkpoint(tmp_path / "ck", state)
        restored = restore_checkpoint(tmp_path / "ck", state)
        np.testing.assert_array_equal(np.asarray(restored["params"]["a"]),
                                      np.asarray(state["params"]["a"]))
        assert int(restored["step"]) == 7
