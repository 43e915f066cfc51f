"""Pretrained-backbone initialization: a torchvision-format ImageNet
state_dict loaded through the config path must produce a backbone that
matches the reference model loading the same dict (reference
resnet.py:205-213 strict load w/ paper drops; hrnet.py:409-426 partial
load). No egress: the 'torchvision' dict is fabricated from the reference
ResNet50 (identical key/shape schema incl. fc.*)."""

import dataclasses

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from handmvnet_tpu.config import Config
from handmvnet_tpu.models.backbones.resnet import ResNetBackbone
from handmvnet_tpu.models.backbones.hrnet import HRNetBackbone
from handmvnet_tpu.pretrained import (
    graft_backbone,
    load_pretrained_backbone,
    load_state_dict_file,
    resolve_pretrained_path,
)

from reference_oracle import import_reference_modules

REF = import_reference_modules()


def fabricate_torchvision_resnet50():
    """The reference ResNet50 state_dict has exactly torchvision's schema
    (conv1/bn1/layerN.M.*/fc.*)."""
    torch.manual_seed(3)
    return REF.resnet.ResNet50({"PRETRAINED": False}).state_dict()


class TestResNetPretrained:
    def test_paper_variant_through_config_path(self, tmp_path, rng):
        sd = fabricate_torchvision_resnet50()
        ckpt = tmp_path / "resnet50_imagenet.pth"
        torch.save(sd, ckpt)

        # torch oracle: reference drop rules + strict load into the paper model
        tmodel = REF.resnet.ResNet50_Paper({"PRETRAINED": False}).eval()
        tmodel.load_pretrained({k: v.clone() for k, v in sd.items()})
        x = rng.normal(size=(2, 3, 64, 64)).astype(np.float32)
        with torch.no_grad():
            oracle = tmodel(torch.from_numpy(x)).numpy()

        # config path: resolve dir -> file, load, graft into fresh variables
        cfg = Config.from_yaml("configs/release/HO3D_HandMvNet.yaml")
        mcfg = dataclasses.replace(
            cfg.model, backbone_pretrained=True,
            backbone_pretrained_path=str(tmp_path),
        )
        path = resolve_pretrained_path(mcfg)
        assert path == ckpt

        model = ResNetBackbone(version="50_paper", early_return=3)
        xj = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
        variables = model.init(jax.random.PRNGKey(0), xj)
        wrapped = {
            coll: {"backbone": tree} for coll, tree in variables.items()
        }
        grafted = graft_backbone(
            wrapped, load_state_dict_file(path), "resnet", "paper"
        )
        ours = model.apply(
            {coll: tree["backbone"] for coll, tree in grafted.items()}, xj
        )
        np.testing.assert_allclose(
            np.transpose(np.asarray(ours), (0, 3, 1, 2)), oracle, atol=1e-3
        )

    def test_strict_missing_keys_raise(self):
        sd = fabricate_torchvision_resnet50()
        sd.pop("layer2.0.conv1.weight")
        model = ResNetBackbone(version="50_paper", early_return=3)
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32)
        )
        wrapped = {coll: {"backbone": tree} for coll, tree in variables.items()}
        with pytest.raises(ValueError, match="strict"):
            graft_backbone(wrapped, sd, "resnet", "paper")

    def test_shape_mismatch_raises(self):
        sd = fabricate_torchvision_resnet50()
        sd["conv1.weight"] = torch.zeros(64, 3, 3, 3)  # wrong kernel size
        model = ResNetBackbone(version="50_paper", early_return=3)
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32)
        )
        wrapped = {coll: {"backbone": tree} for coll, tree in variables.items()}
        with pytest.raises(ValueError, match="shape mismatch"):
            graft_backbone(wrapped, sd, "resnet", "paper")

    def test_missing_file_raises(self):
        cfg = Config.from_yaml("configs/release/HO3D_HandMvNet.yaml")
        mcfg = dataclasses.replace(
            cfg.model, backbone_pretrained=True,
            backbone_pretrained_path="/nonexistent/dir",
        )
        with pytest.raises(FileNotFoundError):
            resolve_pretrained_path(mcfg)

    def test_empty_path_warns_and_skips(self, capsys):
        cfg = Config.from_yaml("configs/release/HO3D_HandMvNet.yaml")

        class FakeState:
            params = {"backbone": {}}
            batch_stats = {}

        state = FakeState()
        out = load_pretrained_backbone(state, cfg)
        assert out is state  # untouched
        assert "no backbone_pretrained_path" in capsys.readouterr().out


class TestHRNetPretrained:
    def test_partial_load_ignores_head_keys(self, rng):
        torch.manual_seed(5)
        tmodel = REF.hrnet.HRNet({"HRNET_TYPE": "w40", "PRETRAINED": False}).eval()
        sd = {k: v.clone() for k, v in tmodel.state_dict().items()}
        # the official hrnetv2 ImageNet ckpts carry a classification head the
        # pose model lacks — the partial load must skip them (hrnet.py:424)
        sd["classifier.weight"] = torch.zeros(1000, 2048)
        sd["classifier.bias"] = torch.zeros(1000)
        sd["incre_modules.0.0.conv1.weight"] = torch.zeros(32, 64, 1, 1)

        x = rng.normal(size=(1, 3, 64, 64)).astype(np.float32)
        with torch.no_grad():
            oracle = [o.numpy() for o in tmodel(torch.from_numpy(x))]

        model = HRNetBackbone(width="w40")
        xj = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
        variables = model.init(jax.random.PRNGKey(0), xj)
        wrapped = {coll: {"backbone": tree} for coll, tree in variables.items()}
        grafted = graft_backbone(wrapped, sd, "hrnet")
        ours = model.apply(
            {coll: tree["backbone"] for coll, tree in grafted.items()}, xj
        )
        # random kaiming cascades blow activations up to ~1e7 and fp32
        # summation order differs between XLA and torch; this test checks
        # key ROUTING (a mis-grafted tensor gives O(1) relative errors) —
        # numerical parity proper is test_parity_model.py's job
        for o, t in zip(ours, oracle):
            np.testing.assert_allclose(
                np.transpose(np.asarray(o), (0, 3, 1, 2)), t,
                rtol=2e-2, atol=50,
            )

    def test_zero_match_raises(self):
        model = HRNetBackbone(width="w40")
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32)
        )
        wrapped = {coll: {"backbone": tree} for coll, tree in variables.items()}
        with pytest.raises(ValueError, match="zero"):
            graft_backbone(wrapped, {"bogus.weight": np.zeros((3, 3))}, "hrnet")
