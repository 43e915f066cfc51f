"""Numerical parity: our flax modules vs the reference torch modules with
converted weights (random init, eval mode). This is the strongest check we
can run without the released checkpoints: identical math => identical outputs
for ANY weights, so random-weight parity implies checkpoint parity.
"""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from handmvnet_tpu.checkpoint import assert_trees_match, convert_torch_state_dict
from handmvnet_tpu.models.backbones.resnet import ResNetBackbone
from handmvnet_tpu.models.backbones.hrnet import HRNetBackbone
from handmvnet_tpu.models.fusion import CrossAttentionFusion
from handmvnet_tpu.models.nets import JointsDecoderGCN, SampleNet

from reference_oracle import import_reference_modules

REF = import_reference_modules()


def to_nhwc(x: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(x, (0, 2, 3, 1)))


def convert_for(module_flax, variables_torch, x_args, **apply_kw):
    """Convert torch weights, check structure vs a fresh init, run apply."""
    converted = convert_torch_state_dict(variables_torch)
    init_vars = module_flax.init(jax.random.PRNGKey(0), *x_args, **apply_kw)
    expected = {k: v for k, v in init_vars.items()}
    got = {k: converted.get(k, {}) for k in expected}
    assert_trees_match(jax.tree.map(np.shape, expected), jax.tree.map(np.shape, got))
    out = module_flax.apply(converted, *x_args, **apply_kw)
    return out


class TestResNetParity:
    def test_resnet50_paper(self, rng):
        tmodel = REF.resnet.ResNet50_Paper({"PRETRAINED": False}).eval()
        x = rng.normal(size=(2, 3, 64, 64)).astype(np.float32)
        with torch.no_grad():
            oracle = tmodel(torch.from_numpy(x)).numpy()

        ours = convert_for(
            ResNetBackbone(version="50_paper", early_return=3),
            tmodel.state_dict(),
            (jnp.asarray(to_nhwc(x)),),
        )
        np.testing.assert_allclose(
            np.transpose(np.asarray(ours), (0, 3, 1, 2)), oracle, atol=1e-3
        )

    def test_resnet34_multiscale(self, rng):
        tmodel = REF.resnet.ResNet34(
            {"PRETRAINED": False, "FREEZE_BATCHNORM": False, "EARLY_RETURN": 3}
        ).eval()
        x = rng.normal(size=(2, 3, 64, 64)).astype(np.float32)
        with torch.no_grad():
            oracle = tmodel(torch.from_numpy(x))

        model = ResNetBackbone(version="34", early_return=3)
        converted = convert_torch_state_dict(tmodel.state_dict())
        ours = model.apply(converted, jnp.asarray(to_nhwc(x)))
        assert set(ours.keys()) == set(oracle.keys())
        for k in oracle:
            np.testing.assert_allclose(
                np.transpose(np.asarray(ours[k]), (0, 3, 1, 2)),
                oracle[k].numpy(),
                atol=1e-3,
                err_msg=k,
            )

    def test_resnet18_frozen_bn(self, rng):
        tmodel = REF.resnet.ResNet18(
            {"PRETRAINED": False, "FREEZE_BATCHNORM": True, "EARLY_RETURN": 2}
        ).eval()
        # randomize the frozen BN buffers so the affine fold is non-trivial
        sd = tmodel.state_dict()
        for k, v in sd.items():
            if "running_mean" in k:
                sd[k] = torch.randn_like(v) * 0.1
            if "running_var" in k:
                sd[k] = torch.rand_like(v) + 0.5
        tmodel.load_state_dict(sd)
        x = rng.normal(size=(1, 3, 64, 64)).astype(np.float32)
        with torch.no_grad():
            oracle = tmodel(torch.from_numpy(x))
        converted = convert_torch_state_dict(tmodel.state_dict())
        ours = ResNetBackbone(version="18", early_return=2, frozen_bn=True).apply(
            converted, jnp.asarray(to_nhwc(x))
        )
        for k in oracle:
            np.testing.assert_allclose(
                np.transpose(np.asarray(ours[k]), (0, 3, 1, 2)),
                oracle[k].numpy(),
                atol=1e-3,
                err_msg=k,
            )


class TestHRNetParity:
    @pytest.mark.slow
    def test_hrnet_w40(self, rng):
        tmodel = REF.hrnet.HRNet({"PRETRAINED": "", "HRNET_TYPE": "w40"}).eval()
        x = rng.normal(size=(1, 3, 64, 64)).astype(np.float32)
        with torch.no_grad():
            oracle = tmodel(torch.from_numpy(x))
        converted = convert_torch_state_dict(tmodel.state_dict())
        ours = HRNetBackbone(width="w40").apply(converted, jnp.asarray(to_nhwc(x)))
        assert len(ours) == len(oracle) == 4
        # random kaiming init explodes magnitudes (~1e7) through 30+ unnormalized
        # convs, amplifying fp32 accumulation-order noise -> compare relatively
        for i, (o_t, o_j) in enumerate(zip(oracle, ours)):
            a = np.transpose(np.asarray(o_j), (0, 3, 1, 2))
            b = o_t.numpy()
            denom = np.maximum(np.abs(b).max(), 1.0)
            np.testing.assert_allclose(a / denom, b / denom, atol=5e-3, err_msg=f"branch {i}")


class TestFusionParity:
    def test_cross_attention_fusion(self, rng):
        d, v = 64, 4
        tmodel = REF.fusion.CrossAttentionFusion(
            feat_dim=d, max_tokens=21 * v, custom_query_length=21, num_layers=5, drop_out=0.1
        ).eval()
        x = rng.normal(size=(2, 21 * v, d)).astype(np.float32)
        with torch.no_grad():
            oracle = tmodel(torch.from_numpy(x), add_pos=True).numpy()
        converted = convert_torch_state_dict(tmodel.state_dict())
        ours = CrossAttentionFusion(
            feat_dim=d, max_tokens=21 * v, custom_query_length=21, num_layers=5, dropout=0.1
        ).apply(converted, jnp.asarray(x), add_pos=True)
        np.testing.assert_allclose(np.asarray(ours), oracle, atol=2e-5)

    def test_learnable_query_fusion(self, rng):
        d, v = 32, 2
        tmodel = REF.fusion.CrossAttentionFusionLearnableQuery(
            feat_dim=d, max_tokens=21 * v, drop_out=0.0
        ).eval()
        x = rng.normal(size=(2, 21 * v, d)).astype(np.float32)
        with torch.no_grad():
            oracle = tmodel(torch.from_numpy(x)).numpy()
        from handmvnet_tpu.models.fusion import CrossAttentionFusionLearnableQuery

        converted = convert_torch_state_dict(tmodel.state_dict())
        ours = CrossAttentionFusionLearnableQuery(feat_dim=d, max_tokens=21 * v).apply(
            converted, jnp.asarray(x)
        )
        np.testing.assert_allclose(np.asarray(ours), oracle, atol=2e-5)


class TestDecoderParity:
    def test_joints_decoder_gcn(self, rng):
        tmodel = REF.nets.JointsDecoderGCN(in_features=128).eval()
        x = rng.normal(size=(3, 21, 128)).astype(np.float32)
        with torch.no_grad():
            oracle = tmodel(torch.from_numpy(x)).numpy()
        converted = convert_torch_state_dict(tmodel.state_dict())
        ours = JointsDecoderGCN(in_features=128).apply(converted, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(ours), oracle, atol=1e-5)

    def test_sample_net(self, rng):
        tmodel = REF.nets.SampleNet([64, 32]).eval()
        feat = rng.normal(size=(2, 64, 32, 32)).astype(np.float32)
        coords = rng.uniform(0, 31, size=(2, 21, 2)).astype(np.float32)
        with torch.no_grad():
            oracle = tmodel(torch.from_numpy(feat), torch.from_numpy(coords)).numpy()
        converted = convert_torch_state_dict(tmodel.state_dict())
        ours = SampleNet(out_channels=32).apply(
            converted, jnp.asarray(to_nhwc(feat)), jnp.asarray(coords)
        )
        np.testing.assert_allclose(np.asarray(ours), oracle, atol=1e-5)


class TestHourglassParity:
    @pytest.mark.slow
    def test_stacked_hourglass(self, rng):
        from handmvnet_tpu.models.backbones.hourglass import StackedHourglass

        tmodel = REF.hourglass.StackedHourglass(
            nstack=2, inp_dim=32, oup_dim=21, recur_hg=2, start=True
        ).eval()
        x = rng.normal(size=(1, 3, 64, 64)).astype(np.float32)
        with torch.no_grad():
            o_feat, o_hm, o_final = tmodel(torch.from_numpy(x))
        converted = convert_torch_state_dict(tmodel.state_dict())
        model = StackedHourglass(nstack=2, inp_dim=32, oup_dim=21, recur_hg=2)
        feats, hm, final = model.apply(converted, jnp.asarray(to_nhwc(x)))
        np.testing.assert_allclose(
            np.transpose(np.asarray(feats), (0, 3, 1, 2)), o_feat.numpy(), atol=1e-3)
        np.testing.assert_allclose(
            np.transpose(np.asarray(hm), (0, 1, 4, 2, 3)), o_hm.numpy(), atol=1e-3)
        np.testing.assert_allclose(
            np.transpose(np.asarray(final), (0, 3, 1, 2)), o_final.numpy(), atol=1e-3)

    @pytest.mark.slow
    def test_bisected_hourglass(self, rng):
        """Twin-stream (heatmap + mask) variant with converted weights —
        previously only shape-tested (reference hourglass.py:173-285)."""
        from handmvnet_tpu.models.backbones.hourglass import StackedBisectedHourglass

        tmodel = REF.hourglass.StackedBisectedHourglass(
            nstack=2, inp_dim=32, oup_dim=21, recur_hg=2, start=True
        ).eval()
        x = rng.normal(size=(1, 3, 64, 64)).astype(np.float32)
        with torch.no_grad():
            o_feat, o_hm, o_final, o_mask = tmodel(torch.from_numpy(x))
        converted = convert_torch_state_dict(tmodel.state_dict())
        model = StackedBisectedHourglass(nstack=2, inp_dim=32, oup_dim=21, recur_hg=2)
        feats, hm, final, mask = model.apply(converted, jnp.asarray(to_nhwc(x)))
        np.testing.assert_allclose(
            np.transpose(np.asarray(feats), (0, 3, 1, 2)), o_feat.numpy(), atol=1e-3)
        np.testing.assert_allclose(
            np.transpose(np.asarray(hm), (0, 1, 4, 2, 3)), o_hm.numpy(), atol=1e-3)
        np.testing.assert_allclose(
            np.transpose(np.asarray(final), (0, 3, 1, 2)), o_final.numpy(), atol=1e-3)
        np.testing.assert_allclose(
            np.transpose(np.asarray(mask), (0, 1, 4, 2, 3)), o_mask.numpy(), atol=1e-3)
