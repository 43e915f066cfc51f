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
from handmvnet_tpu.config import Config
from handmvnet_tpu.models import HandMvNet
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


def build_torch_full_model(cfg: Config):
    """Wire the reference's own submodules exactly as HandMvNet.forward does
    (src/models/handmvnet.py:28-266) — the Lightning class itself can't be
    imported without its heavy deps."""
    m = cfg.model

    class TorchHandMvNet(torch.nn.Module):
        def __init__(self):
            super().__init__()
            assert m.backbone == "resnet" and m.backbone_type == "50_paper"
            self.backbone = REF.resnet.ResNet50_Paper({"PRETRAINED": False})
            self.pose_net = REF.layers.make_conv_layers(
                [m.backbone_channels[0], 512, 21], kernel=1, stride=1, padding=0,
                bnrelu_final=False,
            )
            self.sample_nets = torch.nn.ModuleList(
                [REF.nets.SampleNet([c, c // 2]) for c in m.backbone_channels]
            )
            self.joints_late_fusion = REF.fusion.CrossAttentionFusion(
                feat_dim=m.feat_dim, max_tokens=21 * m.num_views,
                custom_query_length=21, num_layers=m.fusion_layers, drop_out=0.1,
            )
            self.joints_decoder = REF.nets.JointsDecoderGCN(in_features=m.feat_dim)

        def forward(self, x, bbox, intrinsics):
            b, v, c, h, w = x.shape
            feats = self.backbone(x.view(-1, c, h, w))
            joint_hms = self.pose_net(feats)
            joint_coords = REF.model_utils.soft_argmax_2d(joint_hms)
            sampled = torch.cat([self.sample_nets[0](feats, joint_coords)], dim=-1)
            if "pos2d" in m.pos_enc:
                sampled = torch.cat([sampled, joint_coords], dim=2)
            if "crop" in m.pos_enc:
                bboxes = bbox.view(-1, 4)
                points = torch.stack(
                    [bboxes[:, 0], bboxes[:, 1], bboxes[:, 0], bboxes[:, 3],
                     bboxes[:, 2], bboxes[:, 1], bboxes[:, 2], bboxes[:, 3],
                     (bboxes[:, 0] + bboxes[:, 2]) / 2, (bboxes[:, 1] + bboxes[:, 3]) / 2],
                    dim=1,
                ).view(bboxes.shape[0], 5, 2).to(torch.float32)
                intr = intrinsics.view(-1, 4).to(torch.float32)
                cc = REF.model_utils.generate_centered_coordinates(
                    points, intr[:, 2].unsqueeze(1), intr[:, 3].unsqueeze(1))
                fov = REF.model_utils.generate_fov_map(
                    cc, intr[:, 0].unsqueeze(1), intr[:, 1].unsqueeze(1))
                expanded = fov.flatten(start_dim=-2).unsqueeze(1).expand(-1, 21, -1)
                sampled = torch.cat((sampled, expanded), dim=2)
            tokens = sampled.view(-1, m.num_views * sampled.shape[1], sampled.shape[2])
            fused = self.joints_late_fusion(tokens, add_pos="sin" in m.pos_enc)
            joints_cam = self.joints_decoder(fused)
            joint_coords = joint_coords.view(-1, m.num_views, 21, 2) * (256 / 32)
            return {
                "joints_crop_img": joint_coords,
                "joints_cam": joints_cam,
                "heatmap": joint_hms.view(-1, m.num_views, 21, 32, 32),
            }

    return TorchHandMvNet().eval()


class TestFullModelParity:
    @pytest.mark.slow
    def test_ho3d_resnet50_paper_full_forward(self, rng):
        cfg = Config.from_yaml("configs/release/HO3D_HandMvNet.yaml")
        tmodel = build_torch_full_model(cfg)

        b, v = 1, cfg.model.num_views
        x = rng.normal(size=(b, v, 3, 256, 256)).astype(np.float32) * 0.5
        bbox = np.stack(
            [np.array([80.0, 60.0, 280.0, 260.0]) + 5 * i for i in range(v)]
        )[None].astype(np.float32)
        intr = np.tile(
            np.array([600.0, 600.0, 320.0, 240.0], dtype=np.float32), (b, v, 1)
        )

        with torch.no_grad():
            oracle = tmodel(
                torch.from_numpy(x), torch.from_numpy(bbox), torch.from_numpy(intr)
            )

        converted = convert_torch_state_dict(tmodel.state_dict())
        model = HandMvNet(cfg=cfg.model, image_size=256, heatmap_size=32)
        x_nhwc = jnp.asarray(np.transpose(x, (0, 1, 3, 4, 2)))
        ours = model.apply(converted, x_nhwc, jnp.asarray(bbox), jnp.asarray(intr))

        # soft-argmax multiplies logits by 1000 before softmax, so ~1e-5
        # heatmap noise (fp32 conv accumulation order) shifts mass between
        # near-tied random-weight peaks: the bulk must match to hundredths of
        # a pixel, rare tied-peak joints may move a fraction of one.
        diff2d = np.abs(
            np.asarray(ours["joints_crop_img"]) - oracle["joints_crop_img"].numpy()
        )
        assert np.percentile(diff2d, 99) < 0.1, np.percentile(diff2d, 99)
        assert diff2d.max() < 1.0, diff2d.max()
        np.testing.assert_allclose(
            np.asarray(ours["heatmap"]), oracle["heatmap"].numpy(), atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(ours["joints_cam"]), oracle["joints_cam"].numpy(), atol=1e-3
        )


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


def build_torch_hrnet_model(cfg: Config):
    """Reference-submodule wiring for the HRNet release variant
    (handmvnet.py:41-57: stride-2 conv head on the 64^2 branch, 4 SampleNets)."""
    m = cfg.model

    class TorchHandMvNetHR(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.backbone = REF.hrnet.HRNet({"PRETRAINED": "", "HRNET_TYPE": m.backbone_type})
            self.pose_net = torch.nn.Conv2d(m.backbone_channels[0], 21,
                                            kernel_size=3, stride=2, padding=1)
            self.sample_nets = torch.nn.ModuleList(
                [REF.nets.SampleNet([c, c // 2]) for c in m.backbone_channels]
            )
            self.joints_late_fusion = REF.fusion.CrossAttentionFusion(
                feat_dim=m.feat_dim, max_tokens=21 * m.num_views,
                custom_query_length=21, num_layers=m.fusion_layers, drop_out=0.1,
            )
            self.joints_decoder = REF.nets.JointsDecoderGCN(in_features=m.feat_dim)

        def forward(self, x):
            b, v, c, h, w = x.shape
            feats = self.backbone(x.view(-1, c, h, w))
            joint_hms = self.pose_net(feats[0])
            joint_coords = REF.model_utils.soft_argmax_2d(joint_hms)
            sampled = torch.cat(
                [net(feats[i], joint_coords) for i, net in enumerate(self.sample_nets)],
                dim=-1,
            )
            if "pos2d" in m.pos_enc:
                sampled = torch.cat([sampled, joint_coords], dim=2)
            tokens = sampled.view(-1, m.num_views * sampled.shape[1], sampled.shape[2])
            fused = self.joints_late_fusion(tokens, add_pos="sin" in m.pos_enc)
            return self.joints_decoder(fused), joint_hms

    return TorchHandMvNetHR().eval()


class TestFullModelParityHRNet:
    @pytest.mark.slow
    def test_ho3d_hrnet_wo_cam_full_forward(self, rng):
        """HR_wo_cam release variant: 4-level HRNet pyramid, cross-scale
        SampleNet sampling (incl. out-of-bounds zero taps on the 16^2/8^2
        maps), no crop-FoV encoding."""
        import dataclasses

        cfg = Config.from_yaml("configs/release/HO3D_HandMvNet_HR_wo_cam.yaml")
        cfg = cfg.replace(model=dataclasses.replace(cfg.model, selected_views=(0, 1)))
        tmodel = build_torch_hrnet_model(cfg)

        b, v = 1, 2
        x = rng.normal(size=(b, v, 3, 256, 256)).astype(np.float32) * 0.5
        with torch.no_grad():
            oracle_joints, oracle_hms = tmodel(torch.from_numpy(x))

        converted = convert_torch_state_dict(tmodel.state_dict())
        model = HandMvNet(cfg=cfg.model, image_size=256, heatmap_size=32)
        x_nhwc = jnp.asarray(np.transpose(x, (0, 1, 3, 4, 2)))
        ours = model.apply(converted, x_nhwc)

        # random-init HRNet magnifies activations to ~1e8, so compare
        # relative to the heatmap scale (fp32 accumulation noise otherwise
        # reads as hundreds in absolute terms)
        hm = np.asarray(ours["heatmap"]).reshape(oracle_hms.shape)
        scale = np.abs(oracle_hms.numpy()).max() + 1e-30
        np.testing.assert_allclose(hm / scale, oracle_hms.numpy() / scale, atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(ours["joints_cam"]), oracle_joints.numpy(), atol=1e-4
        )
