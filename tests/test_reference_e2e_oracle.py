"""End-to-end parity against the reference's OWN HandMvNet Lightning class.

Previous parity tests hand-wired reference *submodules* into a transcription
of HandMvNet.forward (test_parity_model.py) — a transcription error would
pass on both sides. Here the oracle is the reference's actual class
(/root/reference/src/models/handmvnet.py, imported with lightning stubbed —
see reference_oracle.import_reference_handmvnet):

  (a) forward output-dict parity      (reference handmvnet.py:158-266)
  (b) _calculate_loss term-by-term    (reference handmvnet.py:279-351)
  (c) _calculate_mpjpe assembly       (reference handmvnet.py:353-423)

so every release-path number is checked against code the builder never wrote.
"""

import copy

import numpy as np
import pytest
import torch
import yaml
import jax.numpy as jnp

from handmvnet_tpu.checkpoint import convert_torch_state_dict
from handmvnet_tpu.config import Config, LossWeights
from handmvnet_tpu.engine import pose_metrics_device
from handmvnet_tpu.losses import handmvnet_loss
from handmvnet_tpu.models import HandMvNet

from reference_oracle import import_reference_handmvnet

RefHandMvNet = import_reference_handmvnet()


def ref_cfg_from_yaml(path: str) -> dict:
    """Load a (schema-compatible) release YAML the way the reference config
    singleton does (reference src/config.py:44-50), minus I/O side effects."""
    with open(path) as f:
        cfg = yaml.safe_load(f)
    cfg["model"]["num_views"] = len(cfg["model"]["selected_views"])
    cfg["data"]["selected_views"] = cfg["model"]["selected_views"]
    cfg["data"]["num_views"] = cfg["model"]["num_views"]
    cfg["data"]["mask_invisible_joints"] = cfg["train"]["mask_invisible_joints"]
    # no egress: never touch model-zoo / ImageNet weights
    cfg["model"]["backbone_pretrained"] = False
    cfg["model"]["backbone_pretrained_path"] = "/nonexistent"
    cfg["train"]["device"] = "cpu"
    return cfg


def build_reference_model(ref_cfg: dict) -> torch.nn.Module:
    model = RefHandMvNet(ref_cfg["train"], ref_cfg["model"], ref_cfg["data"])
    return model.eval()


def make_cam_params(rng, b, v):
    """Valid rigid extrinsics (camera-to-world 4x4) + pinhole intrinsics."""
    intr = np.tile(np.array([600.0, 600.0, 320.0, 240.0], dtype=np.float32), (b, v, 1))
    intr += rng.uniform(-5, 5, size=intr.shape).astype(np.float32)
    extr = np.zeros((b, v, 4, 4), dtype=np.float32)
    for bi in range(b):
        for vi in range(v):
            q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
            if np.linalg.det(q) < 0:
                q[:, 0] *= -1
            extr[bi, vi, :3, :3] = q
            extr[bi, vi, :3, 3] = rng.normal(size=3) * 0.2
            extr[bi, vi, 3, 3] = 1.0
    return intr, extr


class TestReferenceForwardOracle:
    @pytest.mark.slow
    def test_resnet50_paper_with_cam_forward(self, rng):
        """HO3D flagship (resnet50_paper, pos_enc incl. crop-FoV) vs the
        reference class's own forward."""
        ref_cfg = ref_cfg_from_yaml("configs/release/HO3D_HandMvNet.yaml")
        tmodel = build_reference_model(ref_cfg)

        b, v = 1, ref_cfg["model"]["num_views"]
        x = rng.normal(size=(b, v, 3, 256, 256)).astype(np.float32) * 0.5
        bbox = np.stack(
            [np.array([80.0, 60.0, 280.0, 260.0]) + 5 * i for i in range(v)]
        )[None].astype(np.float32)
        intr, extr = make_cam_params(rng, b, v)

        with torch.no_grad():
            oracle = tmodel(
                torch.from_numpy(x),
                torch.from_numpy(bbox),
                {"intrinsic": torch.from_numpy(intr),
                 "extrinsic": torch.from_numpy(extr)},
            )

        cfg = Config.from_yaml("configs/release/HO3D_HandMvNet.yaml")
        converted = convert_torch_state_dict(tmodel.state_dict())
        model = HandMvNet(cfg=cfg.model, image_size=256, heatmap_size=32)
        x_nhwc = jnp.asarray(np.transpose(x, (0, 1, 3, 4, 2)))
        ours = model.apply(converted, x_nhwc, jnp.asarray(bbox), jnp.asarray(intr))

        assert set(ours.keys()) == set(oracle.keys())
        # soft-argmax's x1000 temperature amplifies fp32 conv-accumulation
        # noise at near-tied random-weight peaks (see test_parity_model.py)
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

    @pytest.mark.slow
    def test_hrnet_wo_cam_forward(self, rng):
        """HRNet w40 wo_cam variant (stride-2 conv head, 4-level cross-scale
        sampling) vs the reference class, reduced to 2 views for runtime."""
        import dataclasses

        ref_cfg = ref_cfg_from_yaml("configs/release/HO3D_HandMvNet_HR_wo_cam.yaml")
        ref_cfg["model"]["selected_views"] = [0, 1]
        ref_cfg["model"]["num_views"] = 2
        tmodel = build_reference_model(ref_cfg)

        b, v = 1, 2
        x = rng.normal(size=(b, v, 3, 256, 256)).astype(np.float32) * 0.5
        with torch.no_grad():
            oracle = tmodel(torch.from_numpy(x))

        cfg = Config.from_yaml("configs/release/HO3D_HandMvNet_HR_wo_cam.yaml")
        cfg = cfg.replace(model=dataclasses.replace(cfg.model, selected_views=(0, 1)))
        converted = convert_torch_state_dict(tmodel.state_dict())
        model = HandMvNet(cfg=cfg.model, image_size=256, heatmap_size=32)
        x_nhwc = jnp.asarray(np.transpose(x, (0, 1, 3, 4, 2)))
        ours = model.apply(converted, x_nhwc)

        # random-init HRNet magnifies activations ~1e8 -> compare relative
        hm = np.asarray(ours["heatmap"])
        o_hm = oracle["heatmap"].numpy().reshape(hm.shape)
        scale = np.abs(o_hm).max() + 1e-30
        np.testing.assert_allclose(hm / scale, o_hm / scale, atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(ours["joints_cam"]), oracle["joints_cam"].numpy(), atol=1e-4
        )
        o_2d = oracle["joints_crop_img"].numpy()
        diff2d = np.abs(np.asarray(ours["joints_crop_img"]) - o_2d)
        assert np.percentile(diff2d, 99) < 0.1, np.percentile(diff2d, 99)


def random_out_and_inputs(rng, b, v, with_mask=True):
    """Synthetic forward-output + label dicts shaped like the release path
    (all 3D quantities in meters, as _calculate_loss expects after
    training_step's mm->m division, reference handmvnet.py:452-453)."""
    out = {
        "joints_crop_img": rng.uniform(0, 256, size=(b, v, 21, 2)).astype(np.float32),
        "joints_cam": (rng.normal(size=(b, 21, 3)) * 0.05).astype(np.float32),
        "heatmap": rng.normal(size=(b, v, 21, 32, 32)).astype(np.float32),
    }
    bboxes = np.stack(
        [np.array([80.0, 60.0, 280.0, 260.0]) + 7 * i for i in range(v)]
    )[None].repeat(b, axis=0).astype(np.float32)
    inputs = {
        "joints_crop_img": rng.uniform(0, 256, size=(b, v, 21, 2)).astype(np.float32),
        "joints_cam": (rng.normal(size=(b, 21, 3)) * 0.05).astype(np.float32),
        "heatmap": rng.normal(size=(b, v, 21, 32, 32)).astype(np.float32),
        "root_joint": (rng.normal(size=(b, 1, 3)) * 0.1 + np.array([0, 0, 0.6])).astype(np.float32),
        "root_idx": np.zeros((b,), dtype=np.int64),
        "bboxes": bboxes,
    }
    if with_mask:
        inputs["joints_img_mask"] = rng.uniform(size=(b, v, 21)) > 0.7
    return out, inputs


def to_torch(d):
    return {
        k: torch.from_numpy(v) if isinstance(v, np.ndarray) else v for k, v in d.items()
    }


def to_jax(d):
    return {k: jnp.asarray(v) for k, v in d.items()}


class TestReferenceLossOracle:
    def _run(self, rng, mask_invisible, with_mask=True):
        ref_cfg = ref_cfg_from_yaml("configs/release/HO3D_HandMvNet.yaml")
        ref_cfg["train"]["mask_invisible_joints"] = mask_invisible
        tmodel = build_reference_model(ref_cfg)

        b, v = 2, ref_cfg["model"]["num_views"]
        out, inputs = random_out_and_inputs(rng, b, v, with_mask=with_mask)
        intr, extr = make_cam_params(rng, b, v)
        cam_params = {"intrinsic": torch.from_numpy(intr),
                      "extrinsic": torch.from_numpy(extr)}

        with torch.no_grad():
            total = tmodel._calculate_loss(
                to_torch(copy.deepcopy(out)), to_torch(inputs), cam_params, mode="train"
            )
        oracle_terms = {
            k.split("/")[-1]: float(vv)
            for k, vv in tmodel._stub_logged.items()
        }

        w = ref_cfg["train"]["loss_weights"]
        ours = handmvnet_loss(
            to_jax(out),
            to_jax(inputs),
            LossWeights(heatmap=w["heatmap"], joints_2d=w["joints_2d"],
                        joints_3d=w["joints_3d"], g2d=w.get("g2d"), p2d=w.get("p2d")),
            mask_invisible_joints=mask_invisible,
            root_relative=True,
            intrinsics=jnp.asarray(intr),
            extrinsics=jnp.asarray(extr),
            root_idx=0,
            image_size=256.0,
        )
        for term in ("heatmap_loss", "joints_2d_loss", "joints_3d_loss",
                     "g2d_loss", "p2d_loss"):
            np.testing.assert_allclose(
                float(ours[term]), oracle_terms[term], rtol=2e-4, err_msg=term
            )
        np.testing.assert_allclose(float(ours["loss"]), float(total), rtol=2e-4)

    def test_loss_assembly_masked(self, rng):
        self._run(rng, mask_invisible=True)

    def test_loss_assembly_unmasked(self, rng):
        self._run(rng, mask_invisible=False)

    def test_loss_assembly_no_mask_key(self, rng):
        self._run(rng, mask_invisible=True, with_mask=False)


class TestReferenceMetricsOracle:
    def test_metric_assembly(self, rng):
        ref_cfg = ref_cfg_from_yaml("configs/release/HO3D_HandMvNet.yaml")
        tmodel = build_reference_model(ref_cfg)

        b, v = 3, ref_cfg["model"]["num_views"]
        out, inputs = random_out_and_inputs(rng, b, v)
        # metrics compare plausibly-near predictions (PCK needs signal)
        inputs["joints_cam"] = (
            out["joints_cam"] + rng.normal(size=(b, 21, 3)) * 0.01
        ).astype(np.float32)

        with torch.no_grad():
            oracle = tmodel._calculate_mpjpe(
                to_torch(copy.deepcopy(out)), to_torch(inputs), mode="val"
            )

        ours = pose_metrics_device(
            to_jax(out), to_jax(inputs),
            auc_thresholds=(0.0, 0.05),  # ho3d (reference handmvnet.py:120-121)
            mask_invisible=True, root_relative=True,
        )
        for ref_key, our_key in [
            ("val_mpjpe2d", "mpjpe2d"), ("val_mpjpe", "mpjpe"),
            ("val_pa_mpjpe", "pa_mpjpe"), ("val_auc_j", "auc_j"),
            ("val_norm_auc_j", "norm_auc_j"),
        ]:
            np.testing.assert_allclose(
                float(ours[our_key]), float(oracle[ref_key]), rtol=1e-4,
                err_msg=ref_key,
            )
        np.testing.assert_allclose(
            np.asarray(ours["pck_j"]), np.asarray(oracle["val_pck_j"]), atol=1e-5
        )
