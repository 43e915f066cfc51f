"""Loss and metric parity vs torch oracles (the reference's loss/metric files
import cleanly — only torch — so they ARE the oracles here)."""

import sys

import numpy as np
import torch
import jax.numpy as jnp

from handmvnet_tpu import losses as L
from handmvnet_tpu import metrics as M
from handmvnet_tpu.config import LossWeights
from handmvnet_tpu.data.synthetic import synthetic_batch
from handmvnet_tpu.losses import handmvnet_loss

if "/root/reference/src" not in sys.path:
    sys.path.insert(0, "/root/reference/src")
from models.metrics import PoseMetrics  # noqa: E402  (reference oracle)
from models.losses.loss import PoseLoss  # noqa: E402


class TestLossPrimitives:
    def test_mse_l1_smooth_bce(self, rng):
        p = rng.normal(size=(4, 21, 3)).astype(np.float32)
        t = rng.normal(size=(4, 21, 3)).astype(np.float32)
        tp, tt = torch.from_numpy(p), torch.from_numpy(t)
        np.testing.assert_allclose(
            float(L.mse_loss(jnp.asarray(p), jnp.asarray(t), 10.0)),
            float(PoseLoss.mse_loss(tp, tt, weight=10.0)), rtol=1e-5)
        np.testing.assert_allclose(
            float(L.l1_loss(jnp.asarray(p), jnp.asarray(t), 3.0)),
            float(PoseLoss.l1_loss(tp, tt, weight=3.0)), rtol=1e-5)
        np.testing.assert_allclose(
            float(L.smooth_l1_loss(jnp.asarray(p), jnp.asarray(t))),
            float(PoseLoss.smooth_l1_loss(tp, tt)), rtol=1e-5)
        labels01 = (rng.uniform(size=(4, 21)) > 0.5).astype(np.float32)
        logits = rng.normal(size=(4, 21)).astype(np.float32)
        np.testing.assert_allclose(
            float(L.bce_loss(jnp.asarray(logits), jnp.asarray(labels01))),
            float(PoseLoss.bce_loss(torch.from_numpy(logits), torch.from_numpy(labels01))),
            rtol=1e-4)


class TestMetrics:
    def test_mpjpe(self, rng):
        p = rng.normal(size=(4, 21, 3)).astype(np.float32)
        t = rng.normal(size=(4, 21, 3)).astype(np.float32)
        np.testing.assert_allclose(
            float(M.mpjpe(jnp.asarray(p), jnp.asarray(t))),
            float(PoseMetrics.mpjpe(torch.from_numpy(p), torch.from_numpy(t))),
            rtol=1e-5)

    def test_pa_mpjpe(self, rng):
        p = rng.normal(size=(4, 21, 3)).astype(np.float32)
        t = (p + 0.05 * rng.normal(size=p.shape)).astype(np.float32)
        np.testing.assert_allclose(
            float(M.pa_mpjpe(jnp.asarray(p), jnp.asarray(t))),
            float(PoseMetrics.pa_mpjpe(torch.from_numpy(p), torch.from_numpy(t))),
            atol=1e-5)

    def test_pck_auc(self, rng):
        p = rng.normal(size=(8, 21, 3)).astype(np.float32) * 0.01
        t = (p + 0.01 * rng.normal(size=p.shape)).astype(np.float32)
        ours = M.pck_auc(jnp.asarray(p), jnp.asarray(t), 0.0, 0.05, steps=20)
        auc, norm_auc, pck_values, thresholds = PoseMetrics.pck_auc(
            torch.from_numpy(p), torch.from_numpy(t), 0.0, 0.05, steps=20)
        np.testing.assert_allclose(float(ours.auc), auc, rtol=1e-4)
        np.testing.assert_allclose(float(ours.norm_auc), norm_auc, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(ours.pck_values), pck_values, atol=1e-5)
        np.testing.assert_allclose(np.asarray(ours.thresholds), thresholds, atol=1e-6)

    def test_pck_with_reference_len(self, rng):
        p = rng.normal(size=(6, 21, 3)).astype(np.float32) * 0.01
        t = (p + 0.01 * rng.normal(size=p.shape)).astype(np.float32)
        ref_len = np.abs(rng.normal(size=(6,))).astype(np.float32) + 0.5
        ours = float(M.pck(jnp.asarray(p), jnp.asarray(t), 0.02, jnp.asarray(ref_len)))
        oracle = float(PoseMetrics.pck(torch.from_numpy(p), torch.from_numpy(t), 0.02,
                                       torch.from_numpy(ref_len)))
        np.testing.assert_allclose(ours, oracle, rtol=1e-5)


class TestLossAssembly:
    def test_full_assembly_terms(self, rng):
        """Loss assembly replicates the reference weighting/masking
        (handmvnet.py:279-351), including the reprojection terms."""
        batch = synthetic_batch(batch_size=2, num_views=3, seed=9)
        out = {
            "heatmap": jnp.asarray(rng.normal(size=batch["heatmap"].shape).astype(np.float32)),
            "joints_crop_img": jnp.asarray(
                rng.uniform(0, 256, size=batch["joints_crop_img"].shape).astype(np.float32)),
            "joints_cam": jnp.asarray(batch["joints_cam"] / 1000.0 + 0.001),
        }
        labels = dict(batch)
        labels["joints_cam"] = jnp.asarray(batch["joints_cam"]) / 1000.0
        labels["root_joint"] = jnp.asarray(batch["root_joint"]) / 1000.0
        weights = LossWeights(heatmap=10.0, joints_2d=1.0, joints_3d=1000.0, g2d=1.0, p2d=0.5)
        losses = handmvnet_loss(
            out, labels, weights,
            mask_invisible_joints=True, root_relative=True,
            intrinsics=jnp.asarray(batch["intrinsic"]),
            extrinsics=jnp.asarray(batch["extrinsic"]),
            root_idx=0,
        )
        assert set(losses) == {"heatmap_loss", "joints_2d_loss", "joints_3d_loss",
                               "g2d_loss", "p2d_loss", "loss"}
        # check individual terms against manual computation
        np.testing.assert_allclose(
            float(losses["heatmap_loss"]),
            10.0 * np.mean((np.asarray(out["heatmap"]) - batch["heatmap"]) ** 2),
            rtol=1e-4)
        mask = ~batch["joints_img_mask"][..., None]
        np.testing.assert_allclose(
            float(losses["joints_2d_loss"]),
            np.mean(np.abs(np.asarray(out["joints_crop_img"]) * mask
                           - batch["joints_crop_img"] * mask)),
            rtol=1e-4)
        np.testing.assert_allclose(
            float(losses["joints_3d_loss"]),
            1000.0 * np.mean(np.abs(np.asarray(out["joints_cam"])
                                    - batch["joints_cam"] / 1000.0)),
            rtol=1e-4)
        total = sum(float(v) for k, v in losses.items() if k != "loss")
        np.testing.assert_allclose(float(losses["loss"]), total, rtol=1e-5)

    def test_wo_cam_variant_drops_reprojection(self, rng):
        batch = synthetic_batch(batch_size=1, num_views=2, seed=10)
        out = {
            "heatmap": jnp.asarray(batch["heatmap"]),
            "joints_crop_img": jnp.asarray(batch["joints_crop_img"]),
            "joints_cam": jnp.asarray(batch["joints_cam"]) / 1000.0,
        }
        labels = dict(batch)
        labels["joints_cam"] = jnp.asarray(batch["joints_cam"]) / 1000.0
        labels["root_joint"] = jnp.asarray(batch["root_joint"]) / 1000.0
        weights = LossWeights(g2d=None, p2d=None)
        losses = handmvnet_loss(out, labels, weights)
        assert "g2d_loss" not in losses
        assert float(losses["heatmap_loss"]) == 0.0


class TestStackedDim:
    def test_stacked_labels_broadcast(self, rng):
        """stacked_dim parity: per-stack supervision against one label set
        (reference loss.py:7-9)."""
        labels = rng.normal(size=(2, 21, 32, 32)).astype(np.float32)
        preds = rng.normal(size=(2, 4, 21, 32, 32)).astype(np.float32)
        ours = float(L.mse_loss(jnp.asarray(preds), jnp.asarray(labels), 2.0, stacked_dim=1))
        oracle = float(PoseLoss.mse_loss(torch.from_numpy(preds), torch.from_numpy(labels),
                                         stacked_dim=1, weight=2.0))
        np.testing.assert_allclose(ours, oracle, rtol=1e-4)  # fp32 mean over 5.4M elems


class TestDeviceMetricAverager:
    def test_matches_host_averager(self, rng):
        """Device-side accumulation (one sync per epoch) must agree with the
        host float()-per-step averager it replaced in the train loop."""
        import jax.numpy as jnp

        from handmvnet_tpu.engine import DeviceMetricAverager, MetricAverager

        host, dev = MetricAverager(), DeviceMetricAverager()
        for _ in range(5):
            step = {
                "loss": rng.uniform(0, 100),
                "pck": rng.uniform(size=7),  # curve-valued metric
            }
            host.update(step)
            dev.update({k: jnp.asarray(v) for k, v in step.items()})
        a, b = host.result(), dev.result()
        assert set(a) == set(b)
        assert abs(a["loss"] - b["loss"]) < 1e-4
        np.testing.assert_allclose(a["pck"], b["pck"], rtol=1e-5)
        assert isinstance(b["loss"], float) and isinstance(b["pck"], list)

    def test_empty(self):
        from handmvnet_tpu.engine import DeviceMetricAverager

        assert DeviceMetricAverager().result() == {}

    def test_sample_count_weighting(self, rng):
        """Uneven batch sizes must produce the sample-weighted epoch mean,
        not the equal-weight batch mean (evaluate() passes batch sizes)."""
        import jax.numpy as jnp

        from handmvnet_tpu.engine import DeviceMetricAverager, MetricAverager

        vals, weights = [10.0, 20.0, 50.0], [16.0, 16.0, 4.0]
        expected = sum(v * w for v, w in zip(vals, weights)) / sum(weights)
        host, dev = MetricAverager(), DeviceMetricAverager()
        for v, w in zip(vals, weights):
            host.update({"m": v}, weight=w)
            dev.update({"m": jnp.asarray(v)}, weight=w)
        assert abs(host.result()["m"] - expected) < 1e-9
        assert abs(dev.result()["m"] - expected) < 1e-4
