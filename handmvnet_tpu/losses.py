"""Loss functions and the HandMvNet training loss assembly.

reference: src/models/losses/loss.py (primitives) and
src/models/handmvnet.py:279-351 (assembly). All means are over every element
(torch reduction='mean' semantics), and invisible joints are *zeroed on both
sides* before the 2D L1 — matching the reference's mask_joints trick, which
keeps masked terms in the denominator.
"""

from __future__ import annotations

from typing import Dict, Mapping

import jax
import jax.numpy as jnp

from handmvnet_tpu.config import LossWeights
from handmvnet_tpu.ops.camera import reproject_to_views
from handmvnet_tpu.ops.geometry import joints_img_to_crop, mask_joints


def _broadcast_stacked(preds: jax.Array, labels: jax.Array, stacked_dim: int | None):
    """Optional label broadcast over a stacked prediction axis (the
    reference's stacked_dim kwarg, loss.py:7-9: e.g. per-hourglass-stack
    heatmap supervision)."""
    if stacked_dim is not None:
        labels = jnp.broadcast_to(jnp.expand_dims(labels, stacked_dim), preds.shape)
    return labels


def mse_loss(preds: jax.Array, labels: jax.Array, weight: float = 1.0,
             stacked_dim: int | None = None) -> jax.Array:
    labels = _broadcast_stacked(preds, labels, stacked_dim)
    return jnp.mean((preds - labels) ** 2) * weight


def l1_loss(preds: jax.Array, labels: jax.Array, weight: float = 1.0,
            stacked_dim: int | None = None) -> jax.Array:
    labels = _broadcast_stacked(preds, labels, stacked_dim)
    return jnp.mean(jnp.abs(preds - labels)) * weight


def smooth_l1_loss(preds: jax.Array, labels: jax.Array, weight: float = 1.0,
                   beta: float = 1.0, stacked_dim: int | None = None) -> jax.Array:
    labels = _broadcast_stacked(preds, labels, stacked_dim)
    diff = jnp.abs(preds - labels)
    loss = jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)
    return jnp.mean(loss) * weight


def bce_loss(logits: jax.Array, labels: jax.Array, weight: float = 1.0,
             stacked_dim: int | None = None) -> jax.Array:
    """sigmoid + BCE like the reference's PoseLoss.bce_loss (loss.py:26-32)."""
    labels = _broadcast_stacked(logits, labels, stacked_dim)
    p = jax.nn.log_sigmoid(logits)
    not_p = jax.nn.log_sigmoid(-logits)
    return -jnp.mean(labels * p + (1.0 - labels) * not_p) * weight


def handmvnet_loss(
    out: Mapping[str, jax.Array],
    inputs: Mapping[str, jax.Array],
    weights: LossWeights,
    *,
    mask_invisible_joints: bool = True,
    root_relative: bool = True,
    intrinsics: jax.Array | None = None,
    extrinsics: jax.Array | None = None,
    root_idx: int = 0,
    image_size: float = 256.0,
) -> Dict[str, jax.Array]:
    """Total training loss. `inputs` carries labels with 3D quantities already
    in meters (the caller divides mm labels by 1000; reference
    handmvnet.py:452-453). Returns a dict with each term + "loss"."""
    losses: Dict[str, jax.Array] = {}

    losses["heatmap_loss"] = mse_loss(out["heatmap"], inputs["heatmap"], weights.heatmap)

    pred2d, gt2d = out["joints_crop_img"], inputs["joints_crop_img"]
    if "joints_img_mask" in inputs and mask_invisible_joints:
        m = inputs["joints_img_mask"]
        pred2d = mask_joints(pred2d, m)
        gt2d = mask_joints(gt2d, m)
    losses["joints_2d_loss"] = l1_loss(pred2d, gt2d, weights.joints_2d)

    losses["joints_3d_loss"] = l1_loss(out["joints_cam"], inputs["joints_cam"], weights.joints_3d)

    if not root_relative:
        losses["root_3d_loss"] = l1_loss(out["root_joint"], inputs["root_joint"], weights.joints_3d)

    if weights.g2d is not None:
        # fail loudly like the reference (KeyError on loss_weights['p2d'],
        # missing cam params): a silent 0-weight term would log a spurious
        # p2d_loss=0 while the user believes the consistency term is active
        assert weights.p2d is not None, (
            "loss_weights.g2d is set but p2d is missing (reference "
            "handmvnet.py:323-343 requires both)"
        )
        assert intrinsics is not None and extrinsics is not None, (
            "g2d/p2d reprojection losses require camera intrinsics+extrinsics"
        )
        # reproject predicted 3D (+root) into each view's crop space
        root = inputs["root_joint"] if root_relative else out["root_joint"]
        projected = reproject_to_views(
            out["joints_cam"] + root, root_idx, intrinsics, extrinsics
        )  # [B, V, 21, 2]
        b, v = projected.shape[:2]
        boxes = inputs["bboxes"].reshape(b * v, 4)
        proj_crop = joints_img_to_crop(
            projected.reshape(b * v, -1, 2), boxes, image_size
        ).reshape(b, v, -1, 2)
        losses["g2d_loss"] = l1_loss(proj_crop, inputs["joints_crop_img"], weights.g2d)
        losses["p2d_loss"] = l1_loss(proj_crop, out["joints_crop_img"], weights.p2d)

    losses["loss"] = sum(losses.values())
    return losses
