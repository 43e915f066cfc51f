"""HandMvNet: the full multi-view hand pose model as one flax module.

Functionally identical to the reference forward
(src/models/handmvnet.py:158-266):

  x [b, v, 256, 256, 3] (NHWC)
    -> per-view backbone (batched as b*v on the MXU)
    -> pose_net heatmap head -> [b*v, 32, 32, 21]
    -> soft-argmax -> joint coords [b*v, 21, 2] (32^2 pixel units)
    -> per-level SampleNet point features, concat -> [b*v, 21, sum(C)/2]
    -> (+ raw coords, + crop-FoV camera encoding)
    -> tokens [b, v*21, feat_dim] -> CrossAttentionFusion -> [b, 21, feat_dim]
    -> ChebConv GCN decoder -> joints_cam [b, 21, 3] (meters, root-relative)

Differences from the reference are layout only (NHWC, flax); every numeric
quirk is preserved (32^2-space coordinates sampled against all pyramid
levels, soft-argmax temperature 1000, x8 output rescale, PE applied once).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from handmvnet_tpu.config import ModelConfig
from handmvnet_tpu.models.backbones.resnet import ResNetBackbone
from handmvnet_tpu.models.backbones.hrnet import HRNetBackbone
from handmvnet_tpu.models.fusion import (
    CrossAttentionFusion,
    CrossAttentionFusionLearnableQuery,
)
from handmvnet_tpu.models.nets import (
    JointsDecoderGCN,
    JointsDecoderNN,
    SampleNet,
)
from handmvnet_tpu.ops.geometry import box_corner_points, centered_coordinates, fov_angles, joints_crop_to_img
from handmvnet_tpu.ops.heatmap import soft_argmax_2d


class HandMvNet(nn.Module):
    """Config-driven top-level model. Returns the reference's output dict
    plus (optionally) the absolute root joint."""

    cfg: ModelConfig
    image_size: int = 256
    heatmap_size: int = 32
    root_relative: bool = True
    remat: bool = False  # rematerialize backbone blocks (training memory)
    # fusion dropout (reference fusion.py:14 fixes 0.1); a knob so gradient
    # parity tests / BN-calibration passes can train with dropout disabled
    dropout: float = 0.1

    def _backbone_features(self, x: jax.Array, train: bool) -> list[jax.Array]:
        cfg = self.cfg
        if cfg.backbone == "hrnet":
            return HRNetBackbone(width=cfg.backbone_type, remat=self.remat,
                                 branch_grouped=cfg.hrnet_branch_grouped,
                                 name="backbone")(x, train=train)
        if cfg.backbone == "resnet":
            out = ResNetBackbone(
                version=cfg.backbone_type,
                early_return=cfg.backbone_early_return,
                frozen_bn=cfg.freeze_bn,
                remat=self.remat,
                stem_s2d=cfg.resnet_stem_s2d,
                int8_eval=cfg.backbone_int8,
                name="backbone",
            )(x, train=train)
            if isinstance(out, dict):
                # reversed so element 0 is the deepest map (reference :165-177)
                return [v for v in reversed(list(out.values())) if v.ndim == 4]
            return [out]
        raise ValueError(f"unsupported backbone: {cfg.backbone}")

    def _pose_net(self, feat: jax.Array, train: bool) -> jax.Array:
        """Heatmap head; param names mirror the torch pose_net.* keys
        (reference handmvnet.py:51-86). Inlined so conversion is mechanical."""
        from handmvnet_tpu.models.layers import batch_norm, conv

        cfg = self.cfg
        j = cfg.num_joints
        bn_eval = not train
        if cfg.backbone == "hrnet":
            # single stride-2 3x3 conv, 64^2 -> 32^2
            return conv(j, 3, 2, use_bias=True, name="pose_net")(feat)
        if "paper" in cfg.backbone_type:
            h = conv(512, 1, 1, padding=0, use_bias=True, name="pose_net_0")(feat)
            h = batch_norm("pose_net_1", feat.dtype)(h, use_running_average=bn_eval)
            h = nn.relu(h)
            return conv(j, 1, 1, padding=0, use_bias=True, name="pose_net_3")(h)
        # resnet18/34: ConvTranspose 16^2 -> 32^2 upsampling stack
        h = nn.ConvTranspose(
            128, (4, 4), strides=(2, 2), padding=((2, 2), (2, 2)),
            use_bias=True, transpose_kernel=True, name="pose_net_0", dtype=feat.dtype,
        )(feat)
        h = batch_norm("pose_net_1", feat.dtype)(h, use_running_average=bn_eval)
        h = nn.relu(h)
        h = conv(64, 3, 1, use_bias=True, name="pose_net_3")(h)
        h = batch_norm("pose_net_4", feat.dtype)(h, use_running_average=bn_eval)
        h = nn.relu(h)
        return conv(j, 3, 1, use_bias=True, name="pose_net_6")(h)

    def _fuse_decode(self, tokens_b: jax.Array, train: bool) -> jax.Array:
        """Cross-view fusion + joint decoder over the FULL token tensor
        [b, v*j, feat] -> joints_cam [b, j, 3] (compute dtype)."""
        cfg = self.cfg
        j = cfg.num_joints
        feat_dim = tokens_b.shape[-1]
        if cfg.fusion == "cross_attn":
            fused = CrossAttentionFusion(
                feat_dim=feat_dim,
                max_tokens=j * cfg.num_views,
                custom_query_length=j,
                num_layers=cfg.fusion_layers,
                dropout=self.dropout,
                name="joints_late_fusion",
            )(tokens_b, add_pos="sin" in cfg.pos_enc, train=train)
        elif cfg.fusion == "cross_attn_learnable_query":
            fused = CrossAttentionFusionLearnableQuery(
                feat_dim=feat_dim, max_tokens=j * cfg.num_views, dropout=0.0,
                name="joints_late_fusion",
            )(tokens_b, train=train)
        else:
            raise ValueError(f"invalid fusion type: {cfg.fusion}")

        if cfg.use_gcn:
            return JointsDecoderGCN(in_features=feat_dim, name="joints_decoder")(fused)
        return JointsDecoderNN(in_features=feat_dim, name="joints_decoder")(fused)

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        bbox: jax.Array | None = None,
        intrinsics: jax.Array | None = None,
        train: bool = False,
        stage: str = "full",
    ) -> Dict[str, Any] | jax.Array:
        """stage controls which part of the forward runs (for view-parallel
        inference, parallel/view_parallel.py — the per-view trunk and the
        cross-view fusion are separable at the token boundary):

          "full"   — the whole forward (default; the reference's forward).
          "tokens" — per-view trunk only: backbone -> heatmaps -> soft-argmax
                     -> SampleNet tokens (+pos2d/crop encodings). Returns a
                     dict with ``tokens`` [b, v*j, feat] plus the per-view
                     output-dict entries. ``x`` may hold any subset of views.
          "fuse"   — cross-view fusion + decoder only; ``x`` is the full
                     token tensor [b, v*j, feat]. Returns joints_cam
                     [b, j, 3] (compute dtype; the caller promotes).

        Parameter names are identical in every stage (all submodules carry
        explicit names), so one checkpoint serves all three paths.
        """
        cfg = self.cfg
        if stage == "fuse":
            return self._fuse_decode(x, train)
        assert stage in ("full", "tokens"), stage
        b, v = x.shape[0], x.shape[1]
        j = cfg.num_joints
        xv = x.reshape((b * v,) + x.shape[2:])

        mlvl_feats = self._backbone_features(xv, train)
        heatmaps = self._pose_net(mlvl_feats[0], train)  # [b*v, 32, 32, J] NHWC
        hm_jf = jnp.moveaxis(heatmaps, -1, 1)  # [b*v, J, 32, 32]
        # soft-argmax at >= f32: the x1000 softmax overflows bf16, so promote
        # low precisions — but never DOWNCAST (f64 parity runs stay f64).
        # The coords then return to the compute dtype (bf16 stays bf16 on
        # the hot path).
        sa_dtype = jnp.promote_types(hm_jf.dtype, jnp.float32)
        joint_coords = soft_argmax_2d(hm_jf.astype(sa_dtype)).astype(x.dtype)

        sampled = []
        for i, feat in enumerate(mlvl_feats):
            sampled.append(
                SampleNet(out_channels=feat.shape[-1] // 2, name=f"sample_nets_{i}")(
                    feat, joint_coords, train=train
                )
            )
        tokens = jnp.concatenate(sampled, axis=-1)  # [b*v, J, sum(C)/2]

        if "pos2d" in cfg.pos_enc:
            tokens = jnp.concatenate([tokens, joint_coords], axis=-1)

        if "crop" in cfg.pos_enc:
            assert bbox is not None and intrinsics is not None
            enc_dtype = jnp.promote_types(bbox.dtype, jnp.float32)
            boxes = bbox.reshape(b * v, 4).astype(enc_dtype)
            intr = intrinsics.reshape(b * v, 4).astype(enc_dtype)
            pts = box_corner_points(boxes)  # [b*v, 5, 2]
            cc = centered_coordinates(pts, intr[:, 2], intr[:, 3])
            fov = fov_angles(cc, intr[:, 0], intr[:, 1])  # [b*v, 5, 2]
            fov_flat = fov.reshape(b * v, 1, 10).astype(tokens.dtype)
            tokens = jnp.concatenate(
                [tokens, jnp.broadcast_to(fov_flat, (b * v, j, 10))], axis=-1
            )

        feat_dim = tokens.shape[-1]
        tokens_b = tokens.reshape(b, v * j, feat_dim)

        if stage == "tokens":
            scale = float(self.image_size) / float(self.heatmap_size)
            out_dtype = jnp.promote_types(x.dtype, jnp.float32)
            return {
                "tokens": tokens_b,
                "joints_crop_img": (
                    joint_coords.reshape(b, v, j, 2) * scale
                ).astype(out_dtype),
                "heatmap": hm_jf.reshape(
                    b, v, j, self.heatmap_size, self.heatmap_size
                ).astype(out_dtype),
            }

        joints_cam = self._fuse_decode(tokens_b, train)

        out: Dict[str, Any] = {}
        if not self.root_relative:
            assert bbox is not None, (
                "the absolute-root branch needs bboxes for the wrist tokens' "
                "absolute 2D coordinates (reference handmvnet.py:236-249)"
            )
            # Absolute-root branch. The reference defines this capability but
            # its tensor plumbing is shape-inconsistent and unreachable from
            # release configs (src/models/handmvnet.py:236-249); implemented
            # here as specified: per-view wrist token + absolute 2D wrist
            # coords -> 3-layer fusion over V tokens -> MLP -> [b, 1, 3].
            abs_coords = joints_crop_to_img(
                joint_coords.reshape(b * v, j, 2),
                bbox.reshape(b * v, 4).astype(joint_coords.dtype),
                float(self.image_size),
            )
            wrist_tokens = jnp.concatenate([tokens, abs_coords], axis=-1)[:, 0, :]
            wrist_tokens = wrist_tokens.reshape(b, v, feat_dim + 2)
            root_fused = CrossAttentionFusion(
                feat_dim=feat_dim + 2,
                max_tokens=cfg.num_views,
                custom_query_length=1,
                num_layers=3,
                dropout=self.dropout,
                name="root_late_fusion",
            )(wrist_tokens, add_pos="sin" in cfg.pos_enc, train=train)
            out["root_joint"] = JointsDecoderNN(
                in_features=feat_dim + 2, name="root_decoder"
            )(root_fused).astype(jnp.promote_types(x.dtype, jnp.float32))

        scale = float(self.image_size) / float(self.heatmap_size)
        # outputs at >= f32 (bf16 compute still reports f32; f64 stays f64)
        out_dtype = jnp.promote_types(x.dtype, jnp.float32)
        out.update(
            joints_crop_img=(joint_coords.reshape(b, v, j, 2) * scale).astype(out_dtype),
            joints_cam=joints_cam.astype(out_dtype),
            heatmap=hm_jf.reshape(b, v, j, self.heatmap_size, self.heatmap_size).astype(out_dtype),
        )
        return out
