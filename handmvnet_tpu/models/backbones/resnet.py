"""ResNet backbones (NHWC, flax) with the reference's three variants.

Capability parity with reference src/models/backbones/resnet.py:
  * standard torchvision topology with ``early_return`` in [0..4] returning a
    dict of intermediate maps (resnet.py:216-254),
  * "paper" variant: layer3 stride 1, no layer4 — a single stride-8 map
    ([B,32,32,1024] from 256^2 input; resnet.py:176-177,238-239),
  * frozen BatchNorm option (resnet.py:31-74) = BN pinned to eval mode.

Module names mirror torch paths with ``.N`` -> ``_N`` so the checkpoint
converter can ingest torchvision ImageNet weights directly.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax import lax

from handmvnet_tpu.models.layers import batch_norm, conv, max_pool_3x3_s2
from handmvnet_tpu.ops.quant import conv_q8


# How the 2x2 space-to-depth input is produced (all EXACT, same conv1
# param; A/B'd on chip — STEM_S2D_FUSE_PROBE.json):
#   "transpose":     6-D reshape/transpose (round 4's shipping path; XLA
#                    materializes it as copy kernels — TRACE_ANALYSIS_S2D
#                    .json: ~90 us/frame of sub-lane relayout copies)
#   "rowsplit":      H-phase row slices (row-granular, no lane shuffle) +
#                    free trailing reshapes + channel concat that XLA can
#                    fuse into the conv's input read
#   "identity_conv": the shuffle as a [2,2,3,12] one-hot conv so it lands
#                    on conv hardware instead of standalone copy kernels
#   "pallas":        ops/pallas/stem.stem_s2d_fused — im2col in VMEM, one
#                    MXU matmul; the shuffled layout never touches HBM
# Module-level so measurement probes can patch it per shape.
#
# MEASURED (round 5, STEM_S2D_FUSE_PROBE.json): rowsplit 1.001x and
# identity_conv 0.99x vs transpose end-to-end — the trace's ~6% copy
# overhead is not harvestable at the XLA level; and the pallas kernel
# crashes this Mosaic toolchain's compiler subprocess (minimal repro: any
# non-lane-aligned trailing-dim split, [128,768]->[128,128,6]). Kept as
# exactness-tested mechanisms (tests/test_stem_modes.py); production stays
# "transpose".
STEM_S2D_MODE = "transpose"

# one-hot [2,2,3,12] space-to-depth kernel (channel order r*6+s*3+c), host
# numpy: closure constants must never be device arrays (CLAUDE.md D2H rule)
_S2D_EYE = np.zeros((2, 2, 3, 12), np.float32)
for _r in range(2):
    for _s in range(2):
        for _c in range(3):
            _S2D_EYE[_r, _s, _c, _r * 6 + _s * 3 + _c] = 1.0


class SpaceToDepthStem(nn.Module):
    """The 7x7/stride-2 stem conv, computed as an exact 4x4/stride-1 conv
    over a 2x2 space-to-depth input (3 -> 12 channels).

    The plain stem is the worst kernel on a TPU: 3 input channels fill
    3/128 MXU lanes, and the flagship trace measured it at 347 us/frame =
    22% of the whole 8-view forward at ~9 TFLOP/s (TRACE_ANALYSIS.json,
    fusion.1992). The rewrite is the standard TPU conv0 transform: each
    output tap n = 2p+u-3 of the stride-2 7x7 conv is reindexed as
    n = 2(p+a-2)+r with phase r in {0,1}, turning it into a stride-1 4x4
    conv over the half-res grid with 12 = 2*2*3 phase-expanded channels —
    identical arithmetic (same products, same zero padding), 4x the lane
    fill. Weights stay stored as the torch-layout [7,7,3,F] kernel under
    the same ``conv1/kernel`` path, so checkpoints are unaffected; the
    reindexing folds into a trace-time constant. STEM_S2D_MODE selects how
    the shuffled input is produced (see above).
    """

    features: int = 64

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (7, 7, 3, self.features),
            jnp.float32,
        )
        kernel = kernel.astype(x.dtype)
        n, h, w, c = x.shape
        if h % 2 or w % 2:  # odd spatial: fall back to the plain conv
            return lax.conv_general_dilated(
                x, kernel, window_strides=(2, 2),
                padding=((3, 3), (3, 3)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        if STEM_S2D_MODE == "pallas" and (h // 2) % 16 == 0:
            from handmvnet_tpu.ops.pallas.stem import stem_s2d_fused

            return stem_s2d_fused(x, kernel)
        # weights: pad the tap axis 7 -> 8 (u' = u+1; u'=0 is the zero tap),
        # then split u' = 2a+r, v' = 2b+s and merge (r, s, c) into channels
        f = self.features
        w2 = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))
        w2 = w2.reshape(4, 2, 4, 2, 3, f).transpose(0, 2, 1, 3, 4, 5)
        w2 = w2.reshape(4, 4, 12, f)
        # input: 2x2 space-to-depth with matching (r, s, c) channel order
        if STEM_S2D_MODE == "rowsplit":
            # row-granular H-phase slices + free trailing-dim merges; the
            # channel concat is fusable into the conv's input read
            xe = x[:, 0::2].reshape(n, h // 2, w // 2, 2 * c)
            xo = x[:, 1::2].reshape(n, h // 2, w // 2, 2 * c)
            y = jnp.concatenate([xe, xo], axis=-1)
        elif STEM_S2D_MODE == "identity_conv":
            y = lax.conv_general_dilated(
                x, jnp.asarray(_S2D_EYE, x.dtype), window_strides=(2, 2),
                padding="VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        else:  # "transpose"
            y = x.reshape(n, h // 2, 2, w // 2, 2, c)
            y = y.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // 2, w // 2, 4 * c)
        return lax.conv_general_dilated(
            y, w2, window_strides=(1, 1),
            padding=((2, 1), (2, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    has_downsample: bool = False
    frozen_bn: bool = False
    int8: bool = False  # serving-time PTQ convs (ops/quant.py); eval only

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        bn_eval = (not train) or self.frozen_bn
        mk = conv_q8 if (self.int8 and not train) else conv
        out = mk(self.planes, 3, self.stride, name="conv1")(x)
        out = batch_norm("bn1", x.dtype)(out, use_running_average=bn_eval)
        out = nn.relu(out)
        out = mk(self.planes, 3, 1, name="conv2")(out)
        out = batch_norm("bn2", x.dtype)(out, use_running_average=bn_eval)
        if self.has_downsample:
            residual = mk(self.planes, 1, self.stride, padding=0, name="downsample_0")(x)
            residual = batch_norm("downsample_1", x.dtype)(residual, use_running_average=bn_eval)
        else:
            residual = x
        return nn.relu(out + residual)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    has_downsample: bool = False
    frozen_bn: bool = False
    int8: bool = False  # serving-time PTQ convs (ops/quant.py); eval only
    expansion: int = 4

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        bn_eval = (not train) or self.frozen_bn
        mk = conv_q8 if (self.int8 and not train) else conv
        out = mk(self.planes, 1, 1, padding=0, name="conv1")(x)
        out = batch_norm("bn1", x.dtype)(out, use_running_average=bn_eval)
        out = nn.relu(out)
        out = mk(self.planes, 3, self.stride, name="conv2")(out)
        out = batch_norm("bn2", x.dtype)(out, use_running_average=bn_eval)
        out = nn.relu(out)
        out = mk(self.planes * self.expansion, 1, 1, padding=0, name="conv3")(out)
        out = batch_norm("bn3", x.dtype)(out, use_running_average=bn_eval)
        if self.has_downsample:
            residual = mk(
                self.planes * self.expansion, 1, self.stride, padding=0, name="downsample_0"
            )(x)
            residual = batch_norm("downsample_1", x.dtype)(residual, use_running_average=bn_eval)
        else:
            residual = x
        return nn.relu(out + residual)


# stem-image-batch row counts where the s2d rewrite measured FASTER than
# the plain 7x7/s2 lowering (paired on-chip A/Bs, STEM_S2D_PROBE.json):
# 8 rows (b1 x v8 flagship) wins 1.10-1.12x; 4/32/64 rows lose ~10%.
STEM_S2D_ROWS = (8,)

_LAYOUTS = {
    "18": ("basic", (2, 2, 2, 2)),
    "34": ("basic", (3, 4, 6, 3)),
    "50": ("bottleneck", (3, 4, 6, 3)),
    "50_paper": ("bottleneck", (3, 4, 6, 3)),
    "101": ("bottleneck", (3, 4, 23, 3)),
    "152": ("bottleneck", (3, 8, 36, 3)),
}


class ResNetBackbone(nn.Module):
    """Input [B, H, W, 3] -> dict of feature maps, or a single map for the
    "paper" variant (layer3 output)."""

    version: str = "50_paper"
    early_return: int = 3
    frozen_bn: bool = False
    remat: bool = False  # rematerialize blocks in backward (trades FLOPs for HBM)
    stem_s2d: bool = True  # exact space-to-depth rewrite of the 7x7/s2 stem
    # serving-time int8 PTQ of the block convs (ops/quant.py; the stem stays
    # bf16 — 3/12 input channels underfill even the int8 tile). Opt-in via
    # model.backbone_int8; NOT exact math — see INT8_PROBE.json for the
    # measured speed/accuracy disposition. Eval only: train always runs the
    # plain convs.
    int8_eval: bool = False

    @property
    def variant(self) -> str:
        return "paper" if "paper" in self.version else "default"

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> Any:
        block_kind, stage_sizes = _LAYOUTS[self.version]
        block_cls = BasicBlock if block_kind == "basic" else Bottleneck
        if self.remat:
            # the paper-variant backbone holds ~50 x [B*V,32,32,256+] saved
            # activations for backward — far beyond one v5e's HBM at the
            # reference's batch 16 x 5 views; per-block remat keeps only
            # block boundaries and recomputes inside
            block_cls = nn.remat(block_cls, static_argnums=(2,))
        expansion = 1 if block_kind == "basic" else 4
        bn_eval = (not train) or self.frozen_bn

        # The s2d rewrite is exact at any shape but only FASTER at the
        # 8-image stem batch (the b=1 v=8 flagship serving protocol):
        # paired on-chip A/Bs measured 1.10-1.12x there and ~0.87-0.90x at
        # 4/32/64 images (STEM_S2D_PROBE.json) — XLA's plain-conv lowering
        # wins back at other row counts. The gate is static (shapes are
        # trace-time constants), and both paths share the identical
        # conv1/kernel [7,7,3,64] param. STEM_S2D_ROWS is module-level so
        # measurement probes can patch it to force either path per shape.
        # Eval-only: every probe was eval-time, and gating on (not train)
        # means training computes the stem through ONE lowering at every
        # microbatch shape — no float-reassociation noise sneaking into a
        # training run whose microbatch happens to hit 8 stem rows.
        if self.stem_s2d and not train and x.shape[0] in STEM_S2D_ROWS:
            h = SpaceToDepthStem(features=64, name="conv1")(x)
        else:
            h = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                        use_bias=False, name="conv1", dtype=x.dtype)(x)
        h = batch_norm("bn1", x.dtype)(h, use_running_average=bn_eval)
        h = nn.relu(h)
        h = max_pool_3x3_s2(h)

        features: Dict[str, jax.Array] = {}
        inplanes = 64
        stage_planes = (64, 128, 256, 512)
        num_stages = 3 if self.variant == "paper" else 4
        for stage in range(num_stages):
            planes = stage_planes[stage]
            stride = 1 if stage == 0 else 2
            if self.variant == "paper" and stage == 2:
                stride = 1  # layer3 keeps stride 1 (resnet.py:176-177)
            for bidx in range(stage_sizes[stage]):
                s = stride if bidx == 0 else 1
                needs_ds = bidx == 0 and (s != 1 or inplanes != planes * expansion)
                h = block_cls(
                    planes=planes,
                    stride=s,
                    has_downsample=needs_ds,
                    frozen_bn=self.frozen_bn,
                    int8=self.int8_eval,
                    name=f"layer{stage + 1}_{bidx}",
                )(h, train)  # train positional: remat static_argnums counts (self, x, train)
                inplanes = planes * expansion
            features[f"res_layer{stage + 1}"] = h
            if stage == 3:
                # reference computes the pooled vector before the early-return
                # check (resnet.py:244-249)
                features["res_layer4_mean"] = h.mean(axis=(1, 2))
            if self.early_return == stage + 1 and self.variant != "paper":
                return features

        if self.variant == "paper":
            return h  # single [B, H/8, W/8, 1024] map
        return features
