"""HRNet-v2 backbone (w40/w64), NHWC flax.

Topology per reference src/models/backbones/hrnet.py:430-498:
  stem (2x stride-2 3x3 conv+BN+ReLU) ->
  layer1: 4 Bottleneck @64 (out 256ch) ->
  transition1 -> stage2: 1 module, 2 branches, 4 BasicBlocks each ->
  transition2 -> stage3: 4 modules, 3 branches ->
  transition3 -> stage4: 3 modules, 4 branches; SUM fuse everywhere.
Returns the 4 multi-scale maps [B,{w,2w,4w,8w},{64,32,16,8}^2] (NHWC).

Fuse layers: j>i upsample path = 1x1 conv + BN + nearest 2^(j-i) upsample;
j<i downsample path = (i-j) stride-2 3x3 conv+BN (+ReLU except last)
(hrnet.py:164-199). Module names mirror torch paths with .N -> _N.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from handmvnet_tpu.models.layers import batch_norm, conv
from handmvnet_tpu.models.backbones.resnet import BasicBlock, Bottleneck

_WIDTHS = {"w40": (40, 80, 160, 320), "w64": (64, 128, 256, 512)}
# (num_modules, num_branches) for stages 2..4; 4 BasicBlocks per branch
_STAGES = ((1, 2), (4, 3), (3, 4))


def _nearest_upsample(x: jax.Array, factor: int) -> jax.Array:
    b, h, w, c = x.shape
    x = jnp.broadcast_to(
        x[:, :, None, :, None, :], (b, h, factor, w, factor, c)
    )
    return x.reshape(b, h * factor, w * factor, c)


class HRModule(nn.Module):
    """One HighResolutionModule: per-branch residual chains + full fuse."""

    num_branches: int
    channels: Sequence[int]
    num_blocks: int = 4
    remat: bool = False

    @nn.compact
    def __call__(self, xs: list[jax.Array], train: bool = False) -> list[jax.Array]:
        bn_eval = not train
        block_cls = (
            nn.remat(BasicBlock, static_argnums=(2,)) if self.remat else BasicBlock
        )
        outs = []
        for i in range(self.num_branches):
            h = xs[i]
            for b in range(self.num_blocks):
                h = block_cls(
                    planes=self.channels[i], stride=1, has_downsample=False,
                    name=f"branches_{i}_{b}",
                )(h, train)
            outs.append(h)

        fused = []
        for i in range(self.num_branches):
            acc = None
            for j in range(self.num_branches):
                if j == i:
                    y = outs[j]
                elif j > i:
                    y = conv(self.channels[i], 1, 1, padding=0,
                             name=f"fuse_layers_{i}_{j}_0")(outs[j])
                    y = batch_norm(f"fuse_layers_{i}_{j}_1", y.dtype)(
                        y, use_running_average=bn_eval)
                    y = _nearest_upsample(y, 2 ** (j - i))
                else:
                    y = outs[j]
                    for k in range(i - j):
                        last = k == i - j - 1
                        out_ch = self.channels[i] if last else self.channels[j]
                        y = conv(out_ch, 3, 2, name=f"fuse_layers_{i}_{j}_{k}_0")(y)
                        y = batch_norm(f"fuse_layers_{i}_{j}_{k}_1", y.dtype)(
                            y, use_running_average=bn_eval)
                        if not last:
                            y = nn.relu(y)
                acc = y if acc is None else acc + y
            fused.append(nn.relu(acc))
        return fused


class HRNetBackbone(nn.Module):
    """Input [B, 256, 256, 3] -> list of 4 maps (64^2..8^2)."""

    width: str = "w40"
    remat: bool = False  # rematerialize branch blocks in backward

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> list[jax.Array]:
        bn_eval = not train
        widths = _WIDTHS[self.width]

        h = conv(64, 3, 2, name="conv1")(x)
        h = batch_norm("bn1", x.dtype)(h, use_running_average=bn_eval)
        h = nn.relu(h)
        h = conv(64, 3, 2, name="conv2")(h)
        h = batch_norm("bn2", x.dtype)(h, use_running_average=bn_eval)
        h = nn.relu(h)

        # layer1: 4 bottlenecks planes=64 -> 256 channels out
        for b in range(4):
            h = Bottleneck(planes=64, stride=1, has_downsample=(b == 0),
                           name=f"layer1_{b}")(h, train=train)

        # transition1: branch0 3x3 conv 256->w (torch transition1.0.{0,1}),
        # branch1 stride-2 3x3 256->2w (torch transition1.1.0.{0,1})
        xs = []
        for i in range(2):
            stride = 1 if i == 0 else 2
            prefix = f"transition1_{i}" if i == 0 else f"transition1_{i}_0"
            y = conv(widths[i], 3, stride, name=f"{prefix}_0")(h)
            y = batch_norm(f"{prefix}_1", y.dtype)(y, use_running_average=bn_eval)
            xs.append(nn.relu(y))

        num_branches_per_stage = (2, 3, 4)
        for stage_idx, (num_modules, num_branches) in enumerate(_STAGES):
            stage_no = stage_idx + 2
            if stage_idx > 0:
                # transitionN: existing branches pass through (channels equal);
                # the new branch downsamples from the last existing one
                new_i = num_branches - 1
                y = conv(widths[new_i], 3, 2,
                         name=f"transition{stage_no - 1}_{new_i}_0_0")(xs[-1])
                y = batch_norm(f"transition{stage_no - 1}_{new_i}_0_1", y.dtype)(
                    y, use_running_average=bn_eval)
                xs = xs + [nn.relu(y)]
            for m in range(num_modules):
                xs = HRModule(
                    num_branches=num_branches,
                    channels=widths[:num_branches],
                    remat=self.remat,
                    name=f"stage{stage_no}_{m}",
                )(xs, train=train)
        return xs
