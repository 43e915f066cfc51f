"""Stacked hourglass backbones (dormant in release configs but part of the
reference capability surface; reference: src/models/backbones/hourglass.py).

``StackedHourglass`` returns [early features, per-stack heatmaps, final
feature]; ``StackedBisectedHourglass`` adds a parallel mask stream. Both are
selectable the same way the reference defines them (not reachable from the
release configs, which assert backbone in {hrnet, resnet};
reference handmvnet.py:40).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from handmvnet_tpu.models.layers import batch_norm, conv


class ConvBlock(nn.Module):
    """Conv(+bias) -> optional BN -> optional ReLU (reference layers.py:7-26)."""

    features: int
    kernel: int = 3
    stride: int = 1
    bn: bool = False
    relu: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        h = conv(self.features, self.kernel, self.stride, use_bias=True, name="conv")(x)
        if self.bn:
            h = batch_norm("bn", x.dtype)(h, use_running_average=not train)
        if self.relu:
            h = nn.relu(h)
        return h


class Residual(nn.Module):
    """Pre-activation bottleneck residual (reference layers.py:66-97)."""

    out_dim: int

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        bn_eval = not train
        half = self.out_dim // 2
        need_skip = x.shape[-1] != self.out_dim
        h = batch_norm("bn1", x.dtype)(x, use_running_average=bn_eval)
        h = nn.relu(h)
        h = conv(half, 1, 1, padding=0, use_bias=True, name="conv1_conv")(h)
        h = batch_norm("bn2", x.dtype)(h, use_running_average=bn_eval)
        h = nn.relu(h)
        h = conv(half, 3, 1, use_bias=True, name="conv2_conv")(h)
        h = batch_norm("bn3", x.dtype)(h, use_running_average=bn_eval)
        h = nn.relu(h)
        h = conv(self.out_dim, 1, 1, padding=0, use_bias=True, name="conv3_conv")(h)
        if need_skip:
            skip = conv(self.out_dim, 1, 1, padding=0, use_bias=True, name="skip_layer_conv")(x)
        else:
            skip = x
        return h + skip


def _nearest_up2(x: jax.Array) -> jax.Array:
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


def _max_pool_2x2(x: jax.Array) -> jax.Array:
    return nn.max_pool(x, window_shape=(2, 2), strides=(2, 2))


class Hourglass(nn.Module):
    """Recursive hourglass (reference hourglass.py:8-32)."""

    n: int
    features: int
    increase: int = 0

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        nf = self.features + self.increase
        up1 = Residual(self.features, name="up1")(x, train=train)
        low = _max_pool_2x2(x)
        low = Residual(nf, name="low1")(low, train=train)
        if self.n > 1:
            low = Hourglass(self.n - 1, nf, name="low2")(low, train=train)
        else:
            low = Residual(nf, name="low2")(low, train=train)
        low = Residual(self.features, name="low3")(low, train=train)
        return up1 + _nearest_up2(low)


class StackedHourglass(nn.Module):
    """[B,256,256,3] -> (early feats [B,32,32,inp_dim],
    heatmaps [B,nstack,32,32,oup_dim], final feature [B,32,32,inp_dim])."""

    nstack: int = 4
    inp_dim: int = 256
    oup_dim: int = 21
    recur_hg: int = 4
    increase: int = 0

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        h = ConvBlock(64, 7, 2, bn=True, relu=True, name="pre_0")(x, train=train)
        h = Residual(128, name="pre_1")(h, train=train)
        h = _max_pool_2x2(h)
        h = Residual(128, name="pre_3")(h, train=train)
        h = Residual(self.inp_dim, name="pre_4")(h, train=train)
        h = _max_pool_2x2(h)
        img_features = h

        preds_all = []
        feature = h
        for i in range(self.nstack):
            hg = Hourglass(self.recur_hg, self.inp_dim, self.increase,
                           name=f"hgs_{i}_0")(h, train=train)
            feature = Residual(self.inp_dim, name=f"features_{i}_0")(hg, train=train)
            feature = ConvBlock(self.inp_dim, 1, bn=True, relu=True,
                                name=f"features_{i}_1")(feature, train=train)
            preds = ConvBlock(self.oup_dim, 1, bn=False, relu=False,
                              name=f"outs_{i}")(feature, train=train)
            preds_all.append(preds)
            if i < self.nstack - 1:
                merged_p = ConvBlock(self.inp_dim, 1, bn=False, relu=False,
                                     name=f"merge_preds_{i}_conv")(preds, train=train)
                merged_f = ConvBlock(self.inp_dim, 1, bn=False, relu=False,
                                     name=f"merge_features_{i}_conv")(feature, train=train)
                h = h + merged_p + merged_f
        return img_features, jnp.stack(preds_all, axis=1), feature
