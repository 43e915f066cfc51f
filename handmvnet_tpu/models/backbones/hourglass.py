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
                                     name=f"merge_preds_{i}")(preds, train=train)
                merged_f = ConvBlock(self.inp_dim, 1, bn=False, relu=False,
                                     name=f"merge_features_{i}")(feature, train=train)
                h = h + merged_p + merged_f
        return img_features, jnp.stack(preds_all, axis=1), feature


class HourglassBisected(nn.Module):
    """Recursive hourglass with two parallel output streams (heatmap + mask;
    dormant; reference hourglass.py:35-100)."""

    depth: int
    features: int

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        return self._forward(self.depth, x, train)

    def _forward(self, n: int, x: jax.Array, train: bool):
        f = self.features
        up1 = Residual(f, name=f"hg_{n - 1}_0_0_0")(x, train=train)
        up2 = Residual(f, name=f"hg_{n - 1}_0_1_0")(x, train=train)
        low = _max_pool_2x2(x)
        low = Residual(f, name=f"hg_{n - 1}_1_0_0")(low, train=train)
        if n > 1:
            low1, low2, latent = self._forward(n - 1, low, train)
        else:
            latent = low
            low1 = Residual(f, name=f"hg_{n - 1}_3_0_0")(low, train=train)
            low2 = Residual(f, name=f"hg_{n - 1}_3_1_0")(low, train=train)
        low1 = Residual(f, name=f"hg_{n - 1}_2_0_0")(low1, train=train)
        low2 = Residual(f, name=f"hg_{n - 1}_2_1_0")(low2, train=train)
        return up1 + _nearest_up2(low1), up2 + _nearest_up2(low2), latent


class StackedBisectedHourglass(nn.Module):
    """[B,256,256,3] -> (early feats, heatmaps [B,S,32,32,J], final feature,
    masks [B,S,32,32,1]) — the heatmap+mask twin-stream variant (dormant;
    reference hourglass.py:173-285)."""

    nstack: int = 4
    inp_dim: int = 256
    oup_dim: int = 21
    recur_hg: int = 4

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        bn_eval = not train
        h = conv(64, 7, 2, use_bias=True, name="conv1")(x)
        h = batch_norm("bn1", x.dtype)(h, use_running_average=bn_eval)
        h = nn.relu(h)
        h = Residual(128, name="layer1_0")(h, train=train)
        h = _max_pool_2x2(h)
        h = Residual(256, name="layer2_0")(h, train=train)
        h = Residual(self.inp_dim, name="layer3_0")(h, train=train)
        h = _max_pool_2x2(h)
        img_features = h

        hms, masks, enc = [], [], []
        for i in range(self.nstack):
            y1, y2, _ = HourglassBisected(
                depth=self.recur_hg, features=self.inp_dim, name=f"hg2b_{i}"
            )(h, train=train)
            y1 = Residual(self.inp_dim, name=f"res1_{i}_0")(y1, train=train)
            y1 = conv(self.inp_dim, 1, 1, padding=0, name=f"fc1_{i}_0")(y1)
            y1 = batch_norm(f"fc1_{i}_1", x.dtype)(y1, use_running_average=bn_eval)
            y1 = nn.relu(y1)
            est_hm = conv(self.oup_dim, 1, 1, padding=0, use_bias=True, name=f"hm_{i}")(y1)
            hms.append(est_hm)

            y2 = Residual(self.inp_dim, name=f"res2_{i}_0")(y2, train=train)
            y2 = conv(self.inp_dim, 1, 1, padding=0, name=f"fc2_{i}_0")(y2)
            y2 = batch_norm(f"fc2_{i}_1", x.dtype)(y2, use_running_average=bn_eval)
            y2 = nn.relu(y2)
            est_mask = conv(1, 1, 1, padding=0, use_bias=True, name=f"mask_{i}")(y2)
            masks.append(est_mask)

            if i < self.nstack - 1:
                h = (
                    h
                    + conv(self.inp_dim, 1, 1, padding=0, name=f"_fc1_{i}")(y1)
                    + conv(self.inp_dim, 1, 1, padding=0, name=f"_fc2_{i}")(y2)
                    + conv(self.inp_dim, 1, 1, padding=0, name=f"_hm_{i}")(est_hm)
                    + conv(self.inp_dim, 1, 1, padding=0, name=f"_mask_{i}")(est_mask)
                )
                enc.append(h)
            else:
                enc.append(h + y1 + y2)
        return img_features, jnp.stack(hms, 1), enc[-1], jnp.stack(masks, 1)
