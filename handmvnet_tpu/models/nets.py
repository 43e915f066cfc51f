"""Sub-networks: heatmap heads, point-feature sampler, joint decoders.

reference: src/models/nets.py + the pose_net construction in
src/models/handmvnet.py:51-86.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from handmvnet_tpu import constants
from handmvnet_tpu.models.layers import batch_norm, conv, leaky_relu, ChebConv
from handmvnet_tpu.ops.graph import cheb_basis
from handmvnet_tpu.ops.sampling import sample_points_bilinear


class SampleNet(nn.Module):
    """1x1 conv (BN+ReLU) halving channels, then bilinear sampling of the 21
    joint locations (reference nets.py:24-63, reduce_after_sample=False path).

    Coordinates arrive in 32x32-heatmap pixel units for every pyramid level
    (the reference's cross-scale quirk, replicated deliberately).
    """

    out_channels: int

    @nn.compact
    def __call__(self, feat: jax.Array, joint_coords: jax.Array, train: bool = False) -> jax.Array:
        # torch: make_conv_layers([c, c//2]) -> Conv(bias) + BN + ReLU
        h = conv(self.out_channels, 1, 1, padding=0, use_bias=True, name="conv_0")(feat)
        h = batch_norm("conv_1", feat.dtype)(h, use_running_average=not train)
        h = nn.relu(h)
        return sample_points_bilinear(h, joint_coords)


def hand_cheb_basis(order: int = 2) -> np.ndarray:
    return cheb_basis(constants.NUM_JOINTS, constants.HAND_EDGES, order)


class JointsDecoderGCN(nn.Module):
    """3x ChebConv(K=2) over the hand skeleton: feat -> 256 -> 64 -> 3 with
    LeakyReLU (reference nets.py:119-139). The Chebyshev basis is a baked
    constant — the reference recomputes it every forward."""

    in_features: int
    out_dim: int = 3

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        basis = jnp.asarray(hand_cheb_basis(order=2))
        h = leaky_relu(ChebConv(self.in_features, 256, order=2, name="joints_gcn1")(x, basis))
        h = leaky_relu(ChebConv(256, 64, order=2, name="joints_gcn2")(h, basis))
        return ChebConv(64, self.out_dim, order=2, name="joints_gcn3")(h, basis)


class JointsDecoderNN(nn.Module):
    """MLP decoder feat -> 64 -> 3 (reference nets.py:142-154)."""

    in_features: int
    out_dim: int = 3

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = nn.Dense(64, name="joints_fc1", dtype=x.dtype)(x)
        h = leaky_relu(h)
        return nn.Dense(self.out_dim, name="joints_fc2", dtype=x.dtype)(h)


class PoseNet(nn.Module):
    """Legacy heatmap-head wrapper: 1x1 conv stack -> heatmaps + soft-argmax
    coords (dormant, but its torch params are the source of the
    ``pose_net.conv.*`` legacy checkpoint keys; reference nets.py:13-21 and
    eval.py:15-52 — the converter's LEGACY_REMAPS handle those)."""

    channels: tuple = (512, 21)

    @nn.compact
    def __call__(self, feat: jax.Array, train: bool = False):
        from handmvnet_tpu.ops.heatmap import soft_argmax_2d

        h = feat
        dims = list(self.channels)
        for i, c in enumerate(dims[:-1]):
            h = conv(c, 1, 1, padding=0, use_bias=True, name=f"conv_{3 * i}")(h)
            h = batch_norm(f"conv_{3 * i + 1}", feat.dtype)(h, use_running_average=not train)
            h = nn.relu(h)
        hm = conv(dims[-1], 1, 1, padding=0, use_bias=True,
                  name=f"conv_{3 * (len(dims) - 1)}")(h)
        hm_jf = jnp.moveaxis(hm, -1, 1)
        return soft_argmax_2d(hm_jf), hm_jf


class GraphChebConvNet(nn.Module):
    """Configurable-depth ChebConv stack over the hand skeleton (dormant;
    reference nets.py:66-116)."""

    in_dim: int
    out_dim: int = 3
    hidden_dim: int = 128
    num_layers: int = 3
    order: int = 2

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        basis = jnp.asarray(hand_cheb_basis(order=self.order))
        dims = [self.in_dim] + [self.hidden_dim] * (self.num_layers - 1) + [self.out_dim]
        h = x
        for i in range(self.num_layers):
            h = ChebConv(dims[i], dims[i + 1], order=self.order, name=f"gcn_layers_{i}")(h, basis)
            if i < self.num_layers - 1:
                h = leaky_relu(h)
        return h


class GraphConvNet(nn.Module):
    """Two dense GraphConvs with a learnable adjacency (dormant; reference
    nets.py:157-170)."""

    in_features: int
    out_features: int
    nodes: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from handmvnet_tpu.models.layers import GraphConv

        a_hat = self.param("A_hat", nn.initializers.normal(1.0), (self.nodes, self.nodes))
        h = GraphConv(self.in_features // 2, name="gconv1")(x, a_hat)
        return GraphConv(self.out_features, name="gconv2")(h, a_hat)


class ResidualGraphConv(nn.Module):
    """Residual pair of GraphConvNets (dormant; reference nets.py:173-190)."""

    input_dim: int
    hid_dim: int
    nodes: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = GraphConvNet(self.input_dim, self.hid_dim, self.nodes, name="gconv1")(x)
        h = nn.relu(h)
        h = GraphConvNet(self.hid_dim, self.input_dim, self.nodes, name="gconv2")(h)
        return nn.relu(x + h)
