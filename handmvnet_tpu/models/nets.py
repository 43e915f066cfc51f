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
