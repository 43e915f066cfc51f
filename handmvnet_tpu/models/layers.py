"""Flax building blocks shared by backbones and the model core.

Naming convention: module names replicate the reference's torch module paths
with ``.N`` sequential indices collapsed to ``_N`` (e.g. torch
``layer1.0.conv1`` -> flax ``layer1_0 / conv1``). The torch->flax checkpoint
converter (handmvnet_tpu/checkpoint.py) relies on this being mechanical.

Numerical-parity notes vs torch defaults:
  * LayerNorm epsilon 1e-5 (flax default is 1e-6)
  * GELU exact erf form (flax default approximate=True)
  * BatchNorm epsilon 1e-5, momentum 0.1 torch == 0.9 flax
  * LeakyReLU negative_slope 0.01
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# torch BN: momentum 0.1 (reference hrnet.py:17, torch default); flax's
# momentum is the running-average retention factor = 1 - torch momentum.
BN_MOMENTUM_FLAX = 0.9
BN_EPS = 1e-5
LN_EPS = 1e-5


class TorchBatchNorm(nn.BatchNorm):
    """flax BatchNorm with torch's running-VARIANCE update semantics.

    torch BatchNorm2d normalizes with the biased batch variance but stores
    the UNBIASED (Bessel-corrected, n/(n-1)) variance into running_var;
    flax stores the biased one. The ~1/n relative drift this causes was
    measured at 3.4e-4 after one train step (tests/test_grad_parity_oracle
    f64 run) — small, but running stats feed every eval forward, so train
    parity requires the torch rule. Normalization math is inherited
    unchanged; only the running-var update line differs."""

    @nn.compact
    def __call__(self, x, use_running_average: bool | None = None):
        from flax.linen import module as flax_module
        from flax.linen.normalization import (
            _canonicalize_axes,
            _compute_stats,
            _normalize,
        )

        # these are PRIVATE flax helpers whose signatures have changed across
        # releases; fail loudly on an incompatible flax instead of silently
        # mis-normalizing the whole model zoo (parity is a feature)
        import inspect

        stats_params = inspect.signature(_compute_stats).parameters
        norm_params = inspect.signature(_normalize).parameters
        assert "force_float32_reductions" in stats_params and "mask" in stats_params, (
            "flax.linen.normalization._compute_stats signature changed — "
            "update TorchBatchNorm to match this flax version"
        )
        assert len(norm_params) == 14, (
            "flax.linen.normalization._normalize signature changed — "
            "update TorchBatchNorm to match this flax version"
        )

        use_running_average = flax_module.merge_param(
            "use_running_average", self.use_running_average, use_running_average
        )
        feature_axes = _canonicalize_axes(x.ndim, self.axis)
        reduction_axes = tuple(i for i in range(x.ndim) if i not in feature_axes)
        feature_shape = [x.shape[ax] for ax in feature_axes]

        ra_mean = self.variable(
            "batch_stats", "mean",
            lambda s: jnp.zeros(
                s, jnp.float32 if self.force_float32_reductions else self.param_dtype
            ),
            feature_shape,
        )
        ra_var = self.variable(
            "batch_stats", "var",
            lambda s: jnp.ones(
                s, jnp.float32 if self.force_float32_reductions else self.param_dtype
            ),
            feature_shape,
        )

        if use_running_average:
            mean = (
                ra_mean.value
                if self.force_float32_reductions
                else jnp.asarray(ra_mean.value, self.param_dtype)
            )
            var = (
                ra_var.value
                if self.force_float32_reductions
                else jnp.asarray(ra_var.value, self.param_dtype)
            )
        else:
            mean, var = _compute_stats(
                x, reduction_axes,
                dtype=self.dtype,
                axis_name=self.axis_name if not self.is_initializing() else None,
                axis_index_groups=self.axis_index_groups,
                use_fast_variance=self.use_fast_variance,
                mask=None,
                force_float32_reductions=self.force_float32_reductions,
            )
            if not self.is_initializing():
                n = 1
                for ax in reduction_axes:
                    n *= x.shape[ax]
                if self.axis_name is not None:
                    # _compute_stats pmeans mean/var over the named axis, so
                    # the effective sample count is the cross-replica one —
                    # a local n would overshoot the Bessel correction by
                    # ~group_size/n. With axis_index_groups the averaging
                    # spans only the group, not the whole axis.
                    if self.axis_index_groups is not None:
                        n *= len(self.axis_index_groups[0])
                        bessel = n / max(n - 1, 1)
                    else:
                        n *= jax.lax.psum(1, self.axis_name)
                        bessel = n / jnp.maximum(n - 1, 1)
                else:
                    bessel = n / max(n - 1, 1)  # torch stores unbiased variance
                ra_mean.value = (
                    self.momentum * ra_mean.value + (1 - self.momentum) * mean
                )
                ra_var.value = (
                    self.momentum * ra_var.value
                    + (1 - self.momentum) * var * bessel
                )

        return _normalize(
            self, x, mean, var, reduction_axes, feature_axes,
            self.dtype, self.param_dtype, self.epsilon,
            self.use_bias, self.use_scale,
            self.bias_init, self.scale_init,
            self.force_float32_reductions,
        )


def batch_norm(name: str, dtype=None) -> nn.BatchNorm:
    """BatchNorm2d with torch semantics (incl. the unbiased running-var
    update, see TorchBatchNorm); call with use_running_average=not train.
    A "frozen" BN (reference resnet.py:31-74) is this permanently in eval
    mode — the affine algebra is identical."""
    return TorchBatchNorm(
        use_running_average=None,
        momentum=BN_MOMENTUM_FLAX,
        epsilon=BN_EPS,
        dtype=dtype,
        name=name,
    )


def conv(features: int, kernel: int, stride: int = 1, padding: int | None = None,
         use_bias: bool = False, name: str | None = None, dtype=None) -> nn.Conv:
    """3x3/1x1/... conv with torch-style symmetric int padding (NHWC)."""
    if padding is None:
        padding = (kernel - 1) // 2
    return nn.Conv(
        features=features,
        kernel_size=(kernel, kernel),
        strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        use_bias=use_bias,
        name=name,
        dtype=dtype,
    )


def max_pool_3x3_s2(x: jax.Array) -> jax.Array:
    """torch MaxPool2d(kernel_size=3, stride=2, padding=1)."""
    return nn.max_pool(
        x, window_shape=(3, 3), strides=(2, 2), padding=((1, 1), (1, 1))
    )


class LayerNorm(nn.Module):
    epsilon: float = LN_EPS

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return nn.LayerNorm(epsilon=self.epsilon, dtype=x.dtype, name="ln")(x)


def gelu_exact(x: jax.Array) -> jax.Array:
    return nn.gelu(x, approximate=False)


def leaky_relu(x: jax.Array, negative_slope: float = 0.01) -> jax.Array:
    return nn.leaky_relu(x, negative_slope=negative_slope)


def sinusoidal_position_table(d_model: int, max_len: int) -> np.ndarray:
    """Classic transformer sinusoidal table [1, max_len, d_model].

    reference: src/models/layers.py:134-158 (incl. the odd-d_model branch).
    """
    position = np.arange(max_len, dtype=np.float64)[:, None]
    div_term = np.exp(np.arange(0, d_model, 2, dtype=np.float64) * (-math.log(10000.0) / d_model))
    pe = np.zeros((1, max_len, d_model), dtype=np.float64)
    pe[0, :, 0::2] = np.sin(position * div_term)
    if d_model % 2 == 0:
        pe[0, :, 1::2] = np.cos(position * div_term)
    else:
        pe[0, :, 1::2] = np.cos(position * div_term[:-1])
    return pe.astype(np.float32)


class FeedForward(nn.Module):
    """LN -> Linear(dim->hidden) -> GELU -> Dropout -> Linear(hidden->dim) -> Dropout.

    reference: src/models/layers.py:161-174; submodule names mirror the torch
    nn.Sequential indices (net.0 LayerNorm, net.1/net.4 Linear).
    """

    dim: int
    hidden_dim: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        h = nn.LayerNorm(epsilon=LN_EPS, dtype=x.dtype, name="net_0")(x)
        h = nn.Dense(self.hidden_dim, name="net_1", dtype=x.dtype)(h)
        h = gelu_exact(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.Dense(self.dim, name="net_4", dtype=x.dtype)(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        return h


class MultiHeadAttention(nn.Module):
    """Post-LN transformer block with optional fixed-split cross attention.

    With custom_query_length=q > 0, the first q tokens attend (as queries)
    over the remaining tokens (keys/values) — the cross-view fusion trick
    (reference: src/models/layers.py:177-237). Output length equals q (or the
    full length when 0).

    The attention itself is two small einsums over <=168 tokens; XLA fuses
    the QK^T -> softmax -> V chain into MXU work, no flash-style tiling is
    needed at this sequence length (see SURVEY.md §5.7).
    """

    d_model: int
    n_heads: int = 8
    dim_head: int = 128
    dropout: float = 0.0
    custom_query_length: int = 0
    use_query_tokens_from_start: bool = True
    use_pallas: bool | None = None  # None = auto (Pallas kernel on TPU)

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        from handmvnet_tpu.ops.pallas.attention import fused_attention

        inner = self.n_heads * self.dim_head
        cql = self.custom_query_length
        if cql > 0:
            if self.use_query_tokens_from_start:
                xq, xkv = x[:, :cql, :], x[:, cql:, :]
            else:
                xq, xkv = x[:, -cql:, :], x[:, :-cql, :]
        else:
            xq, xkv = x, x

        q = nn.Dense(inner, use_bias=False, name="to_q", dtype=x.dtype)(xq)
        k = nn.Dense(inner, use_bias=False, name="to_k", dtype=x.dtype)(xkv)
        v = nn.Dense(inner, use_bias=False, name="to_v", dtype=x.dtype)(xkv)

        b, nq, _ = q.shape
        nk = k.shape[1]
        q = q.reshape(b, nq, self.n_heads, self.dim_head).transpose(0, 2, 1, 3)
        k = k.reshape(b, nk, self.n_heads, self.dim_head).transpose(0, 2, 1, 3)
        v = v.reshape(b, nk, self.n_heads, self.dim_head).transpose(0, 2, 1, 3)

        scale = self.dim_head ** -0.5
        out = fused_attention(q, k, v, scale, use_pallas=self.use_pallas)
        out = out.transpose(0, 2, 1, 3).reshape(b, nq, inner)

        out = nn.Dense(self.d_model, name="to_out", dtype=x.dtype)(out)
        out = nn.Dropout(self.dropout, deterministic=not train)(out)
        out = nn.LayerNorm(epsilon=LN_EPS, dtype=x.dtype, name="norm1")(out + xq)
        ff = FeedForward(self.d_model, self.dim_head, self.dropout, name="ff")(out, train=train)
        return nn.LayerNorm(epsilon=LN_EPS, dtype=x.dtype, name="norm2")(ff + out)


class MultiHeadAttentionLearnableQuery(nn.Module):
    """Pre-PE block with an optional learnable 21-token probe as query.

    reference: src/models/layers.py:240-301. Each block re-adds the
    sinusoidal PE to its input (and to the probe in cross mode).
    """

    d_model: int
    max_tokens: int
    n_heads: int = 8
    dim_head: int = 256
    dropout: float = 0.0
    cross_attn: bool = True
    num_query_tokens: int = 21

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        inner = self.n_heads * self.dim_head
        pe = jnp.asarray(sinusoidal_position_table(self.d_model, self.max_tokens))
        x = x + pe[:, : x.shape[1]].astype(x.dtype)

        if self.cross_attn:
            probe = self.param(
                "probe", nn.initializers.normal(1.0),
                (1, self.num_query_tokens, self.d_model),
            )
            probe = jnp.broadcast_to(probe, (x.shape[0],) + probe.shape[1:])
            probe = probe + pe[:, : probe.shape[1]].astype(x.dtype)
            xq = probe
        else:
            xq = x

        q = nn.Dense(inner, use_bias=False, name="to_q", dtype=x.dtype)(xq)
        k = nn.Dense(inner, use_bias=False, name="to_k", dtype=x.dtype)(x)
        v = nn.Dense(inner, use_bias=False, name="to_v", dtype=x.dtype)(x)
        b, nq = q.shape[:2]
        nk = k.shape[1]
        q = q.reshape(b, nq, self.n_heads, self.dim_head)
        k = k.reshape(b, nk, self.n_heads, self.dim_head)
        v = v.reshape(b, nk, self.n_heads, self.dim_head)
        logits = jnp.einsum("bihd,bjhd->bhij", q, k) * (self.dim_head ** -0.5)
        attn = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhij,bjhd->bihd", attn, v).reshape(b, nq, inner)
        out = nn.Dense(self.d_model, name="to_out_0", dtype=x.dtype)(out)
        out = nn.Dropout(self.dropout, deterministic=not train)(out)

        ff = FeedForward(self.d_model, self.dim_head, self.dropout, name="ff")
        if self.cross_attn:
            return ff(out, train=train) + out
        out = out + x
        return ff(out, train=train) + out


class ChebConv(nn.Module):
    """Chebyshev graph convolution with a precomputed polynomial basis.

    The basis (T_0..T_K of the skeleton Laplacian) is static — passed in as a
    constant so XLA folds it; the layer is then K+1 fused matmuls.
    reference: src/models/layers.py:363-445 (which recomputes the basis every
    forward).
    """

    in_features: int
    out_features: int
    order: int = 2  # K; K+1 basis terms

    @nn.compact
    def __call__(self, x: jax.Array, basis: jax.Array) -> jax.Array:
        # torch stores weight [K+1, 1, in, out] (xavier_normal over last dims)
        weight = self.param(
            "weight",
            _xavier_normal_torch((self.order + 1, 1, self.in_features, self.out_features)),
            (self.order + 1, 1, self.in_features, self.out_features),
        )
        bias = self.param("bias", nn.initializers.zeros, (1, 1, self.out_features))
        # [K, N, N] @ [B, N, C] -> [K, B, N, C]; then per-K feature matmul
        propagated = jnp.einsum("knm,bmc->kbnc", basis.astype(x.dtype), x)
        out = jnp.einsum("kbnc,kcd->bnd", propagated, weight[:, 0].astype(x.dtype))
        return out + bias.astype(x.dtype)


class LearnablePositionalEncoding(nn.Module):
    """Learned additive position table (dormant in release configs;
    reference layers.py:100-114)."""

    d_model: int
    max_len: int = 5000
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        pe = self.param("pe", nn.initializers.normal(1.0), (1, self.max_len, self.d_model))
        x = x + pe[:, : x.shape[1]].astype(x.dtype)
        return nn.Dropout(self.dropout, deterministic=not train)(x)


def frequency_encoding(x: jax.Array, num_frequencies: int = 4) -> jax.Array:
    """NeRF-style per-scalar sin/cos frequency features (dormant;
    reference layers.py:117-131). x: [...]-> [..., num_freq_pairs*2] flattened
    over the last input dim."""
    freqs = jnp.exp(
        jnp.arange(0, num_frequencies, 2, dtype=jnp.float32)
        * (-math.log(10000.0) / num_frequencies)
    )
    enc = jnp.concatenate(
        [jnp.sin(x[..., None] * freqs), jnp.cos(x[..., None] * freqs)], axis=-1
    )
    return enc.reshape(*x.shape[:-1], -1)


class GraphConv(nn.Module):
    """Dense-adjacency graph conv with degree-normalized propagation
    (dormant; reference layers.py:448-473): X' = act(fc(L X)) where
    L = D^-1/2 A D^-1/2 computed from the (possibly learned) adjacency."""

    out_features: int
    use_relu: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, adj: jax.Array) -> jax.Array:
        d = (jnp.sum(adj, axis=-2) + 1e-5) ** -0.5
        lap = d[..., :, None] * adj * d[..., None, :]
        h = jnp.einsum("...nm,bmc->bnc", lap, x)
        h = nn.Dense(self.out_features, name="fc", dtype=x.dtype)(h)
        return nn.relu(h) if self.use_relu else h


class GraphPool(nn.Module):
    """Linear node pooling across the node axis (dormant; reference
    layers.py:337-347)."""

    out_nodes: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return jnp.swapaxes(
            nn.Dense(self.out_nodes, name="fc", dtype=x.dtype)(jnp.swapaxes(x, -1, -2)),
            -1, -2,
        )


class GraphUnpool(GraphPool):
    """Inverse of GraphPool (reference layers.py:350-360)."""


def _xavier_normal_torch(shape: Sequence[int]):
    """torch nn.init.xavier_normal_ for a >=2D tensor."""
    receptive = int(np.prod(shape[2:])) if len(shape) > 2 else 1
    fan_in = shape[1] * receptive
    fan_out = shape[0] * receptive
    std = math.sqrt(2.0 / (fan_in + fan_out))

    def init(key, shape_, dtype=jnp.float32):
        return jax.random.normal(key, shape_, dtype) * std

    return init
