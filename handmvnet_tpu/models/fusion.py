"""Cross-view attention fusion stacks (reference: src/models/fusion.py).

CrossAttentionFusion: sinusoidal PE once at entry, then
(num_layers-1)/2 self-attention blocks over all 21*V tokens, one
cross-attention block with the first 21 tokens (view 0) as queries over the
remaining 21*(V-1), then (num_layers-1)/2 self-attention blocks over the
fused 21 tokens. The Q/KV split is a static slice, so the whole stack jits
into one fused XLA computation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from handmvnet_tpu.models.layers import (
    MultiHeadAttention,
    MultiHeadAttentionLearnableQuery,
    sinusoidal_position_table,
)


class CrossAttentionFusion(nn.Module):
    feat_dim: int
    max_tokens: int
    custom_query_length: int = 21
    num_layers: int = 5  # must be odd
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x: jax.Array, add_pos: bool = True, train: bool = False) -> jax.Array:
        assert self.num_layers % 2 == 1, "num_layers must be odd"
        half = (self.num_layers - 1) // 2
        if add_pos:
            pe = jnp.asarray(sinusoidal_position_table(self.feat_dim, self.max_tokens))
            x = x + pe[:, : x.shape[1]].astype(x.dtype)
        idx = 0
        for _ in range(half):
            x = MultiHeadAttention(
                d_model=self.feat_dim, dropout=self.dropout,
                name=f"attn_fusion_{idx}",
            )(x, train=train)
            idx += 1
        x = MultiHeadAttention(
            d_model=self.feat_dim, dropout=self.dropout,
            custom_query_length=self.custom_query_length,
            name=f"attn_fusion_{idx}",
        )(x, train=train)
        idx += 1
        for _ in range(half):
            x = MultiHeadAttention(
                d_model=self.feat_dim, dropout=self.dropout,
                name=f"attn_fusion_{idx}",
            )(x, train=train)
            idx += 1
        return x


class CrossAttentionFusionLearnableQuery(nn.Module):
    """5 blocks (self, self, cross-with-learnable-probe, self, self),
    dim_head 256, per-block PE (reference fusion.py:33-49)."""

    feat_dim: int
    max_tokens: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        # (no add_pos knob: the reference applies per-block sinusoidal PE
        # unconditionally in this variant, layers.py:240-301)
        for i, cross in enumerate((False, False, True, False, False)):
            x = MultiHeadAttentionLearnableQuery(
                d_model=self.feat_dim, max_tokens=self.max_tokens,
                dropout=self.dropout, cross_attn=cross,
                name=f"attn_fusion_{i}",
            )(x, train=train)
        return x
