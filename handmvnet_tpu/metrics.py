"""Pose metrics: MPJPE, PA-MPJPE (Procrustes), PCK and PCK-AUC.

reference: src/models/metrics.py. Everything is vectorized jnp (the
reference loops over thresholds in Python; here the PCK curve is one
broadcasted comparison) and jittable for in-graph eval.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from handmvnet_tpu.ops.procrustes import similarity_align


def mpjpe(preds: jax.Array, labels: jax.Array) -> jax.Array:
    """Mean Euclidean distance over the last-but-one axis points."""
    return jnp.mean(jnp.linalg.norm(preds - labels, axis=-1))


def weighted_mpjpe(preds: jax.Array, labels: jax.Array, w: jax.Array) -> jax.Array:
    return jnp.mean(w * jnp.linalg.norm(preds - labels, axis=-1))


def pa_mpjpe(preds: jax.Array, labels: jax.Array) -> jax.Array:
    """MPJPE after optimal similarity (Procrustes) alignment per sample."""
    return mpjpe(similarity_align(preds, labels), labels)


def n_mpjpe(preds: jax.Array, labels: jax.Array) -> jax.Array:
    """Scale-normalized MPJPE (reference metrics.py:51-61); expects
    [B, S, N, 3]-style inputs like the reference (dims 2/3 reductions)."""
    norm_pred = jnp.mean(jnp.sum(preds**2, axis=3, keepdims=True), axis=2, keepdims=True)
    norm_tgt = jnp.mean(jnp.sum(labels * preds, axis=3, keepdims=True), axis=2, keepdims=True)
    return mpjpe(norm_tgt / norm_pred * preds, labels)


def mka(preds: jax.Array) -> jax.Array:
    """Mean keypoint acceleration over a temporal sequence [B, T, J, 3]
    (tracking-jitter metric; reference metrics.py:36-49)."""
    acc = preds[:, :-2] + preds[:, 2:] - 2.0 * preds[:, 1:-1]
    return jnp.linalg.norm(acc, axis=-1).mean(axis=-1).mean(axis=-1)


def pck(preds: jax.Array, labels: jax.Array, threshold, reference_len=None) -> jax.Array:
    dist = jnp.linalg.norm(preds - labels, axis=-1)  # [B, N]
    thr = jnp.asarray(threshold)
    if reference_len is not None:
        thr = thr * reference_len[:, None]
    return jnp.mean((dist <= thr).astype(jnp.float32))


class PckAuc(NamedTuple):
    auc: jax.Array
    norm_auc: jax.Array
    pck_values: jax.Array  # [steps]
    thresholds: jax.Array  # [steps]


def pck_auc(
    preds: jax.Array,
    labels: jax.Array,
    min_threshold: float = 0.0,
    max_threshold: float = 0.02,
    steps: int = 20,
    reference_len=None,
) -> PckAuc:
    """Trapezoid-rule area under the PCK curve over `steps` thresholds."""
    thresholds = jnp.linspace(min_threshold, max_threshold, steps)
    dist = jnp.linalg.norm(preds - labels, axis=-1)  # [B, N]
    if reference_len is not None:
        dist = dist / reference_len[:, None]
    values = jnp.mean(
        (dist[None, ...] <= thresholds[:, None, None]).astype(jnp.float32), axis=(1, 2)
    )
    auc = jnp.trapezoid(values, thresholds)
    perfect = jnp.trapezoid(jnp.ones_like(values), thresholds)
    return PckAuc(auc=auc, norm_auc=auc / perfect, pck_values=values, thresholds=thresholds)
