"""Analytical inverse kinematics: 21 joints -> 16 MANO rotation matrices,
batched and jittable.

Replaces the reference's per-sample numpy/dict implementation
(src/utils/analytical_ik.py:50-138, adapted from Hao Meng's Minimal-Hand IK)
with a TPU-shaped formulation:

  * the global orientation comes from one batched 3x3 SVD over the five
    root bones (the fixed-iteration Jacobi svd3x3 — XLA's QDWH while-loop
    SVD costs dozens of sequential kernels for a 3x3 problem);
  * the five finger chains are independent given the global orientation, so
    the 15 per-joint steps collapse to THREE sequential levels, each
    vectorized over (batch, 5 fingers) — closed-form swing rotations with
    twist assumed zero, exactly like the reference.

Parity vs the reference numpy oracle is tested to ~1e-3 on the rotation
matrices (tests/test_mano_ik.py).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from handmvnet_tpu.constants import ID2ROT
from handmvnet_tpu.ops.small_linalg import det3, mm, mmt, mtv, mv
from handmvnet_tpu.ops.svd3 import svd3x3

_FINGER_ROOTS = (1, 5, 9, 13, 17)
# chain levels: joints at depth 1..3 below the finger roots
_LEVELS = (
    (2, 6, 10, 14, 18),
    (3, 7, 11, 15, 19),
    (4, 8, 12, 16, 20),
)


def rodrigues(axis: jax.Array, angle: jax.Array) -> jax.Array:
    """Axis-angle -> rotation matrix (transforms3d.axangles.axangle2mat with
    is_normalized=False semantics: axis normalized internally).

    axis: [..., 3]; angle: [...]. Returns [..., 3, 3].
    """
    n = axis / (jnp.linalg.norm(axis, axis=-1, keepdims=True) + 1e-12)
    x, y, z = n[..., 0], n[..., 1], n[..., 2]
    c = jnp.cos(angle)
    s = jnp.sin(angle)
    C = 1.0 - c
    row0 = jnp.stack([x * x * C + c, x * y * C - z * s, x * z * C + y * s], axis=-1)
    row1 = jnp.stack([y * x * C + z * s, y * y * C + c, y * z * C - x * s], axis=-1)
    row2 = jnp.stack([z * x * C - y * s, z * y * C + x * s, z * z * C + c], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def _global_orientation(template: jax.Array, target: jax.Array,
                        polish_sweeps: int = 2) -> jax.Array:
    """R0 aligning the template's five root bones to the target's.

    template: [21, 3]; target: [B, 21, 3]. Returns [B, 3, 3].
    Mirrors the reference's SVD + near-reflection special case
    (analytical_ik.py:80-99).
    """
    # numpy index constants: `template` may be a host (numpy) array — indexing
    # it with a device array would force a device->host read during tracing,
    # which permanently degrades relayed TPU transports (see bench.py).
    kids = np.asarray(_FINGER_ROOTS)
    t_bones = (template[kids] - template[0]).T  # [3, 5]
    p_bones = jnp.swapaxes(target[:, kids] - target[:, :1], -1, -2)  # [B, 3, 5]
    h = jnp.einsum("in,bjn->bij", t_bones, p_bones)  # T_0 @ P_0^T
    u, s, vt = svd3x3(h, polish_sweeps=polish_sweeps)
    v = jnp.swapaxes(vt, -1, -2)
    r0 = mmt(v, u)  # V @ U^T
    det = det3(r0)
    # reference: only if det ~ -1 AND some singular value ~ 0, flip V[:, 2]
    tiny_sv = jnp.any(jnp.abs(s) < 1e-4, axis=-1)
    flip = (jnp.abs(det + 1.0) < 1e-6) & tiny_sv
    v_f = v.at[..., :, 2].multiply(jnp.where(flip, -1.0, 1.0)[..., None])
    return mmt(v_f, u)


def adaptive_ik(template: jax.Array, target: jax.Array,
                polish_sweeps: int = 2, r0: jax.Array | None = None) -> jax.Array:
    """Compute MANO pose rotations from a joint template and predictions.

    Args:
      template: [21, 3] flat-hand template joints (same units as target).
      target: [B, 21, 3] predicted joints, already rigidly aligned to the
        template frame.
      r0: optional precomputed global orientation [B, 3, 3] (callers that
        already ran the root-bone SVD — e.g. the fused joints->vertices
        path — pass it in to avoid a second decomposition).

    Returns:
      [B, 16, 3, 3] pose rotations (slot 0 = global orientation, slots 1-15
      per ID2ROT), the reference's output layout (analytical_ik.py:132-137).
    """
    b = target.shape[0]
    dtype = target.dtype
    if r0 is None:
        r0 = _global_orientation(template, target, polish_sweeps)

    roots = np.asarray(_FINGER_ROOTS)  # numpy: template may be a host array
    # per-finger chain state, vectorized over (B, 5)
    r_pa = jnp.broadcast_to(r0[:, None], (b, 5, 3, 3))  # R of the parent joint
    q_pa_pa = jnp.broadcast_to(template[0], (b, 5, 3))  # q of the grandparent
    pa_ids = roots  # parent joint ids at the current level
    pa_pa_ids = np.zeros((5,), np.int32)  # wrist

    locals_per_level = []
    for level in _LEVELS:
        k_ids = np.asarray(level)
        t_pa = template[pa_ids]  # [5, 3]
        t_pa_pa = template[pa_pa_ids]
        t_k = template[k_ids]
        # q[pa] = R[pa] @ (T[pa] - T[pa_pa]) + q[pa_pa]
        q_pa = mv(r_pa, jnp.broadcast_to((t_pa - t_pa_pa).astype(dtype), q_pa_pa.shape)) + q_pa_pa
        # delta in the parent's local frame (orthonormal: inverse == transpose)
        delta_p = mtv(r_pa, target[:, k_ids] - q_pa)
        delta_t = (t_k - t_pa).astype(dtype)  # [5, 3]
        axis = jnp.cross(jnp.broadcast_to(delta_t, delta_p.shape), delta_p)
        norm_t = jnp.linalg.norm(delta_t, axis=-1) + 1e-8  # [5]
        norm_p = jnp.linalg.norm(delta_p, axis=-1) + 1e-8  # [B, 5]
        cos_a = jnp.einsum("fj,bfj->bf", delta_t, delta_p) / (norm_t * norm_p)
        alpha = jnp.arccos(jnp.clip(cos_a, -1.0, 1.0))
        d_sw = rodrigues(axis, alpha)  # [B, 5, 3, 3]; twist = 0 (reference D_tw = I)
        locals_per_level.append(d_sw)
        r_pa = mm(r_pa, d_sw)
        q_pa_pa = q_pa
        pa_pa_ids = pa_ids
        pa_ids = k_ids

    # assemble the 16 MANO pose slots: concat in computation order, then one
    # static-permutation gather (cheaper than four scatters)
    stacked = jnp.concatenate([r0[:, None]] + locals_per_level, axis=1)  # [B, 16, 3, 3]
    # stacked order: [root] + level joints; invert ID2ROT to find each slot
    order = [0] + [ID2ROT[k] for level in _LEVELS for k in level]
    inverse = np.argsort(np.asarray(order))
    return stacked[:, inverse]
