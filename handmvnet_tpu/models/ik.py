"""Analytical inverse kinematics: 21 joints -> 16 MANO rotation matrices,
batched and jittable.

Replaces the reference's per-sample numpy/dict implementation
(src/utils/analytical_ik.py:50-138, adapted from Hao Meng's Minimal-Hand IK)
with vectorized jnp: the global orientation comes from an SVD over the five
root bones, then each finger chain is a static 15-step unroll of closed-form
swing rotations (twist assumed zero, like the reference). Everything is
[B, ...]-batched, so mesh recovery for a whole batch is one XLA program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from handmvnet_tpu.constants import ID2ROT, KINEMATIC_TREE, SNAP_PARENT

_ROOT_BONE_CHILDREN = (1, 5, 9, 13, 17)


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


def _global_orientation(template: jax.Array, target: jax.Array) -> jax.Array:
    """R0 aligning the template's five root bones to the target's.

    template: [21, 3]; target: [B, 21, 3]. Returns [B, 3, 3].
    Mirrors the reference's SVD + near-reflection special case
    (analytical_ik.py:80-99).
    """
    kids = jnp.asarray(_ROOT_BONE_CHILDREN)
    t_bones = (template[kids] - template[0]).T  # [3, 5]
    p_bones = jnp.swapaxes(target[:, kids] - target[:, :1], -1, -2)  # [B, 3, 5]
    h = jnp.einsum("in,bjn->bij", t_bones, p_bones)  # T_0 @ P_0^T
    u, s, vt = jnp.linalg.svd(h)
    v = jnp.swapaxes(vt, -1, -2)
    r0 = jnp.einsum("bij,bkj->bik", v, u)  # V @ U^T
    det = jnp.linalg.det(r0)
    # reference: only if det ~ -1 AND some singular value ~ 0, flip V[:, 2]
    tiny_sv = jnp.any(jnp.abs(s) < 1e-4, axis=-1)
    flip = (jnp.abs(det + 1.0) < 1e-6) & tiny_sv
    v_f = v.at[..., :, 2].multiply(jnp.where(flip, -1.0, 1.0)[..., None])
    return jnp.einsum("bij,bkj->bik", v_f, u)


def adaptive_ik(template: jax.Array, target: jax.Array) -> jax.Array:
    """Compute MANO pose rotations from a joint template and predictions.

    Args:
      template: [21, 3] flat-hand template joints (same units as target).
      target: [B, 21, 3] predicted joints, already rigidly aligned to the
        template frame.

    Returns:
      [B, 16, 3, 3] pose rotations (slot 0 = global orientation, slots 1-15
      per ID2ROT), exactly the reference's output layout
      (analytical_ik.py:132-137).
    """
    b = target.shape[0]
    dtype = target.dtype
    r0 = _global_orientation(template, target)

    # per-joint state: R (global rotation of the bone INTO joint k),
    # q (reconstructed position of joint k)
    R = {0: r0}
    for k in _ROOT_BONE_CHILDREN:
        R[k] = r0
    q = {0: jnp.broadcast_to(template[0], (b, 3))}
    R_local = {}

    for k in KINEMATIC_TREE:
        pa = SNAP_PARENT[k]
        pa_pa = SNAP_PARENT[pa]
        # q[pa] = R[pa] @ (T[pa] - T[pa_pa]) + q[pa_pa]
        t_bone = template[pa] - template[pa_pa]
        q_pa = jnp.einsum("bij,j->bi", R[pa], t_bone) + q[pa_pa]
        q[pa] = q_pa
        # delta in the parent's local frame (R orthonormal: inv == transpose)
        delta_p = jnp.einsum("bji,bj->bi", R[pa], target[:, k] - q_pa)
        delta_t = template[k] - template[pa]
        axis = jnp.cross(jnp.broadcast_to(delta_t, delta_p.shape), delta_p)
        norm_t = jnp.linalg.norm(delta_t) + 1e-8
        norm_p = jnp.linalg.norm(delta_p, axis=-1) + 1e-8
        cos_a = jnp.einsum("j,bj->b", delta_t.astype(dtype), delta_p) / (norm_t * norm_p)
        alpha = jnp.arccos(jnp.clip(cos_a, -1.0, 1.0))
        d_sw = rodrigues(axis, alpha)
        R_local[k] = d_sw  # twist assumed zero (reference: D_tw = I)
        R[k] = jnp.einsum("bij,bjk->bik", R[pa], d_sw)

    pose = [r0] + [None] * 15
    for joint_id, slot in ID2ROT.items():
        pose[slot] = R_local[joint_id]
    return jnp.stack(pose, axis=1)
