"""Joints (mm) -> MANO mesh, batched and fully on device.

Pipeline identical to the reference (src/models/joints_to_vertices.py:25-50):
  1. rigid SVD alignment of {wrist, middle_mcp, ring_mcp} onto the flat-hand
     MANO template,
  2. analytical IK -> 16 rotation matrices,
  3. MANO LBS forward -> 778 vertices,
  4. inverse rigid transform back to the prediction frame.

The reference runs this per sample in numpy on CPU *inside the benchmark's
timed region* (eval_fps.py:84-94); here it's one jitted batched function.

TPU structure: the alignment SVD and the IK's global-orientation SVD are
BATCHED INTO ONE 3x3 decomposition. Global rotations factor out of the bone
correlation — H_aligned = H_raw @ R_align^T implies
R0(aligned) = R_align @ R0(raw) — which halves the sequential depth of the
small-kernel chain (tests verify agreement with the unfused path).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from handmvnet_tpu.models.ik import _FINGER_ROOTS, adaptive_ik
from handmvnet_tpu.models.mano import ManoLayer
from handmvnet_tpu.ops.procrustes import rigid_align_3pt
from handmvnet_tpu.ops.small_linalg import det3, mm, mmt, mv
from handmvnet_tpu.ops.svd3 import svd3x3

_ALIGN_JOINTS = (0, 9, 13)  # wrist, middle_mcp, ring_mcp (reference :30-36)


def joints_to_vertices_fn(
    mano: ManoLayer, fast_svd: bool = True, fused_svd: bool = True
) -> Callable[[jax.Array], jax.Array]:
    """Returns a jittable fn: joints [B, 21, 3] (mm) -> verts [B, 778, 3] (mm).

    fast_svd=True uses the analytic 3x3 eigensolver without the Jacobi
    polish (~48 fewer tiny kernels per frame; rotation error <1e-3 on
    hand-geometry inputs — within the IK parity tolerance). fused_svd=True
    batches the alignment and orientation decompositions into one call.
    """
    # NUMPY constants, never device arrays: a jitted closure over a device
    # array forces a device->host read at lowering, which permanently
    # degrades relayed TPU transports (see bench.py / scripts/probe_slowmode.py).
    # As numpy they lower to embedded literals and static gathers.
    template = np.asarray(mano.joints_template())  # [21, 3] mm
    align_ids = np.asarray(_ALIGN_JOINTS)
    root_ids = np.asarray(_FINGER_ROOTS)
    polish = 0 if fast_svd else 2

    def inverse_transform(r, t, verts):
        # v' = R^-1 (v - t); R orthonormal so inverse == transpose
        return jnp.sum(r[:, None] * (verts - t[:, None, :, 0])[..., :, None], axis=-2)

    def fn_unfused(joints: jax.Array) -> jax.Array:
        pts = jnp.swapaxes(joints[:, align_ids, :], -1, -2)  # [B, 3, 3] columns
        tmpl_pts = template[align_ids].T  # [3, 3]
        r, t = rigid_align_3pt(pts, jnp.broadcast_to(tmpl_pts, pts.shape),
                               polish_sweeps=polish)
        aligned = mv(r[:, None], joints) + t[:, None, :, 0]
        pose = adaptive_ik(template, aligned, polish_sweeps=polish)
        verts, _ = mano(pose)
        return inverse_transform(r, t, verts)

    def fn_fused(joints: jax.Array) -> jax.Array:
        # --- correlation matrices for BOTH decompositions
        # (a) rigid alignment on the 3 anchor joints (as columns), centered
        a_pts = jnp.swapaxes(joints[:, align_ids, :], -1, -2)  # [B, 3, 3]
        b_pts = jnp.broadcast_to(template[align_ids].T, a_pts.shape)
        ca = a_pts.mean(axis=-1, keepdims=True)
        cb = b_pts.mean(axis=-1, keepdims=True)
        h_align = mmt(a_pts - ca, b_pts - cb)  # Am @ Bm^T
        # (b) global orientation on the raw (unaligned) root bones
        t_bones = (template[root_ids] - template[0]).T  # [3, 5]
        p_bones = jnp.swapaxes(joints[:, root_ids] - joints[:, :1], -1, -2)
        h_orient = jnp.sum(
            t_bones[None, :, None, :] * p_bones[:, None, :, :], axis=-1
        )  # T_0 @ P_0^T, [B, 3, 3]

        u, s, vt = svd3x3(
            jnp.stack([h_align, h_orient], axis=1), polish_sweeps=polish
        )  # [B, 2, 3, 3]

        # alignment rotation (reflection fix: flip the last right-singular
        # row when det < 0; reference misc.py:37-43)
        ua, vta = u[:, 0], vt[:, 0]
        r_a = mmt(jnp.swapaxes(vta, -1, -2), ua)  # V @ U^T
        det_a = det3(r_a)
        vta = vta.at[..., 2, :].multiply(jnp.where(det_a < 0, -1.0, 1.0)[..., None])
        r_a = mmt(jnp.swapaxes(vta, -1, -2), ua)
        t_a = -mm(r_a, ca) + cb  # [B, 3, 1]

        # raw global orientation (reference's near-reflection rule,
        # analytical_ik.py:92-99), composed: R0(aligned) = R_a @ R0(raw)
        uo, so, vto = u[:, 1], s[:, 1], vt[:, 1]
        vo = jnp.swapaxes(vto, -1, -2)
        r0_raw = mmt(vo, uo)
        det0 = det3(r0_raw)
        tiny_sv = jnp.any(jnp.abs(so) < 1e-4, axis=-1)
        flip = (jnp.abs(det0 + 1.0) < 1e-6) & tiny_sv
        vo = vo.at[..., :, 2].multiply(jnp.where(flip, -1.0, 1.0)[..., None])
        r0_raw = mmt(vo, uo)
        r0 = mm(r_a, r0_raw)

        aligned = mv(r_a[:, None], joints) + t_a[:, None, :, 0]
        pose = adaptive_ik(template, aligned, polish_sweeps=polish, r0=r0)
        verts, _ = mano(pose)
        return inverse_transform(r_a, t_a, verts)

    return fn_fused if fused_svd else fn_unfused
