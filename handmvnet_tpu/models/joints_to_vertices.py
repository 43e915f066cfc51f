"""Joints (mm) -> MANO mesh, batched and fully on device.

Pipeline identical to the reference (src/models/joints_to_vertices.py:25-50):
  1. rigid SVD alignment of {wrist, middle_mcp, ring_mcp} onto the flat-hand
     MANO template,
  2. analytical IK -> 16 rotation matrices,
  3. MANO LBS forward -> 778 vertices,
  4. inverse rigid transform back to the prediction frame.

The reference runs this per sample in numpy on CPU *inside the benchmark's
timed region* (eval_fps.py:84-94); here it's one jitted batched function.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from handmvnet_tpu.models.ik import adaptive_ik
from handmvnet_tpu.models.mano import ManoLayer
from handmvnet_tpu.ops.procrustes import rigid_align_3pt

_ALIGN_JOINTS = (0, 9, 13)  # wrist, middle_mcp, ring_mcp (reference :30-36)


def joints_to_vertices_fn(
    mano: ManoLayer, fast_svd: bool = True
) -> Callable[[jax.Array], jax.Array]:
    """Returns a jittable fn: joints [B, 21, 3] (mm) -> verts [B, 778, 3] (mm).

    fast_svd=True uses the analytic 3x3 eigensolver without the Jacobi
    polish (~48 fewer tiny kernels per frame; rotation error <1e-3 on
    hand-geometry inputs — within the IK parity tolerance). Set False for
    maximum numerical robustness."""
    template = jnp.asarray(mano.joints_template())  # [21, 3] mm
    align_ids = jnp.asarray(_ALIGN_JOINTS)

    polish = 0 if fast_svd else 2

    def fn(joints: jax.Array) -> jax.Array:
        pts = jnp.swapaxes(joints[:, align_ids, :], -1, -2)  # [B, 3, 3] columns
        tmpl_pts = template[align_ids].T  # [3, 3]
        r, t = rigid_align_3pt(pts, jnp.broadcast_to(tmpl_pts, pts.shape),
                               polish_sweeps=polish)
        aligned = jnp.einsum("bij,bnj->bni", r, joints) + t[:, None, :, 0]
        pose = adaptive_ik(template, aligned, polish_sweeps=polish)
        verts, _ = mano(pose)
        # invert the rigid transform: v' = R^-1 (v - t)
        return jnp.einsum("bji,bnj->bni", r, verts - t[:, None, :, 0])

    return fn
