"""Pinhole camera math, fully vectorized for TPU.

The reference loops over batch and views in Python
(src/utils/camera.py:25-44); here the whole multi-view reprojection is one
batched einsum chain so it stays inside the jitted graph (it sits on the
g2d/p2d loss path, src/models/handmvnet.py:323-342).

Conventions (identical to the reference):
  * intrinsics vector [fx, fy, cx, cy]
  * extrinsic T is camera->world (so world->camera uses T^-1)
  * projection adds epsilon=1e-6 to z (src/utils/camera.py:47-60)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def intrinsics_vec_to_matrix(intr: jax.Array) -> jax.Array:
    """[..., 4] [fx,fy,cx,cy] -> [..., 3, 3] K matrix. reference: src/utils/camera.py:108-125."""
    fx, fy, cx, cy = (intr[..., i] for i in range(4))
    zeros = jnp.zeros_like(fx)
    ones = jnp.ones_like(fx)
    rows = jnp.stack(
        [
            jnp.stack([fx, zeros, cx], axis=-1),
            jnp.stack([zeros, fy, cy], axis=-1),
            jnp.stack([zeros, zeros, ones], axis=-1),
        ],
        axis=-2,
    )
    return rows


def project_points(points: jax.Array, intr: jax.Array, epsilon: float = 1e-6) -> jax.Array:
    """Camera-space 3D -> image uvd. points: [..., N, 3], intr: [..., 4].

    Returns [..., N, 3] (u, v, z). reference: src/utils/camera.py:47-60.
    """
    z = points[..., 2] + epsilon
    u = points[..., 0] * intr[..., 0:1] / z + intr[..., 2:3]
    v = points[..., 1] * intr[..., 1:2] / z + intr[..., 3:4]
    return jnp.stack([u, v, points[..., 2]], axis=-1)


def unproject_points(uvd: jax.Array, intr: jax.Array) -> jax.Array:
    """Image uvd -> camera-space xyz. reference: src/utils/camera.py:63-72."""
    x = (uvd[..., 0] - intr[..., 2:3]) * uvd[..., 2] / intr[..., 0:1]
    y = (uvd[..., 1] - intr[..., 3:4]) * uvd[..., 2] / intr[..., 1:2]
    return jnp.stack([x, y, uvd[..., 2]], axis=-1)


def _to_homogeneous(points: jax.Array) -> jax.Array:
    return jnp.concatenate([points, jnp.ones_like(points[..., :1])], axis=-1)


def rigid_inverse(t: jax.Array) -> jax.Array:
    """Closed-form inverse of [..., 4, 4] rigid (SE(3)) transforms:
    inv([[R, t], [0, 1]]) = [[R^T, -R^T t], [0, 1]]. Exact, cheaper, and —
    unlike jnp.linalg.inv's batched LU — fusible into the surrounding einsum
    chain (this runs inside every g2d/p2d train step via reproject_to_views,
    losses.py)."""
    r = t[..., :3, :3]
    trans = t[..., :3, 3]
    rt = jnp.swapaxes(r, -1, -2)
    new_t = -jnp.einsum("...ij,...j->...i", rt, trans)
    out = jnp.zeros_like(t)
    out = out.at[..., :3, :3].set(rt)
    out = out.at[..., :3, 3].set(new_t)
    out = out.at[..., 3, 3].set(1.0)
    return out


def cam_to_world(points: jax.Array, t_cam2world: jax.Array) -> jax.Array:
    """points: [..., N, 3]; t_cam2world: [..., 4, 4]."""
    ph = _to_homogeneous(points)
    out = jnp.einsum("...ij,...nj->...ni", t_cam2world, ph)
    return out[..., :3]


def world_to_cam(points: jax.Array, t_cam2world: jax.Array) -> jax.Array:
    ph = _to_homogeneous(points)
    inv = rigid_inverse(t_cam2world)
    out = jnp.einsum("...ij,...nj->...ni", inv, ph)
    return out[..., :3]


def transform_between_cameras(
    points: jax.Array, src_extrinsic: jax.Array, dst_extrinsic: jax.Array
) -> jax.Array:
    """Move points from src camera frame to dst camera frame.

    points: [..., N, 3]; extrinsics: [..., 4, 4] camera->world.
    reference: src/utils/camera.py:4-22.
    """
    rel = jnp.einsum("...ij,...jk->...ik", rigid_inverse(dst_extrinsic), src_extrinsic)
    ph = _to_homogeneous(points)
    out = jnp.einsum("...ij,...nj->...ni", rel, ph)
    return out[..., :3]


def reproject_to_views(
    joints_3d: jax.Array,
    root_idx: int | jax.Array,
    intrinsics: jax.Array,
    extrinsics: jax.Array,
) -> jax.Array:
    """Project root-camera-frame 3D joints (meters) into every view's pixels.

    Vectorized replacement for the reference's double Python loop
    (src/utils/camera.py:25-44). Note the reference projects points in
    millimeters (joints * 1000); replicated here.

    Args:
      joints_3d: [B, N, 3] absolute joints in the root camera frame, meters.
      root_idx: index of the root view within extrinsics.
      intrinsics: [B, V, 4].
      extrinsics: [B, V, 4, 4] camera->world.

    Returns:
      [B, V, N, 2] pixel coordinates per view.
    """
    src = jnp.take(extrinsics, jnp.asarray(root_idx), axis=1)  # [B, 4, 4]
    # relative transform per view: inv(T_v) @ T_root (rigid closed form)
    rel = jnp.einsum("bvij,bjk->bvik", rigid_inverse(extrinsics), src)
    ph = _to_homogeneous(joints_3d)  # [B, N, 4]
    in_view = jnp.einsum("bvij,bnj->bvni", rel, ph)[..., :3]
    uvd = project_points(in_view * 1000.0, intrinsics)
    return uvd[..., :2]
