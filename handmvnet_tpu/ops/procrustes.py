"""Procrustes / rigid alignment (batched, XLA SVD).

  * similarity_align: batched similarity (scale+R+t) transform used by
    PA-MPJPE; reference: src/models/metrics.py:127-176 (hamer-derived).
  * rigid_align_3pt: rigid (R, t) between two 3xN point sets used to place
    predicted joints onto the MANO template frame;
    reference: src/utils/misc.py:10-47.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from handmvnet_tpu.ops.svd3 import svd3x3
from handmvnet_tpu.ops.small_linalg import det3, mm, mmt, mtm


def similarity_align(s1: jax.Array, s2: jax.Array) -> jax.Array:
    """Align s1 to s2 with the optimal similarity transform (batched).

    s1, s2: [B, N, 3]. Returns transformed s1, [B, N, 3].
    """
    x1 = jnp.swapaxes(s1, -1, -2)  # [B, 3, N]
    x2 = jnp.swapaxes(s2, -1, -2)
    mu1 = x1.mean(axis=-1, keepdims=True)
    mu2 = x2.mean(axis=-1, keepdims=True)
    x1c = x1 - mu1
    x2c = x2 - mu2
    var1 = jnp.sum(x1c**2, axis=(-1, -2))

    k = jnp.einsum("...in,...jn->...ij", x1c, x2c)  # [B, 3, 3]
    u, _, vt = svd3x3(k)  # fixed-iteration Jacobi; QDWH is while-loop-heavy on TPU
    v = jnp.swapaxes(vt, -1, -2)
    det = jnp.linalg.det(jnp.einsum("...ij,...kj->...ik", u, v))  # det(U V^T)
    z = jnp.broadcast_to(jnp.eye(3, dtype=s1.dtype), k.shape).copy()
    z = z.at[..., -1, -1].set(jnp.sign(det))
    r = jnp.einsum("...ij,...jk,...lk->...il", v, z, u)  # V Z U^T

    trace = jnp.einsum("...ij,...ji->...", r, k)
    scale = (trace / var1)[..., None, None]
    t = mu2 - scale * jnp.einsum("...ij,...jk->...ik", r, mu1)
    s1_hat = scale * jnp.einsum("...ij,...jn->...in", r, x1c + mu1) + t
    return jnp.swapaxes(s1_hat, -1, -2)


def rigid_align_3pt(
    a: jax.Array, b: jax.Array, polish_sweeps: int = 2
) -> tuple[jax.Array, jax.Array]:
    """Optimal rigid (R, t) mapping column point-set a onto b.

    a, b: [..., 3, N] (points as columns, like the reference).
    Returns (R [..., 3, 3], t [..., 3, 1]) with the reflection fix applied
    via sign flip of the last right-singular row when det < 0.
    """
    ca = a.mean(axis=-1, keepdims=True)
    cb = b.mean(axis=-1, keepdims=True)
    am = a - ca
    bm = b - cb
    h = mmt(am, bm)  # Am @ Bm^T over point columns
    u, _, vt = svd3x3(h, polish_sweeps=polish_sweeps)
    r = mtm(vt, jnp.swapaxes(u, -1, -2))  # Vt^T @ U^T
    det = det3(r)
    vt_fixed = vt.at[..., 2, :].multiply(jnp.where(det < 0, -1.0, 1.0)[..., None])
    r = mtm(vt_fixed, jnp.swapaxes(u, -1, -2))
    t = -mm(r, ca) + cb
    return r, t
