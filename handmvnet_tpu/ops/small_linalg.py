"""Tiny-matrix linear algebra as fusible elementwise ops.

XLA lowers each jnp.einsum/dot on a [..., 3, 3] operand to its own (MXU)
kernel; the mesh-recovery pipeline chains ~25 of them, so per-kernel launch
latency dominates its runtime. Expressing these 3x3/4x4 products as
broadcast-multiply + reduce keeps them on the VPU where XLA fuses whole
chains into single kernels — semantics identical, kernel count collapses.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def mm(a: jax.Array, b: jax.Array) -> jax.Array:
    """Matmul over trailing [..., n, k] @ [..., k, m] via broadcast-sum
    (use only for tiny n/k/m — 3 or 4)."""
    return jnp.sum(a[..., :, :, None] * b[..., None, :, :], axis=-2)


def mtm(a: jax.Array, b: jax.Array) -> jax.Array:
    """a^T @ b over trailing dims: [..., k, n]^T @ [..., k, m]."""
    return jnp.sum(a[..., :, :, None] * b[..., :, None, :], axis=-3)


def mmt(a: jax.Array, b: jax.Array) -> jax.Array:
    """a @ b^T over trailing dims: [..., n, k] @ [..., m, k]^T."""
    return jnp.sum(a[..., :, None, :] * b[..., None, :, :], axis=-1)


def mv(a: jax.Array, v: jax.Array) -> jax.Array:
    """Matvec over trailing dims: [..., n, k] @ [..., k]."""
    return jnp.sum(a * v[..., None, :], axis=-1)


def mtv(a: jax.Array, v: jax.Array) -> jax.Array:
    """a^T @ v over trailing dims: [..., k, n]^T @ [..., k]."""
    return jnp.sum(a * v[..., :, None], axis=-2)


def det3(a: jax.Array) -> jax.Array:
    """Determinant of [..., 3, 3] (closed form, fusible)."""
    a00, a01, a02 = a[..., 0, 0], a[..., 0, 1], a[..., 0, 2]
    a10, a11, a12 = a[..., 1, 0], a[..., 1, 1], a[..., 1, 2]
    a20, a21, a22 = a[..., 2, 0], a[..., 2, 1], a[..., 2, 2]
    return (
        a00 * (a11 * a22 - a12 * a21)
        - a01 * (a10 * a22 - a12 * a20)
        + a02 * (a10 * a21 - a11 * a20)
    )
