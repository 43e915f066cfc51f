"""Closed-form batched 3x3 SVD, TPU-friendly.

XLA lowers jnp.linalg.svd on TPU to an iterative QDWH algorithm with
while-loops — dozens of sequential kernels for a 3x3 problem. The hand
pipeline only ever decomposes 3x3 correlation matrices (Procrustes/IK), so
this analytic eigendecomposition of A^T A (trigonometric cubic-root formula
+ cross-product eigenvectors: ~20 fused elementwise ops, zero matmuls, no
control flow) replaces it on the hot path. Fully batched and differentiable.

Accuracy: ~1e-5 relative on well-conditioned inputs (tests compare against
jnp.linalg.svd); hand-geometry correlation matrices are far from the
pathological repeated-singular-value cases, and near-degenerate directions
fall back to cross-product completion.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from handmvnet_tpu.ops.small_linalg import mtm, mm


def _eigvals_sym3x3(a: jax.Array) -> jax.Array:
    """Analytic eigenvalues of symmetric [..., 3, 3], descending (Smith's
    trigonometric method)."""
    a00, a11, a22 = a[..., 0, 0], a[..., 1, 1], a[..., 2, 2]
    a01, a02, a12 = a[..., 0, 1], a[..., 0, 2], a[..., 1, 2]
    q = (a00 + a11 + a22) / 3.0
    p1 = a01 * a01 + a02 * a02 + a12 * a12
    d0, d1, d2 = a00 - q, a11 - q, a22 - q
    p2 = d0 * d0 + d1 * d1 + d2 * d2 + 2.0 * p1
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 1e-30))
    # det((A - qI) / p) / 2
    b00, b11, b22 = d0 / p, d1 / p, d2 / p
    b01, b02, b12 = a01 / p, a02 / p, a12 / p
    detb = (
        b00 * (b11 * b22 - b12 * b12)
        - b01 * (b01 * b22 - b12 * b02)
        + b02 * (b01 * b12 - b11 * b02)
    )
    r = jnp.clip(detb / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    e1 = q + 2.0 * p * jnp.cos(phi)
    e3 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    e2 = 3.0 * q - e1 - e3
    degenerate = p2 < 1e-20  # scalar matrix: all eigenvalues q
    return jnp.where(
        degenerate[..., None],
        jnp.stack([q, q, q], axis=-1),
        jnp.stack([e1, e2, e3], axis=-1),
    )


def _eigvec_for(a: jax.Array, lam: jax.Array) -> jax.Array:
    """Eigenvector of symmetric A for eigenvalue lam via row cross products
    of (A - lam I) — the nullspace direction (largest of the three candidate
    cross products wins for robustness)."""
    m = a - lam[..., None, None] * jnp.eye(3, dtype=a.dtype)
    r0, r1, r2 = m[..., 0, :], m[..., 1, :], m[..., 2, :]
    c01 = jnp.cross(r0, r1)
    c02 = jnp.cross(r0, r2)
    c12 = jnp.cross(r1, r2)
    n01 = jnp.sum(c01 * c01, axis=-1, keepdims=True)
    n02 = jnp.sum(c02 * c02, axis=-1, keepdims=True)
    n12 = jnp.sum(c12 * c12, axis=-1, keepdims=True)
    best = jnp.where(n01 >= n02, c01, c02)
    best_n = jnp.maximum(n01, n02)
    best = jnp.where(best_n >= n12, best, c12)
    norm = jnp.linalg.norm(best, axis=-1, keepdims=True)
    # fully degenerate: any unit vector is an eigenvector
    fallback = jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0], a.dtype), best.shape)
    return jnp.where(norm > 1e-20, best / jnp.maximum(norm, 1e-30), fallback)


def _jacobi_polish(a: jax.Array, v: jax.Array, sweeps: int = 2):
    """A few unrolled Jacobi sweeps to clean up fp32 cancellation from the
    analytic solve (quadratic convergence: 2 sweeps from a good init reach
    machine precision)."""
    eye = jnp.eye(3, dtype=a.dtype)
    for _ in range(sweeps):
        for p, q in ((0, 1), (0, 2), (1, 2)):
            theta = 0.5 * jnp.arctan2(
                2.0 * a[..., p, q], a[..., p, p] - a[..., q, q]
            )
            c, s = jnp.cos(theta), jnp.sin(theta)
            g = jnp.broadcast_to(eye, a.shape)
            g = g.at[..., p, p].set(c).at[..., q, q].set(c)
            g = g.at[..., p, q].set(-s).at[..., q, p].set(s)
            a = jnp.einsum("...ji,...jk,...kl->...il", g, a, g)
            v = jnp.einsum("...ij,...jk->...ik", v, g)
    return a, v


def symeig3x3(a: jax.Array, polish_sweeps: int = 2):
    """Eigendecomposition of symmetric [..., 3, 3]: returns (eigvals desc,
    eigvecs as columns). Analytic closed-form init + a short Jacobi polish
    in the eigenbasis (set polish_sweeps=0 for the pure-VPU fast path)."""
    w = _eigvals_sym3x3(a)
    v0 = _eigvec_for(a, w[..., 0])
    v2 = _eigvec_for(a, w[..., 2])
    # middle eigenvector: orthogonal completion (exact for symmetric A)
    v2 = v2 - jnp.sum(v2 * v0, axis=-1, keepdims=True) * v0
    n2 = jnp.linalg.norm(v2, axis=-1, keepdims=True)
    # repeated/degenerate eigenvalues (scalar A, H^T H = c*I, H ~ 0): both
    # analytic eigenvectors collapse onto the same direction and the
    # projection above is ~0 — complete an orthonormal basis from the
    # coordinate axis least aligned with v0 instead of emitting a rank-1 V
    axis_x = jnp.zeros_like(v0).at[..., 0].set(1.0)
    axis_y = jnp.zeros_like(v0).at[..., 1].set(1.0)
    alt = jnp.where(jnp.abs(v0[..., 0:1]) < 0.9, axis_x, axis_y)
    alt = alt - jnp.sum(alt * v0, axis=-1, keepdims=True) * v0
    alt = alt / jnp.maximum(jnp.linalg.norm(alt, axis=-1, keepdims=True), 1e-30)
    # sanitize the denominator BEFORE dividing: with jnp.maximum(n2, 1e-30)
    # the unselected branch still computes v2/n2 whose VJP is ~1/n2^2 — inf
    # in f32 when n2 underflows, and inf*0 through the where poisons
    # gradients if this is ever differentiated (e.g. a procrustes loss)
    degenerate = n2 <= 1e-3
    safe_n2 = jnp.where(degenerate, 1.0, n2)
    v2 = jnp.where(degenerate, alt, v2 / safe_n2)
    v1 = jnp.cross(v2, v0)
    v = jnp.stack([v0, v1, v2], axis=-1)
    if polish_sweeps:
        a_rot = jnp.einsum("...ji,...jk,...kl->...il", v, a, v)
        a_rot, v = _jacobi_polish(a_rot, v, polish_sweeps)
        w = jnp.stack([a_rot[..., 0, 0], a_rot[..., 1, 1], a_rot[..., 2, 2]], axis=-1)
        # polish preserves the (descending) order from the analytic init up to
        # roundoff; enforce it pairwise without argsort/gather
        for i, j in ((0, 1), (1, 2), (0, 1)):
            swap = w[..., i] < w[..., j]
            wi, wj = w[..., i], w[..., j]
            w = w.at[..., i].set(jnp.where(swap, wj, wi)).at[..., j].set(
                jnp.where(swap, wi, wj))
            vi, vj = v[..., :, i], v[..., :, j]
            v = v.at[..., :, i].set(jnp.where(swap[..., None], vj, vi))
            v = v.at[..., :, j].set(jnp.where(swap[..., None], vi, vj))
    return w, v


def svd3x3(h: jax.Array, polish_sweeps: int = 2):
    """SVD of [..., 3, 3]: returns (u, s, vt) with s descending,
    h = u @ diag(s) @ vt. Matches jnp.linalg.svd up to column-sign gauge."""
    hth = mtm(h, h)  # H^T H (symmetric PSD), fusible broadcast-sum
    w, v = symeig3x3(hth, polish_sweeps=polish_sweeps)
    s = jnp.sqrt(jnp.maximum(w, 0.0))
    u_raw = mm(h, v)  # H V = U S
    # normalize columns; for (near-)zero singular values fall back to an
    # orthogonal completion via double cross product
    # Gram-Schmidt polish: close singular values leave H V /s columns a few
    # ulps off orthogonal in fp32
    def unit(x, fallback):
        # safe normalization: a (near-)zero column — H itself ~0, e.g. all
        # points collapsed to one location — must yield an arbitrary
        # orthonormal completion like numpy's SVD, not 0/0 = NaN (which
        # would poison pa_mpjpe epoch sums and the IK alignment)
        n = jnp.linalg.norm(x, axis=-1, keepdims=True)
        ok = n > 1e-20
        return jnp.where(ok, x / jnp.where(ok, n, 1.0), fallback)

    e0 = jnp.zeros_like(u_raw[..., :, 0]).at[..., 0].set(1.0)
    u0 = u_raw[..., :, 0] / jnp.maximum(s[..., 0:1], 1e-12)
    u0 = unit(u0, e0)
    u1 = u_raw[..., :, 1] / jnp.maximum(s[..., 1:2], 1e-12)
    u1 = u1 - jnp.sum(u1 * u0, axis=-1, keepdims=True) * u0
    # fallback orthogonal to u0: cross with the axis least aligned with it
    ey = jnp.zeros_like(u0).at[..., 1].set(1.0)
    ez = jnp.zeros_like(u0).at[..., 2].set(1.0)
    alt = jnp.where(jnp.abs(u0[..., 2:3]) > 0.9, ey, ez)
    u1_fb = jnp.cross(u0, alt)
    u1_fb = u1_fb / jnp.linalg.norm(u1_fb, axis=-1, keepdims=True)
    u1 = unit(u1, u1_fb)
    u2_cross = jnp.cross(u0, u1)
    u2_raw = u_raw[..., :, 2] / jnp.maximum(s[..., 2:3], 1e-12)
    # keep the raw column's orientation; use the cross product's direction
    sign = jnp.where(jnp.sum(u2_cross * u2_raw, axis=-1, keepdims=True) < 0, -1.0, 1.0)
    degenerate = (s[..., 2] < 1e-7 * jnp.maximum(s[..., 0], 1e-30))[..., None]
    u2 = jnp.where(degenerate, u2_cross, u2_cross * sign)
    u = jnp.stack([u0, u1, u2], axis=-1)
    vt = jnp.swapaxes(v, -1, -2)
    return u, s, vt
