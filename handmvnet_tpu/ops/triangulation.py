"""Multi-view DLT triangulation (classical baseline + dataset sanity checks).

reference: src/utils/triangulation.py (POEM-derived). Used by the reference's
notebooks to verify that triangulating GT 2D joints reproduces GT 3D joints
— the same invariant is a unit test here.

Conventions match the reference: Extrs are WORLD->CAMERA, the projection
matrix is K @ Extr[:3, :], homogeneous DLT rows are
x * M_row2 - M_row0 / y * M_row2 - M_row1, solved by SVD (null vector).

The RANSAC variant evaluates ALL camera combinations in one batched SVD
instead of a Python loop over iterations (reference loops host-side,
triangulation.py:36-56); argmax over inlier counts picks the winner.
"""

from __future__ import annotations

import itertools

import jax
import jax.numpy as jnp


def batch_triangulate_dlt(kp2ds: jax.Array, ks: jax.Array, extrs: jax.Array) -> jax.Array:
    """DLT triangulation, batched over B and J.

    Args:
      kp2ds: [B, N, J, 2] pixel keypoints per view.
      ks: [B, N, 3, 3] intrinsics.
      extrs: [B, N, 4, 4] world->camera extrinsics.

    Returns:
      [B, J, 3] world-space points.
    """
    b, n, j = kp2ds.shape[0], kp2ds.shape[1], kp2ds.shape[2]
    pmat = extrs[..., :3, :]  # [B, N, 3, 4]
    mmat = jnp.einsum("bnik,bnkl->bnil", ks, pmat)  # [B, N, 3, 4]

    pts = jnp.transpose(kp2ds, (0, 2, 1, 3))  # [B, J, N, 2]
    m = mmat[:, None]  # [B, 1, N, 3, 4]
    row2 = m[..., 2:3, :]  # [B, 1, N, 1, 4]
    a = pts[..., None] * row2 - m[..., :2, :]  # [B, J, N, 2, 4]
    a = a.reshape(b, j, 2 * n, 4)

    _, _, vt = jnp.linalg.svd(a)
    null = vt[..., -1, :]  # [B, J, 4]
    return null[..., :3] / (null[..., 3:] + 1e-7)


def reprojection_errors(
    x: jax.Array, kp2ds: jax.Array, mmat: jax.Array
) -> jax.Array:
    """x: [B, J, 3]; kp2ds: [B, N, J, 2]; mmat: [B, N, 3, 4] -> errors [B, N, J].

    reference: triangulation.py:61-95."""
    x_hom = jnp.concatenate([x, jnp.ones_like(x[..., :1])], axis=-1)
    proj = jnp.einsum("bnik,bjk->bnji", mmat, x_hom)
    cart = proj[..., :2] / proj[..., 2:3]
    return jnp.linalg.norm(kp2ds - cart, axis=-1)


def batch_triangulate_dlt_ransac(
    kp2ds: jax.Array,
    ks: jax.Array,
    extrs: jax.Array,
    n_cams: int = 3,
    n_iterations: int = 100,
    reprojection_threshold: float = 10.0,
) -> jax.Array:
    """RANSAC over camera subsets with inlier counting, fully batched.

    All C(total, n_cams) combinations (capped at n_iterations) are
    triangulated in one vmapped DLT; the per-joint hypothesis with the most
    inliers wins. Returns [B, J, 3].
    """
    total = kp2ds.shape[1]
    combos = list(itertools.combinations(range(total), n_cams))[:n_iterations]
    combo_idx = jnp.asarray(combos)  # [C, n_cams]

    pmat = extrs[..., :3, :]
    mmat = jnp.einsum("bnik,bnkl->bnil", ks, pmat)

    def hypothesis(cams):
        x = batch_triangulate_dlt(
            kp2ds[:, cams], ks[:, cams], extrs[:, cams]
        )  # [B, J, 3]
        err = reprojection_errors(x, kp2ds, mmat)  # [B, N, J]
        inliers = (err < reprojection_threshold).sum(axis=1)  # [B, J]
        return x, inliers

    xs, counts = jax.vmap(hypothesis)(combo_idx)  # [C, B, J, 3], [C, B, J]
    best = jnp.argmax(counts, axis=0)  # [B, J]
    chosen = jnp.take_along_axis(xs, best[None, ..., None], axis=0)[0]
    # reference parity (triangulation.py:61-95): best_X starts at zeros with
    # a strict > update, so a joint where NO hypothesis gains any inlier
    # returns (0,0,0), not an arbitrary hypothesis's solution
    any_inlier = counts.max(axis=0) > 0  # [B, J]
    return jnp.where(any_inlier[..., None], chosen, 0.0)


def triangulate_dlt_confident(
    pts: jax.Array,
    confis: jax.Array,
    ks: jax.Array,
    extrs: jax.Array,
    confi_thres: float = 0.5,
) -> jax.Array:
    """Confidence-weighted DLT: rows from low-confidence views are zeroed
    (weighting by a binary mask is the vectorized equivalent of the
    reference's per-joint camera selection loop, triangulation.py:205-242;
    if fewer than 2 views pass the threshold all views are used).

    pts: [N, J, 2]; confis: [N, J]; ks: [N, 3, 3]; extrs: [N, 4, 4].
    Returns [J, 3].
    """
    n, j = pts.shape[0], pts.shape[1]
    mask = confis > confi_thres  # [N, J]
    enough = mask.sum(axis=0) >= 2  # [J]
    mask = jnp.where(enough[None, :], mask, jnp.ones_like(mask))

    pmat = extrs[:, :3, :]
    mmat = jnp.einsum("nik,nkl->nil", ks, pmat)  # [N, 3, 4]
    ptsj = jnp.transpose(pts, (1, 0, 2))  # [J, N, 2]
    row2 = mmat[None, :, 2:3, :]
    a = ptsj[..., None] * row2 - mmat[None, :, :2, :]  # [J, N, 2, 4]
    a = a * jnp.transpose(mask, (1, 0))[..., None, None]
    a = a.reshape(j, 2 * n, 4)
    _, _, vt = jnp.linalg.svd(a)
    null = vt[..., -1, :]
    return null[..., :3] / (null[..., 3:] + 1e-7)
