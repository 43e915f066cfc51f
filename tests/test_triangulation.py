"""Triangulation invariants: projecting known 3D points to multiple views and
triangulating reproduces them (the reference's notebook sanity check), incl.
under outlier corruption for RANSAC."""

import numpy as np
import jax.numpy as jnp

from handmvnet_tpu.ops.triangulation import (
    batch_triangulate_dlt,
    batch_triangulate_dlt_ransac,
    triangulate_dlt_confident,
)


def make_scene(rng, b=2, n=5, j=21):
    pts3d = rng.normal(size=(b, j, 3)).astype(np.float64) * 0.1 + [0, 0, 0.6]
    ks = np.tile(np.array([[600.0, 0, 320], [0, 600.0, 240], [0, 0, 1]]), (b, n, 1, 1))
    extrs = np.tile(np.eye(4), (b, n, 1, 1))
    for i in range(n):
        angle = 0.3 * i
        rot = np.array(
            [
                [np.cos(angle), 0, np.sin(angle)],
                [0, 1, 0],
                [-np.sin(angle), 0, np.cos(angle)],
            ]
        )
        extrs[:, i, :3, :3] = rot
        extrs[:, i, :3, 3] = [0.05 * i, 0.02 * i, 0.1 * i]
    # project: x_cam = Extr @ [X;1]; uv = K x_cam
    hom = np.concatenate([pts3d, np.ones((b, j, 1))], axis=-1)
    cam = np.einsum("bnik,bjk->bnji", extrs[..., :3, :], hom)
    uv = np.einsum("bnik,bnjk->bnji", ks, cam)
    kp2d = uv[..., :2] / uv[..., 2:3]
    return pts3d, kp2d.astype(np.float32), ks.astype(np.float32), extrs.astype(np.float32)


class TestDLT:
    def test_exact_recovery(self, rng):
        pts3d, kp2d, ks, extrs = make_scene(rng)
        x = np.asarray(batch_triangulate_dlt(jnp.asarray(kp2d), jnp.asarray(ks), jnp.asarray(extrs)))
        np.testing.assert_allclose(x, pts3d, atol=1e-3)

    def test_ransac_rejects_outliers(self, rng):
        pts3d, kp2d, ks, extrs = make_scene(rng, n=5)
        corrupted = kp2d.copy()
        corrupted[:, 1] += 300.0  # one wildly wrong camera
        x = np.asarray(
            batch_triangulate_dlt_ransac(
                jnp.asarray(corrupted), jnp.asarray(ks), jnp.asarray(extrs),
                n_cams=3, reprojection_threshold=5.0,
            )
        )
        np.testing.assert_allclose(x, pts3d, atol=5e-3)

    def test_confidence_weighted(self, rng):
        pts3d, kp2d, ks, extrs = make_scene(rng, b=1)
        corrupted = kp2d[0].copy()
        corrupted[2] += 200.0
        confis = np.ones((5, 21), dtype=np.float32)
        confis[2] = 0.0  # flag the bad camera
        x = np.asarray(
            triangulate_dlt_confident(
                jnp.asarray(corrupted), jnp.asarray(confis),
                jnp.asarray(ks[0]), jnp.asarray(extrs[0]),
            )
        )
        np.testing.assert_allclose(x, pts3d[0], atol=1e-3)
