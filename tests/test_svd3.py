"""Jacobi 3x3 SVD vs jnp.linalg.svd (gauge-invariant comparisons)."""

import numpy as np
import jax.numpy as jnp

from handmvnet_tpu.ops.svd3 import svd3x3, symeig3x3


def reconstruct(u, s, vt):
    return np.einsum("...ij,...j,...jk->...ik", np.asarray(u), np.asarray(s), np.asarray(vt))


class TestSvd3:
    def test_reconstruction_random(self, rng):
        h = rng.normal(size=(64, 3, 3)).astype(np.float32)
        u, s, vt = svd3x3(jnp.asarray(h))
        np.testing.assert_allclose(reconstruct(u, s, vt), h, atol=2e-5)
        # singular values match LAPACK
        s_ref = np.linalg.svd(h, compute_uv=False)
        np.testing.assert_allclose(np.asarray(s), s_ref, atol=2e-5)
        # orthogonality
        utu = np.einsum("...ji,...jk->...ik", np.asarray(u), np.asarray(u))
        np.testing.assert_allclose(utu, np.broadcast_to(np.eye(3), utu.shape), atol=2e-5)

    def test_near_rank_deficient(self, rng):
        a = rng.normal(size=(8, 3, 1))
        b = rng.normal(size=(8, 1, 3))
        h = (a @ b + 1e-4 * rng.normal(size=(8, 3, 3))).astype(np.float32)
        u, s, vt = svd3x3(jnp.asarray(h))
        # fp32 + sigma_2/3 ~ 1e-4: reconstruction error rides the tiny
        # singular values; hand-geometry inputs are far better conditioned
        np.testing.assert_allclose(reconstruct(u, s, vt), h, atol=1e-3)
        utu = np.einsum("...ji,...jk->...ik", np.asarray(u), np.asarray(u))
        np.testing.assert_allclose(utu, np.broadcast_to(np.eye(3), utu.shape), atol=1e-3)

    def test_symeig(self, rng):
        m = rng.normal(size=(16, 3, 3)).astype(np.float32)
        a = np.einsum("...ji,...jk->...ik", m, m)
        w, v = symeig3x3(jnp.asarray(a))
        w_ref = np.sort(np.linalg.eigvalsh(a), axis=-1)[..., ::-1]
        np.testing.assert_allclose(np.asarray(w), w_ref, rtol=1e-4, atol=1e-4)
        # A v = w v
        av = np.einsum("...ij,...jk->...ik", a, np.asarray(v))
        wv = np.asarray(v) * np.asarray(w)[..., None, :]
        np.testing.assert_allclose(av, wv, atol=1e-3)


class TestDegenerateInputs:
    def test_zero_matrix_no_nan(self):
        """H = 0 (all points collapsed to one location) must return a finite
        orthogonal U with s = 0, like numpy's SVD — not 0/0 NaNs that poison
        pa_mpjpe epoch sums."""
        import jax.numpy as jnp

        from handmvnet_tpu.ops.svd3 import svd3x3

        u, s, vt = svd3x3(jnp.zeros((2, 3, 3)))
        assert np.isfinite(np.asarray(u)).all()
        assert np.allclose(np.asarray(s), 0.0)
        ortho = np.einsum("bij,bkj->bik", np.asarray(u), np.asarray(u))
        assert np.allclose(ortho, np.eye(3), atol=1e-5)

    def test_constant_predictions_pa_mpjpe_finite(self):
        import jax.numpy as jnp

        from handmvnet_tpu import metrics as M

        pred = jnp.ones((2, 21, 3)) * 0.1  # zero variance
        gt = jnp.asarray(np.random.default_rng(0).normal(size=(2, 21, 3)) * 0.03)
        val = float(M.pa_mpjpe(pred, gt))
        assert np.isfinite(val)

    def test_rank1_no_nan(self):
        """Rank-1 H (points on a line): s1 = s2 = 0 columns need the
        orthogonal-completion fallback."""
        import jax.numpy as jnp

        from handmvnet_tpu.ops.svd3 import svd3x3

        a = jnp.asarray([[1.0, 2.0, 3.0]])
        h = a[:, :, None] * a[:, None, :]  # rank 1
        u, s, vt = svd3x3(h)
        assert np.isfinite(np.asarray(u)).all()
        rec = np.asarray(u) @ np.diag(np.asarray(s)[0]) @ np.asarray(vt)[0]
        assert np.allclose(rec, np.asarray(h)[0], atol=2e-3)  # fp32 roundoff at |h|~9


class TestDegenerateSpectra:
    """Scalar/zero H^T H (repeated eigenvalues): V must stay orthonormal —
    the analytic eigenvector picks collapse onto one direction there, and a
    rank-1 V reconstructs silently-wrong alignments (no NaN to flag it)."""

    def _check(self, h):
        import jax.numpy as jnp

        from handmvnet_tpu.ops.svd3 import svd3x3

        u, s, vt = svd3x3(jnp.asarray(h, jnp.float32))
        u, s, vt = np.asarray(u), np.asarray(s), np.asarray(vt)
        np.testing.assert_allclose(u @ u.T, np.eye(3), atol=1e-5)
        np.testing.assert_allclose(vt @ vt.T, np.eye(3), atol=1e-5)
        np.testing.assert_allclose(u @ np.diag(s) @ vt, h, atol=1e-5)

    def test_identity(self):
        self._check(np.eye(3, dtype=np.float32))

    def test_scaled_rotation(self):
        q, _ = np.linalg.qr(np.random.default_rng(3).normal(size=(3, 3)))
        if np.linalg.det(q) < 0:
            q[:, 0] *= -1
        self._check((0.37 * q).astype(np.float32))

    def test_zero(self):
        self._check(np.zeros((3, 3), np.float32))

    def test_two_equal_singular_values(self):
        self._check(np.diag([2.0, 2.0, 0.5]).astype(np.float32))
