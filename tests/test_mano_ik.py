"""MANO layer + analytical IK tests.

The reference IK (src/utils/analytical_ik.py) is imported as the oracle with
transforms3d stubbed by a plain-numpy Rodrigues (identical math)."""

import sys
import types

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from handmvnet_tpu.models.ik import adaptive_ik, rodrigues
from handmvnet_tpu.models.mano import ManoLayer, synthetic_mano_model
from handmvnet_tpu.models.joints_to_vertices import joints_to_vertices_fn


def _np_axangle2mat(axis, angle, is_normalized=False):
    axis = np.asarray(axis, dtype=np.float64)
    if not is_normalized:
        axis = axis / (np.linalg.norm(axis) or 1.0)
    x, y, z = axis
    c, s = np.cos(angle), np.sin(angle)
    C = 1 - c
    return np.array(
        [
            [x * x * C + c, x * y * C - z * s, x * z * C + y * s],
            [y * x * C + z * s, y * y * C + c, y * z * C - x * s],
            [z * x * C - y * s, z * y * C + x * s, z * z * C + c],
        ]
    )


def _import_reference_ik():
    if "transforms3d" not in sys.modules:
        t3d = types.ModuleType("transforms3d")
        axangles = types.ModuleType("transforms3d.axangles")
        axangles.axangle2mat = lambda axis, angle, is_normalized=False: _np_axangle2mat(
            np.asarray(axis).reshape(-1), float(np.asarray(angle).reshape(-1)[0]) if np.asarray(angle).size else 0.0, is_normalized
        )
        t3d.axangles = axangles
        sys.modules["transforms3d"] = t3d
        sys.modules["transforms3d.axangles"] = axangles
    if "/root/reference/src" not in sys.path:
        sys.path.insert(0, "/root/reference/src")
    from utils.analytical_ik import adaptive_IK as reference_adaptive_IK

    return reference_adaptive_IK


class TestRodrigues:
    def test_matches_numpy_formula(self, rng):
        for _ in range(5):
            axis = rng.normal(size=3)
            angle = rng.uniform(0, np.pi)
            ours = np.asarray(rodrigues(jnp.asarray(axis, dtype=jnp.float32), jnp.asarray(angle, dtype=jnp.float32)))
            oracle = _np_axangle2mat(axis, angle)
            np.testing.assert_allclose(ours, oracle, atol=1e-5)

    def test_identity_at_zero(self):
        out = np.asarray(rodrigues(jnp.asarray([1.0, 0.0, 0.0]), jnp.asarray(0.0)))
        np.testing.assert_allclose(out, np.eye(3), atol=1e-7)


def make_hand_like_joints(rng, template, jitter=3.0):
    """Plausible hand: template joints + small noise (mm)."""
    noise = rng.normal(size=template.shape) * jitter
    noise[0] = 0
    return (template + noise).astype(np.float32)


class TestAdaptiveIK:
    def test_matches_reference(self, rng):
        reference_ik = _import_reference_ik()
        mano = ManoLayer(synthetic_mano_model())
        template = mano.joints_template().astype(np.float64)

        targets = np.stack([make_hand_like_joints(rng, template) for _ in range(4)])
        ours = np.asarray(adaptive_ik(jnp.asarray(template, dtype=jnp.float32), jnp.asarray(targets)))

        for i in range(targets.shape[0]):
            oracle = reference_ik(template.astype(np.float32), targets[i])[0]
            np.testing.assert_allclose(ours[i], oracle, atol=2e-3)

    def test_identity_for_template(self):
        mano = ManoLayer(synthetic_mano_model())
        template = mano.joints_template()
        pose = np.asarray(adaptive_ik(jnp.asarray(template), jnp.asarray(template[None])))
        np.testing.assert_allclose(pose[0], np.tile(np.eye(3), (16, 1, 1)), atol=1e-3)


class TestManoLayer:
    def test_identity_pose_reproduces_template(self):
        mano = ManoLayer(synthetic_mano_model())
        eye = jnp.broadcast_to(jnp.eye(3), (2, 16, 3, 3))
        verts, joints = mano(eye)
        assert verts.shape == (2, 778, 3)
        assert joints.shape == (2, 21, 3)
        # joint markers sit exactly at regressed joints -> template round-trips
        np.testing.assert_allclose(
            np.asarray(joints[0]), mano.joints_template(), atol=1e-3
        )

    def test_global_rotation_equivariance(self, rng):
        mano = ManoLayer(synthetic_mano_model())
        q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
        if np.linalg.det(q) < 0:
            q[:, 0] *= -1
        pose_id = np.tile(np.eye(3), (1, 16, 1, 1)).astype(np.float32)
        pose_rot = pose_id.copy()
        pose_rot[0, 0] = q
        v_id, j_id = mano(jnp.asarray(pose_id))
        v_rot, j_rot = mano(jnp.asarray(pose_rot))
        # rotation about the wrist joint (root of the kinematic chain)
        j0 = np.asarray(j_id[0, 0])
        expect = (np.asarray(v_id[0]) - j0) @ q.T + j0
        np.testing.assert_allclose(np.asarray(v_rot[0]), expect, atol=1e-2)

    def test_betas_shift_vertices(self, rng):
        mano = ManoLayer(synthetic_mano_model())
        eye = jnp.broadcast_to(jnp.eye(3), (1, 16, 3, 3))
        v0, _ = mano(eye)
        v1, _ = mano(eye, betas=jnp.ones((1, 10)))
        assert float(jnp.abs(v1 - v0).max()) > 0


class TestJointsToVertices:
    def test_recovers_identity_mesh(self):
        mano = ManoLayer(synthetic_mano_model())
        j2v = jax.jit(joints_to_vertices_fn(mano))
        template = mano.joints_template()
        verts = np.asarray(j2v(jnp.asarray(template[None])))
        eye = jnp.broadcast_to(jnp.eye(3), (1, 16, 3, 3))
        expect, _ = mano(eye)
        np.testing.assert_allclose(verts[0], np.asarray(expect[0]) , atol=0.5)  # mm

    def test_batched_and_finite(self, rng):
        mano = ManoLayer(synthetic_mano_model())
        j2v = jax.jit(joints_to_vertices_fn(mano))
        template = mano.joints_template()
        joints = np.stack([make_hand_like_joints(rng, template) for _ in range(3)])
        verts = np.asarray(j2v(jnp.asarray(joints)))
        assert verts.shape == (3, 778, 3)
        assert np.isfinite(verts).all()


class TestFusedJ2V:
    def test_fused_matches_unfused(self, rng):
        """The batched-SVD path must reproduce the sequential path (the
        polar-factor identity R0(aligned) = R_align @ R0(raw))."""
        mano = ManoLayer(synthetic_mano_model())
        template = mano.joints_template()
        joints = np.stack([make_hand_like_joints(rng, template, jitter=5.0)
                           for _ in range(4)])
        # random rigid transform so alignment is non-trivial
        q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
        q *= np.sign(np.linalg.det(q))
        joints = joints @ q.T + rng.normal(size=3) * 30.0

        fused = jax.jit(joints_to_vertices_fn(mano, fused_svd=True))
        unfused = jax.jit(joints_to_vertices_fn(mano, fused_svd=False))
        vf = np.asarray(fused(jnp.asarray(joints, dtype=jnp.float32)))
        vu = np.asarray(unfused(jnp.asarray(joints, dtype=jnp.float32)))
        np.testing.assert_allclose(vf, vu, atol=0.1)  # mm
