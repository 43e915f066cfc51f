"""First-party JAX MANO layer: linear blend skinning fully on device.

The reference calls the external ``manopth.ManoLayer`` per sample on CPU
inside its metric/benchmark loops (reference: src/models/joints_to_vertices.py:14-23,
src/eval_fps.py:84-94). Here LBS is batched jnp — a handful of [778,*]
matmuls — so mesh recovery jits into the same XLA program as the network.

Semantics follow the MANO model (rotmat mode, flat_hand_mean, no PCA):
  v_shaped = v_template + shapedirs . betas
  J        = J_regressor @ v_shaped                       (16 joints)
  v_posed  = v_shaped + posedirs . vec(R_{1..15} - I)
  world[k] = world[parent] @ [R_k | J_k - J_parent]
  verts    = sum_k w_k * world'[k] @ v_posed              (LBS)
  joints   = 16 skeletal + 5 fingertip vertices, reordered to the 21-joint
             Mediapipe layout, scaled to millimeters (manopth convention).

Model data loads from the official MANO_RIGHT.pkl (chumpy arrays are
unpickled via a numpy shim; the file itself is licensed and NOT shipped), an
.npz export, or a deterministic synthetic model for tests/benchmarks.
"""

from __future__ import annotations

import io
import pickle
from dataclasses import dataclass
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from handmvnet_tpu import constants
from handmvnet_tpu.ops.small_linalg import mm, mv

# MANO skeletal joint parents (wrist, then index/middle/pinky/ring/thumb chains)
MANO_PARENTS = (-1, 0, 1, 2, 0, 4, 5, 0, 7, 8, 0, 10, 11, 0, 13, 14)


@dataclass(frozen=True)
class ManoModel:
    v_template: np.ndarray  # [778, 3]
    shapedirs: np.ndarray  # [778, 3, 10]
    posedirs: np.ndarray  # [778, 3, 135]
    j_regressor: np.ndarray  # [16, 778]
    lbs_weights: np.ndarray  # [778, 16]
    faces: np.ndarray  # [F, 3] int32
    hands_mean: np.ndarray  # [45]


class _ChumpyShim(pickle.Unpickler):
    """Unpickle MANO pkl files without chumpy installed: chumpy arrays are
    reconstructed as plain numpy arrays."""

    def find_class(self, module, name):
        if module.startswith("chumpy"):
            class _Ch(np.ndarray):
                pass

            return _Ch
        if module == "scipy.sparse.csc" or module == "scipy.sparse._csc":
            import scipy.sparse

            return getattr(scipy.sparse, name, scipy.sparse.csc_matrix)
        return super().find_class(module, name)


def _to_np(x) -> np.ndarray:
    if hasattr(x, "toarray"):
        return np.asarray(x.toarray(), dtype=np.float64)
    return np.asarray(x, dtype=np.float64)


def load_mano_model(path: str | Path) -> ManoModel:
    """Load MANO_RIGHT.pkl (or an .npz export with the same field names)."""
    path = Path(path)
    if path.is_dir():
        path = path / "MANO_RIGHT.pkl"
    if path.suffix == ".npz":
        data = dict(np.load(path))
    else:
        with open(path, "rb") as f:
            data = _ChumpyShim(io.BytesIO(f.read()), encoding="latin1").load()
    return ManoModel(
        v_template=_to_np(data["v_template"]).astype(np.float32),
        shapedirs=_to_np(data["shapedirs"]).astype(np.float32),
        posedirs=_to_np(data["posedirs"]).astype(np.float32),
        j_regressor=_to_np(data["J_regressor"]).astype(np.float32),
        lbs_weights=_to_np(data["weights"]).astype(np.float32),
        faces=np.asarray(data["f"], dtype=np.int32),
        hands_mean=_to_np(data.get("hands_mean", np.zeros(45))).astype(np.float32),
    )


def synthetic_mano_model(seed: int = 0) -> ManoModel:
    """Deterministic stand-in with a plausible flat-hand skeleton, used when
    the licensed MANO assets are unavailable (tests, synthetic benchmarks).

    The 16 skeletal joints and 5 fingertips sit at a flat-hand layout derived
    from the dataset's mean hand pose; the J_regressor one-hot-selects
    dedicated vertices placed at those locations so that
    joints(identity pose) reproduces the layout exactly.
    """
    rng = np.random.default_rng(seed)
    mean_pose = np.asarray(constants.MEAN_HAND_POSE, dtype=np.float32) / 1000.0  # m
    # 21-joint layout -> the 16 MANO skeletal joints are the non-tip ones
    # (tips are vertices). MANO order: wrist, index(5,6,7), middle(9,10,11),
    # pinky(17,18,19), ring(13,14,15), thumb(1,2,3).
    mano_joint_of_21 = (0, 5, 6, 7, 9, 10, 11, 17, 18, 19, 13, 14, 15, 1, 2, 3)
    joints16 = mean_pose[list(mano_joint_of_21)]
    tips21 = (4, 8, 12, 16, 20)
    tip_pos = mean_pose[list(tips21)]

    n_verts = constants.NUM_MANO_VERTS
    v_template = (rng.normal(size=(n_verts, 3)) * 0.004).astype(np.float32)
    # scatter vertices around the skeleton so LBS is non-degenerate
    anchor = rng.integers(0, 16, size=n_verts)
    v_template += joints16[anchor]

    # dedicate vertices: joint markers + the canonical tip vertex ids
    joint_vert_ids = np.arange(16) * 37  # arbitrary distinct ids
    v_template[joint_vert_ids] = joints16
    tip_ids = np.asarray(constants.MANO_TIP_VERT_IDS)
    v_template[tip_ids] = tip_pos
    anchor[tip_ids] = [15, 3, 6, 12, 9]  # tip follows its finger's last joint

    j_regressor = np.zeros((16, n_verts), dtype=np.float32)
    j_regressor[np.arange(16), joint_vert_ids] = 1.0

    lbs_weights = np.zeros((n_verts, 16), dtype=np.float32)
    lbs_weights[np.arange(n_verts), anchor] = 1.0
    lbs_weights[joint_vert_ids] = 0.0
    lbs_weights[joint_vert_ids, np.arange(16)] = 1.0

    shapedirs = (rng.normal(size=(n_verts, 3, 10)) * 1e-3).astype(np.float32)
    posedirs = (rng.normal(size=(n_verts, 3, 135)) * 1e-4).astype(np.float32)
    # keep marker vertices exactly on joints under shape/pose blendshapes
    shapedirs[joint_vert_ids] = 0.0
    posedirs[joint_vert_ids] = 0.0
    shapedirs[tip_ids] = 0.0
    posedirs[tip_ids] = 0.0

    faces = np.stack(
        [np.arange(n_verts - 2), np.arange(1, n_verts - 1), np.arange(2, n_verts)], axis=1
    ).astype(np.int32)
    return ManoModel(
        v_template=v_template,
        shapedirs=shapedirs,
        posedirs=posedirs,
        j_regressor=j_regressor,
        lbs_weights=lbs_weights,
        faces=faces,
        hands_mean=np.zeros(45, dtype=np.float32),
    )


class ManoDecoder:
    """Left/right-hand convenience wrapper (reference
    src/models/mano_decoder.py:4-31): decode(pose, shape, side) -> verts,
    joints in mm. Loads MANO_{RIGHT,LEFT}.pkl from ``mano_dir`` when present;
    otherwise the synthetic stand-in (left = mirrored right)."""

    def __init__(self, mano_dir: str | Path | None = None):
        self.layers: dict[str, ManoLayer] = {}
        for side in ("right", "left"):
            model = None
            if mano_dir is not None:
                path = Path(mano_dir) / f"MANO_{side.upper()}.pkl"
                if path.exists():
                    model = load_mano_model(path)
            if model is None:
                model = synthetic_mano_model()
                if side == "left":
                    model = ManoModel(
                        v_template=model.v_template * np.array([-1.0, 1.0, 1.0], np.float32),
                        shapedirs=model.shapedirs,
                        posedirs=model.posedirs,
                        j_regressor=model.j_regressor,
                        lbs_weights=model.lbs_weights,
                        faces=model.faces,
                        hands_mean=model.hands_mean,
                    )
            self.layers[side] = ManoLayer(model)

    def decode(self, pose, shape=None, side: str = "right"):
        """pose: [B, 48] axis-angle or [B, 16, 3, 3] rotmats; shape: [B, 10].

        Axis-angle input follows the reference decoder's manopth settings
        (flat_hand_mean=False, mano_decoder.py:6-7): the articulation part is
        an offset from hands_mean, so pose=0 gives the MEAN-pose hand, not a
        flat hand. (The synthetic stand-in model has hands_mean=0, where the
        two conventions coincide.)"""
        import jax.numpy as jnp

        layer = self.layers[side]
        pose = jnp.asarray(pose)
        if pose.ndim == 2:
            return layer.from_axis_angle(pose, shape, flat_hand_mean=False)
        return layer(pose, shape)


class ManoLayer:
    """Batched, jittable MANO forward. All model tensors are baked constants."""

    def __init__(self, model: ManoModel):
        self.model = model
        self._parents = np.asarray(MANO_PARENTS)

    def __call__(self, pose_rotmats: jax.Array, betas: jax.Array | None = None):
        """pose_rotmats: [B, 16, 3, 3] (slot 0 = global orientation).
        betas: [B, 10] or None (zeros). Returns (verts [B,778,3] mm,
        joints21 [B,21,3] mm)."""
        m = self.model
        b = pose_rotmats.shape[0]
        dtype = pose_rotmats.dtype
        v_template = jnp.asarray(m.v_template, dtype)
        if betas is None:
            v_shaped = jnp.broadcast_to(v_template, (b,) + v_template.shape)
        else:
            v_shaped = v_template + jnp.einsum(
                "vcs,bs->bvc", jnp.asarray(m.shapedirs, dtype), betas
            )
        joints = jnp.einsum("jv,bvc->bjc", jnp.asarray(m.j_regressor, dtype), v_shaped)

        eye = jnp.eye(3, dtype=dtype)
        pose_feat = (pose_rotmats[:, 1:] - eye).reshape(b, 135)
        v_posed = v_shaped + jnp.einsum(
            "vcp,bp->bvc", jnp.asarray(m.posedirs, dtype), pose_feat
        )

        # forward kinematics: the MANO tree is depth 3 below the wrist with
        # five independent finger chains, so the 15 per-joint steps collapse
        # to three levels batched over (B, 5 fingers) — same reshaping as the
        # IK solver (models/ik.py)
        def make_tf(r, t):
            top = jnp.concatenate([r, t[..., None]], axis=-1)
            bottom = jnp.broadcast_to(
                jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype), top.shape[:-2] + (1, 4)
            )
            return jnp.concatenate([top, bottom], axis=-2)

        rel = joints - joints[:, self._parents]  # [B, 16, 3]
        rel = rel.at[:, 0].set(joints[:, 0])
        locals_tf = make_tf(pose_rotmats, rel)  # [B, 16, 4, 4]

        levels = ((1, 4, 7, 10, 13), (2, 5, 8, 11, 14), (3, 6, 9, 12, 15))
        parent_tf = jnp.broadcast_to(locals_tf[:, 0:1], (b, 5, 4, 4))
        level_tfs = [locals_tf[:, 0:1]]
        for level in levels:
            ids = np.asarray(level)
            parent_tf = mm(parent_tf, locals_tf[:, ids])
            level_tfs.append(parent_tf)
        # concat in traversal order, then one static-permutation gather
        stacked = jnp.concatenate(level_tfs, axis=1)  # [B, 16, 4, 4]
        order = [0] + [k for level in levels for k in level]
        world = stacked[:, np.argsort(np.asarray(order))]

        posed_joints = world[:, :, :3, 3]
        # remove the rest-pose joint offset so LBS maps rest verts correctly
        correction = mv(world[:, :, :3, :3], joints)
        world_adj = world.at[:, :, :3, 3].add(-correction)

        wts = jnp.asarray(m.lbs_weights, dtype)
        vert_tf = jnp.einsum("vk,bkij->bvij", wts, world_adj)  # [B, 778, 4, 4]
        verts = mv(vert_tf[:, :, :3, :3], v_posed) + vert_tf[:, :, :3, 3]

        tips = verts[:, np.asarray(constants.MANO_TIP_VERT_IDS), :]
        joints21 = jnp.concatenate([posed_joints, tips], axis=1)
        joints21 = joints21[:, np.asarray(constants.MANO_TO_MEDIAPIPE), :]
        return verts * 1000.0, joints21 * 1000.0  # millimeters (manopth convention)

    def from_axis_angle(
        self,
        pose: jax.Array,
        betas: jax.Array | None = None,
        flat_hand_mean: bool = True,
    ):
        """Axis-angle pose [B, 48] (3 global + 45 articulation) -> forward.

        The reference's ManoDecoder wrapper feeds manopth in PCA mode with 45
        components == the full articulation space (reference
        src/models/mano_decoder.py:4-31); with all components the PCA basis
        is invertible so axis-angle input is the equivalent capability.
        flat_hand_mean=False adds the model's hands_mean to the articulation
        part, matching manopth's flat_hand_mean=False (full_pose = input +
        hands_mean) which the reference decoder uses.
        """
        import jax.numpy as jnp

        from handmvnet_tpu.models.ik import rodrigues

        if not flat_hand_mean:
            mean = jnp.concatenate(
                [jnp.zeros(3, pose.dtype), jnp.asarray(self.model.hands_mean, pose.dtype)]
            )
            pose = pose + mean
        b = pose.shape[0]
        aa = pose.reshape(b, 16, 3)
        angle = jnp.linalg.norm(aa, axis=-1)
        rotmats = rodrigues(aa, angle)
        return self(rotmats, betas)

    def joints_template(self) -> np.ndarray:
        """Flat-hand 21-joint template in mm (identity pose, zero shape) —
        what the reference computes at JointsToVertices init
        (joints_to_vertices.py:23).

        Computed in pure numpy: at identity pose the forward collapses to
        rest-pose joint regression (pose blendshapes vanish, FK composes
        pure translations, LBS is the identity), so joints21 is just
        j_regressor @ v_template plus the tip vertices. Keeping this off
        the device matters on relayed TPU transports, where a single
        device->host transfer permanently degrades async dispatch
        (see bench.py and scripts/probe_slowmode.py)."""
        m = self.model
        joints16 = m.j_regressor @ m.v_template  # [16, 3]
        tips = m.v_template[np.asarray(constants.MANO_TIP_VERT_IDS)]
        j21 = np.concatenate([joints16, tips], axis=0)
        j21 = j21[np.asarray(constants.MANO_TO_MEDIAPIPE)]
        return (j21 * 1000.0).astype(np.float32)
