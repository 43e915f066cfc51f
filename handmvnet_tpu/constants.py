"""Dataset/skeleton constants shared across the framework.

These are facts about the MANO/Mediapipe hand skeleton and the DexYCB capture
rig (reference: src/constants.py:1-124); re-stated here as data.
"""

import numpy as np

NUM_JOINTS = 21
NUM_MANO_VERTS = 778

# 14 extra triangles that close the MANO mesh at the wrist (the released
# mesh is open there); vertex ids are a public constant from
# hassony2/handobjectconsist meshreg/models/manoutils.py, used by the
# reference visualizer (src/vis/utils.py:23-46).
MANO_CLOSED_FIST_FACES = (
    (92, 38, 122), (234, 92, 122), (239, 234, 122), (279, 239, 122),
    (215, 279, 122), (215, 122, 118), (215, 118, 117), (215, 117, 119),
    (215, 119, 120), (215, 120, 108), (215, 108, 79), (215, 79, 78),
    (215, 78, 121), (214, 215, 121),
)


def close_mano_faces(faces: np.ndarray) -> np.ndarray:
    """Append the wrist-closing triangles to a MANO face list."""
    return np.concatenate(
        [np.asarray(faces, np.int32), np.asarray(MANO_CLOSED_FIST_FACES, np.int32)]
    )

# 20 bones of the 21-joint hand skeleton (MANO & Mediapipe ordering):
# wrist=0; each finger chain root->tip. reference: src/constants.py:37-41
HAND_EDGES = (
    (0, 1), (1, 2), (2, 3), (3, 4),      # thumb
    (0, 5), (5, 6), (6, 7), (7, 8),      # index
    (0, 9), (9, 10), (10, 11), (11, 12),  # middle
    (0, 13), (13, 14), (14, 15), (15, 16),  # ring
    (0, 17), (17, 18), (18, 19), (19, 20),  # little
)

# Parent of each joint along the kinematic tree (wrist is its own parent).
# reference: src/utils/analytical_ik.py:8-30
SNAP_PARENT = (0, 0, 1, 2, 3, 0, 5, 6, 7, 0, 9, 10, 11, 0, 13, 14, 15, 0, 17, 18, 19)

# Joints with a rotating parent bone, in IK traversal order.
# reference: src/utils/analytical_ik.py:40
KINEMATIC_TREE = (2, 3, 4, 6, 7, 8, 10, 11, 12, 14, 15, 16, 18, 19, 20)

# Map from skeleton joint id to MANO pose-rotation slot (1..15);
# slot 0 is the global orientation. reference: src/utils/analytical_ik.py:32-38
ID2ROT = {
    2: 13, 3: 14, 4: 15,
    6: 1, 7: 2, 8: 3,
    10: 4, 11: 5, 12: 6,
    14: 10, 15: 11, 16: 12,
    18: 7, 19: 8, 20: 9,
}

MANO_JOINT_NAMES = (
    "wrist",
    "thumb_mcp", "thumb_pip", "thumb_dip", "thumb_tip",
    "index_mcp", "index_pip", "index_dip", "index_tip",
    "middle_mcp", "middle_pip", "middle_dip", "middle_tip",
    "ring_mcp", "ring_pip", "ring_dip", "ring_tip",
    "little_mcp", "little_pip", "little_dip", "little_tip",
)

# Vertex indices of the five fingertips on the MANO mesh
# (manopth convention: thumb, index, middle, ring, little).
MANO_TIP_VERT_IDS = (745, 317, 444, 556, 673)

# Reordering of MANO's 16 skeletal joints + 5 appended tips into the
# 21-joint Mediapipe layout above (manopth convention).
MANO_TO_MEDIAPIPE = (0, 13, 14, 15, 16, 1, 2, 3, 17, 4, 5, 6, 18, 10, 11, 12, 19, 7, 8, 9, 20)

# DexYCB capture rig camera serials (8 RealSense cameras) and subjects.
# reference: src/constants.py:1-34
DEXYCB_CAMERA_SERIALS = (
    "836212060125", "839512060362", "840412060917", "841412060263",
    "932122060857", "932122060861", "932122061900", "932122062010",
)
DEXYCB_SUBJECTS = tuple(
    f"2020{d}-subject-{i:02d}" for i, d in enumerate(
        ("0709", "0813", "0820", "0903", "0908", "0918", "0928", "1002", "1015", "1022"), start=1)
)

# Per-bone (min, max) plausible lengths in millimeters.
# reference: src/constants.py:52-56
BONE_LENGTH_RANGE_MM = (
    (23.99, 49.49), (19.34, 39.45), (19.20, 38.79), (26.66, 46.63),
    (57.08, 112.89), (21.72, 40.84), (15.41, 33.08), (16.54, 31.08),
    (66.35, 119.90), (21.39, 40.27), (16.43, 30.62), (18.67, 35.64),
    (63.82, 111.48), (20.37, 39.48), (16.30, 33.29), (16.07, 32.49),
    (60.15, 107.45), (11.14, 29.33), (13.29, 26.70), (9.59, 31.02),
)

# RGB colors for drawing the wrist + 20 bones. reference: src/constants.py:43-49
HAND_EDGE_COLORS = (
    (1.0, 0.0, 0.0),
    (0.0, 0.4, 0.0), (0.0, 0.6, 0.0), (0.0, 0.8, 0.0), (0.0, 1.0, 0.0),
    (0.0, 0.0, 0.6), (0.0, 0.0, 1.0), (0.2, 0.2, 1.0), (0.4, 0.4, 1.0),
    (0.0, 0.4, 0.4), (0.0, 0.6, 0.6), (0.0, 0.8, 0.8), (0.0, 1.0, 1.0),
    (0.4, 0.4, 0.0), (0.6, 0.6, 0.0), (0.8, 0.8, 0.0), (1.0, 1.0, 0.0),
    (0.4, 0.0, 0.4), (0.6, 0.0, 0.6), (0.8, 0.0, 0.8), (1.0, 0.0, 1.0),
)


# Mean flat-hand joint layout in millimeters, wrist at origin (dataset
# statistic; reference: src/constants.py:148-168).
MEAN_HAND_POSE = (
    (0.0, 0.0, 0.0),
    (-24.0897, -15.5223, 25.8128),
    (-47.9622, -32.1754, 35.8481),
    (-73.3033, -40.2934, 40.9490),
    (-100.3159, -61.5661, 38.1040),
    (-88.0972, -5.2004, 20.6860),
    (-119.6257, -14.9273, 21.1797),
    (-126.9626, -35.7351, 18.7743),
    (-131.6708, -58.1070, 22.4448),
    (-94.6604, -1.4790, -3.3575),
    (-122.0285, -16.2397, -9.7004),
    (-127.5804, -38.7564, -11.6812),
    (-127.4778, -64.8121, -10.6014),
    (-81.7355, -3.9574, -26.6732),
    (-105.8523, -19.6817, -28.4313),
    (-110.0102, -44.1092, -27.8379),
    (-111.2160, -67.2454, -23.0631),
    (-68.7870, -9.9403, -43.2093),
    (-82.8804, -24.5682, -48.9638),
    (-87.7756, -42.8571, -48.2308),
    (-91.7546, -62.1284, -44.9598),
)


def hand_edges_array() -> np.ndarray:
    return np.asarray(HAND_EDGES, dtype=np.int32)
