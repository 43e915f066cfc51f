"""Deterministic synthetic batches matching the HO3D-MV sample schema
(reference: src/datasets/ho3d.py:52-91 label.pyd contract + :169-201 output
dict). Used by tests, the compile-check entrypoints, and the FPS bench when
no dataset is mounted.
"""

from __future__ import annotations

import numpy as np

from handmvnet_tpu.ops.heatmap import render_gaussian_heatmaps
from handmvnet_tpu.ops.resize import resize_bilinear_antialias


def synthetic_batch(
    batch_size: int = 2,
    num_views: int = 5,
    image_size: int = 256,
    heatmap_size: int = 32,
    num_joints: int = 21,
    seed: int = 0,
    channels_last: bool = True,
    with_heatmaps: bool = True,
) -> dict:
    """Returns a dict of float32 numpy arrays shaped like a collated
    reference batch (data + cam_params flattened into one level)."""
    rng = np.random.default_rng(seed)
    b, v, j = batch_size, num_views, num_joints

    img_shape = (b, v, image_size, image_size, 3) if channels_last else (b, v, 3, image_size, image_size)
    rgb = rng.normal(size=img_shape).astype(np.float32) * 0.5

    centers = rng.uniform(200, 400, size=(b, v, 2))
    scales = rng.uniform(150, 250, size=(b, v))
    bboxes = np.concatenate(
        [centers - scales[..., None] / 2, centers + scales[..., None] / 2], axis=-1
    ).astype(np.float32)

    intr = np.tile(
        np.array([600.0, 600.0, 320.0, 240.0], dtype=np.float32), (b, v, 1)
    ) + rng.normal(size=(b, v, 4)).astype(np.float32)

    # random proper-rotation extrinsics (camera->world)
    q, _ = np.linalg.qr(rng.normal(size=(b * v, 3, 3)))
    det = np.linalg.det(q)
    q[:, :, 0] *= np.sign(det)[:, None]
    extr = np.tile(np.eye(4, dtype=np.float32), (b * v, 1, 1))
    extr[:, :3, :3] = q
    extr[:, :3, 3] = rng.normal(size=(b * v, 3)) * 0.2
    extr = extr.reshape(b, v, 4, 4).astype(np.float32)

    # margin 30 for >=64px images (historical distribution many tests'
    # tolerances are tuned to — at 64px that is a deliberately narrow
    # [30, 34] band); proportional below 64 so tiny dryrun shapes never get
    # a zero/negative-width interval
    margin = 30 if image_size >= 64 else int(image_size * 0.3)
    joints_crop = rng.uniform(
        margin, image_size - margin, size=(b, v, j, 2)
    ).astype(np.float32)
    joints_cam = (rng.normal(size=(b, j, 3)) * 30.0).astype(np.float32)  # mm
    root_joint = (rng.normal(size=(b, 1, 3)) * 100.0 + np.array([0, 0, 500.0])).astype(np.float32)
    vertices = (rng.normal(size=(b, 778, 3)) * 40.0).astype(np.float32)
    mask = rng.uniform(size=(b, v, j)) < 0.1  # ~10% joints invisible

    batch = {
        "rgb": rgb,
        "bboxes": bboxes,
        "intrinsic": intr,
        "extrinsic": extr,
        "joints_crop_img": joints_crop,
        "joints_cam": joints_cam,
        "root_joint": root_joint,
        "vertices": vertices,
        "joints_img_mask": mask,
    }
    if with_heatmaps:  # noqa: SIM108  (kept explicit for readability)
        # reference renders at image res then antialias-resizes to 32^2
        # (ho3d.py:156-166); same chain here via the jnp ops, pinned to the
        # CPU backend: running them on the default (tunneled TPU) device and
        # reading the result back is a device->host transfer, which
        # permanently degrades the transport for the whole process
        # (CLAUDE.md invariant; measured ~40x upload slowdown)
        import jax

        with jax.default_device(jax.local_devices(backend="cpu")[0]):
            hm_full = np.asarray(
                render_gaussian_heatmaps(
                    joints_crop.reshape(b * v, j, 2), image_size, image_size
                )
            )
            hm = np.asarray(
                resize_bilinear_antialias(hm_full, (heatmap_size, heatmap_size))
            ).reshape(b, v, j, heatmap_size, heatmap_size)
        batch["heatmap"] = hm.astype(np.float32)
    return batch


def _look_at_extrinsic(position: np.ndarray, target: np.ndarray) -> np.ndarray:
    """camera->world 4x4 for a pinhole camera at `position` looking (+z)
    toward `target` (y down, matching image coordinates)."""
    z = target - position
    z = z / np.linalg.norm(z)
    up = np.array([0.0, -1.0, 0.0])
    if abs(np.dot(up, z)) > 0.99:
        up = np.array([0.0, 0.0, 1.0])
    x = np.cross(up, z)
    x = x / np.linalg.norm(x)
    y = np.cross(z, x)
    extr = np.eye(4)
    extr[:3, 0], extr[:3, 1], extr[:3, 2], extr[:3, 3] = x, y, z, position
    return extr


def _consistent_rig(num_views: int, target: np.ndarray) -> np.ndarray:
    """Fixed multi-camera rig: view 0 is the world frame (extr=I, matching
    HO3D where the root camera defines the frame); the others sit on a ring
    around the hand, all looking at it. Returns cam->world [V, 4, 4]."""
    extrs = [np.eye(4)]
    radius = np.linalg.norm(target)
    for v in range(1, num_views):
        ang = 2.0 * np.pi * v / num_views
        # ring around the target in the x/z plane, slight y offsets
        pos = target + radius * np.array(
            [np.sin(ang), 0.25 * np.cos(ang), -np.cos(ang)]
        )
        extrs.append(_look_at_extrinsic(pos, target))
    return np.stack(extrs)


def _draw_hand(img: np.ndarray, joints_2d: np.ndarray) -> np.ndarray:
    """Draw the GT skeleton into the synthetic frame so overlays and crops
    show actual content (the reference notebooks look at real photos)."""
    import cv2

    from handmvnet_tpu import constants

    for a, b in constants.HAND_EDGES:
        pa = tuple(np.round(joints_2d[a]).astype(int))
        pb = tuple(np.round(joints_2d[b]).astype(int))
        cv2.line(img, pa, pb, (200, 200, 200), 3)
    for j in joints_2d:
        cv2.circle(img, tuple(np.round(j).astype(int)), 4, (250, 250, 250), -1)
    return img


def write_synthetic_ho3d_shards(
    out_dir,
    num_shards: int = 3,
    samples_per_shard: int = 4,
    num_views: int = 5,
    split: str = "train",
    seed: int = 0,
    image_hw: tuple = (480, 640),
    consistent_geometry: bool = False,
    prefix: str = "HO3D",
) -> list:
    """Write tar shards in the exact reference HO3D-MV format
    (``image_{i}.jpg`` + ``label.pyd``; reference ho3d.py:52-91) filled with
    deterministic synthetic content. Used by data-pipeline tests and smoke
    training runs.

    With ``consistent_geometry=True`` the labels are geometrically coherent:
    a fixed camera ring observes one world-space hand, ``joints_2d`` is the
    true pinhole projection of ``joints_3d``, and the skeleton is drawn into
    the frames — so the dataset-sanity notebooks' GT-triangulation and
    overlay checks are meaningful (reference notebooks/ho3d_vis.ipynb).
    ``prefix`` names the shard family (HO3D / DexYCB / MVHand)."""
    from pathlib import Path

    from handmvnet_tpu.data.webdataset import write_tar_shard

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    h, w = image_hw
    fx = fy = 600.0
    cx, cy = w / 2.0, h / 2.0
    intr = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]])
    target = np.array([0.0, 0.0, 0.55])
    rig = _consistent_rig(num_views, target) if consistent_geometry else None
    from handmvnet_tpu import constants

    mean_hand_m = np.asarray(constants.MEAN_HAND_POSE, np.float64) / 1000.0

    paths = []
    counter = 0
    for shard_idx in range(num_shards):
        samples = []
        for _ in range(samples_per_shard):
            key = f"{counter:09d}"
            counter += 1
            sample = {"__key__": key}
            if consistent_geometry:
                # one world-space hand; per-view cam-space + projections
                joints_w = (
                    target
                    + mean_hand_m * rng.uniform(0.9, 1.1)
                    + rng.normal(size=(21, 3)) * 0.004
                )
                verts_w = joints_w[rng.integers(0, 21, size=778)] + rng.normal(
                    size=(778, 3)
                ) * 0.006
                j3d, v3d, j2d, centers, scales = [], [], [], [], []
                for v in range(num_views):
                    world_to_cam = np.linalg.inv(rig[v])
                    jc = joints_w @ world_to_cam[:3, :3].T + world_to_cam[:3, 3]
                    vc = verts_w @ world_to_cam[:3, :3].T + world_to_cam[:3, 3]
                    uv = jc[:, :2] / jc[:, 2:3] * [fx, fy] + [cx, cy]
                    j3d.append(jc)
                    v3d.append(vc)
                    j2d.append(uv)
                    lo, hi = uv.min(axis=0), uv.max(axis=0)
                    centers.append((lo + hi) / 2.0)
                    scales.append(float((hi - lo).max() * 1.6))
                extr_list = [rig[v] for v in range(num_views)]
            else:
                j3d = [rng.normal(size=(21, 3)) * 0.03 + [0, 0, 0.5] for _ in range(num_views)]
                v3d = [rng.normal(size=(778, 3)) * 0.04 + [0, 0, 0.5] for _ in range(num_views)]
                j2d = [rng.uniform(100, 400, size=(21, 2)) for _ in range(num_views)]
                centers = [rng.uniform(200, 400, size=2) for _ in range(num_views)]
                scales = [float(rng.uniform(150, 250)) for _ in range(num_views)]
                extr_list = [np.eye(4, dtype=np.float64) for _ in range(num_views)]
            label = {
                "sample_idx": [counter] * num_views,
                "idx": list(range(num_views)),
                "cam_serial": [f"cam{i}" for i in range(num_views)],
                "cam_extr": extr_list,
                "cam_intr": [intr.copy() for _ in range(num_views)],
                "bbox_center": centers,
                "bbox_scale": scales,
                "joints_2d": j2d,
                "joints_3d": j3d,
                "verts_3d": v3d,
                "joints_vis": [np.ones(21) for _ in range(num_views)],
                "mano_pose": [rng.normal(size=48) * 0.1 for _ in range(num_views)],
                "mano_shape": [rng.normal(size=10) * 0.1 for _ in range(num_views)],
                "image_path": [f"synth/{key}_{i}.jpg" for i in range(num_views)],
                "raw_size": [np.array([w, h]) for _ in range(num_views)],
            }
            sample["label.pyd"] = label
            for i in range(num_views):
                if consistent_geometry:
                    img = rng.integers(20, 60, size=(h, w, 3), dtype=np.uint8)
                    img = _draw_hand(np.ascontiguousarray(img), np.asarray(j2d[i]))
                else:
                    img = rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)
                sample[f"image_{i}.jpg"] = img
            samples.append(sample)
        name = f"{prefix}_mv_{split}-{shard_idx:06d}.tar"
        path = out_dir / name
        write_tar_shard(path, samples)
        paths.append(str(path))
    return paths
