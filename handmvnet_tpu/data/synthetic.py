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

    joints_crop = rng.uniform(30, image_size - 30, size=(b, v, j, 2)).astype(np.float32)
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
        # (ho3d.py:156-166); same chain here, on host numpy via the jnp ops
        hm_full = np.asarray(
            render_gaussian_heatmaps(joints_crop.reshape(b * v, j, 2), image_size, image_size)
        )
        hm = np.asarray(
            resize_bilinear_antialias(hm_full, (heatmap_size, heatmap_size))
        ).reshape(b, v, j, heatmap_size, heatmap_size)
        batch["heatmap"] = hm.astype(np.float32)
    return batch


def write_synthetic_ho3d_shards(
    out_dir,
    num_shards: int = 3,
    samples_per_shard: int = 4,
    num_views: int = 5,
    split: str = "train",
    seed: int = 0,
    image_hw: tuple = (480, 640),
) -> list:
    """Write tar shards in the exact reference HO3D-MV format
    (``image_{i}.jpg`` + ``label.pyd``; reference ho3d.py:52-91) filled with
    deterministic synthetic content. Used by data-pipeline tests and smoke
    training runs."""
    from pathlib import Path

    from handmvnet_tpu.data.webdataset import write_tar_shard

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    h, w = image_hw
    paths = []
    counter = 0
    for shard_idx in range(num_shards):
        samples = []
        for _ in range(samples_per_shard):
            key = f"{counter:09d}"
            counter += 1
            label = {
                "sample_idx": [counter] * num_views,
                "idx": list(range(num_views)),
                "cam_serial": [f"cam{i}" for i in range(num_views)],
                "cam_extr": [np.eye(4, dtype=np.float64) for _ in range(num_views)],
                "cam_intr": [
                    np.array([[600.0, 0, 320.0], [0, 600.0, 240.0], [0, 0, 1]])
                    for _ in range(num_views)
                ],
                "bbox_center": [rng.uniform(200, 400, size=2) for _ in range(num_views)],
                "bbox_scale": [float(rng.uniform(150, 250)) for _ in range(num_views)],
                "joints_2d": [rng.uniform(100, 400, size=(21, 2)) for _ in range(num_views)],
                "joints_3d": [rng.normal(size=(21, 3)) * 0.03 + [0, 0, 0.5] for _ in range(num_views)],
                "verts_3d": [rng.normal(size=(778, 3)) * 0.04 + [0, 0, 0.5] for _ in range(num_views)],
                "joints_vis": [np.ones(21) for _ in range(num_views)],
                "mano_pose": [rng.normal(size=48) * 0.1 for _ in range(num_views)],
                "mano_shape": [rng.normal(size=10) * 0.1 for _ in range(num_views)],
                "image_path": [f"synth/{key}_{i}.jpg" for i in range(num_views)],
                "raw_size": [np.array([w, h]) for _ in range(num_views)],
            }
            sample = {"__key__": key, "label.pyd": label}
            for i in range(num_views):
                img = rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)
                sample[f"image_{i}.jpg"] = img
            samples.append(sample)
        name = f"HO3D_mv_{split}-{shard_idx:06d}.tar"
        path = out_dir / name
        write_tar_shard(path, samples)
        paths.append(str(path))
    return paths
