"""Dataset-sanity checks backing the ``notebooks/*_vis.ipynb`` artifacts.

The reference ships three per-dataset inspection notebooks
(reference notebooks/ho3d_vis.ipynb, dexycb_vis.ipynb, mvhand_vis.ipynb)
that (1) draw the ground-truth annotations over the full frames and crops,
(2) verify that DLT-triangulating the GT 2D joints across views reproduces
the GT 3D joints, and (3) scan for inconsistent camera extrinsics across
samples. This module implements those checks against this framework's data
pipeline; the notebooks are thin drivers around it.

No real tars ship in this container, so ``ensure_dataset`` fabricates
geometry-consistent synthetic shards (true pinhole projections over a fixed
camera ring — data/synthetic.py) when the configured dataset_dir has no
shards; against real HO3D/DexYCB/MVHand tars the same code paths run
unchanged.
"""

from __future__ import annotations

from pathlib import Path
from typing import Iterator

import numpy as np

from handmvnet_tpu.config import Config

_PREFIX = {"ho3d": "HO3D", "dexycb": "DexYCB", "mvhand": "MVHand"}


def ensure_dataset(cfg: Config, samples_per_shard: int = 2) -> str:
    """Return a dataset_dir that has shards for cfg.data.name; fabricate
    consistent synthetic ones under ``outputs/sanity_data/<name>`` if the
    configured directory has none.

    The shard count per split must match the dataset class's brace pattern
    exactly — the python tar reader opens every expanded URL (a partial set
    crashes it), and with HO3D's [first, last]-shards-as-val rule a partial
    set would silently shift which samples land in each split."""
    from handmvnet_tpu.data.synthetic import write_synthetic_ho3d_shards
    from handmvnet_tpu.data.webdataset import brace_expand
    from handmvnet_tpu.train import DATASETS

    prefix = _PREFIX[cfg.data.name]
    configured = Path(cfg.data.dataset_dir)
    if list(configured.glob(f"{prefix}_mv_*.tar")):
        return str(configured)
    ds_cls = DATASETS[cfg.data.name]
    out = Path("outputs/sanity_data") / cfg.data.name
    if not list(out.glob(f"{prefix}_mv_*.tar")):
        for split, pattern, seed in (
            ("train", ds_cls.train_pattern, 0),
            ("test", ds_cls.test_pattern, 7),
        ):
            write_synthetic_ho3d_shards(
                out,
                num_shards=len(brace_expand(pattern)),
                samples_per_shard=samples_per_shard,
                num_views=cfg.data.num_views,
                split=split,
                seed=seed,
                consistent_geometry=True,
                prefix=prefix,
            )
    return str(out)


def _dataset(cfg: Config, split: str):
    import dataclasses

    from handmvnet_tpu.train import DATASETS

    data_cfg = dataclasses.replace(cfg.data, dataset_dir=ensure_dataset(cfg))
    return DATASETS[cfg.data.name](data_cfg, split)


def iter_batches(cfg: Config, split: str = "train", batch_size: int = 1) -> Iterator[dict]:
    """Collated numpy batches straight off the tar pipeline (host fields,
    pre-augmentation — what the reference notebooks look at)."""
    from handmvnet_tpu.data.loader import collate

    ds = _dataset(cfg, split)
    buf = []
    for sample in ds:
        buf.append(sample)
        if len(buf) == batch_size:
            yield collate(buf)
            buf = []


def gt_overlay_panels(cfg: Config, split: str = "train", out_dir: str | Path | None = None,
                      idx: int = 0) -> dict:
    """GT-annotation panels for one batch (reference *_vis.ipynb cell 1):
    joints on full frames, joints on crops, bboxes, reprojected GT joints,
    GT-vertex wireframes, 3D skeleton. Returns {name: BGR canvas}; writes
    PNGs when out_dir is given."""
    import cv2

    from handmvnet_tpu.data.pipeline import preprocess_views
    from handmvnet_tpu.vis import HandPoseVisualizer

    import jax

    batch = next(iter_batches(cfg, split, batch_size=idx + 1))
    # the 256^2 normalized crops + GT heatmaps come from the same jitted
    # pipeline the trainer uses (train.make_device_prepare) — pinned to the
    # CPU backend: this is host-side analysis, and reading a TPU result back
    # would permanently degrade a tunneled transport (CLAUDE.md invariant)
    any_visible = ~np.all(batch["joints_img_mask"], axis=-1)
    # crop boxes follow the decode-side downscale (see train.make_device_prepare)
    crop_boxes = batch["bboxes"] / float(max(cfg.data.decode_scale_denom, 1))
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        rgb, heatmap = preprocess_views(
            batch["full_rgb"], crop_boxes, batch["joints_crop_img"],
            any_visible, image_size=cfg.data.image_size,
            heatmap_size=cfg.data.heatmap_size, augment=False,
        )
        batch = dict(batch, rgb=np.asarray(rgb), heatmap=np.asarray(heatmap))
    vis = HandPoseVisualizer(batch)
    panels = {
        "joints2d_full": vis.visualize_joints_2d_on_full_image(idx),
        "joints2d_crop": vis.visualize_joints_2d_on_cropped_image(idx),
        "bboxes": vis.visualize_bboxes(idx),
        "projected_joints2d_full": vis.visualize_projected_joints_2d_on_full_image(idx),
        "vertices_wireframe_full": vis.visualize_vertices_wireframe_on_full_image(idx),
        "mesh_on_image": vis.visualize_mesh_on_image(idx),
    }
    if out_dir is not None:
        out_dir = Path(out_dir)
        out_dir.mkdir(parents=True, exist_ok=True)
        for name, canvas in panels.items():
            cv2.imwrite(str(out_dir / f"{name}.png"), canvas)
        vis.visualize_3d_joints(idx, save_path=str(out_dir / "joints3d.png"))
    return panels


def gt_triangulation_check(cfg: Config, split: str = "train", num_batches: int = 4,
                           batch_size: int = 2) -> dict:
    """Triangulate GT 2D joints across all views and compare against the GT
    3D joints in the root camera frame (reference *_vis.ipynb cell 3).

    On a geometrically consistent dataset the MPJPE is ~0 (sub-mm); large
    values flag broken calibration or 2D/3D label mismatch. Returns
    {"mpjpe_mm", "per_batch_mm", "num_samples"}.

    Runs on the CPU backend: the sub-mm signal needs full f32 matmul
    precision, which the TPU MXU default would blur to ~1 mm — this is
    host-side data analysis, not a hot path."""
    import jax
    import jax.numpy as jnp

    cpu = jax.local_devices(backend="cpu")[0]

    per_batch = []
    n = 0
    it = iter_batches(cfg, split, batch_size=batch_size)
    for _ in range(num_batches):
        try:
            batch = next(it)
        except StopIteration:
            break
        with jax.default_device(cpu):
            mpjpe = _triangulation_mpjpe_mm(batch, jnp)
        per_batch.append(mpjpe)
        n += batch["joints_img"].shape[0]
    return {
        "mpjpe_mm": float(np.mean(per_batch)) if per_batch else float("nan"),
        "per_batch_mm": per_batch,
        "num_samples": n,
    }


def _triangulation_mpjpe_mm(batch: dict, jnp) -> float:
    from handmvnet_tpu.ops.triangulation import batch_triangulate_dlt

    kp2d = jnp.asarray(batch["joints_img"])  # [B, V, 21, 2]
    # rebuild K matrices from the collated [fx, fy, cx, cy] vectors
    fx, fy, cx, cy = np.moveaxis(np.asarray(batch["intrinsic"]), -1, 0)
    zeros, ones = np.zeros_like(fx), np.ones_like(fx)
    ks = jnp.asarray(
        np.stack(
            [
                np.stack([fx, zeros, cx], axis=-1),
                np.stack([zeros, fy, cy], axis=-1),
                np.stack([zeros, zeros, ones], axis=-1),
            ],
            axis=-2,
        )
    )  # [B, V, 3, 3]
    # labels carry cam->world; DLT wants world->camera
    extr_w2c = jnp.linalg.inv(jnp.asarray(batch["extrinsic"]))
    world = batch_triangulate_dlt(kp2d, ks, extr_w2c)  # [B, 21, 3] world

    # world -> root camera frame, then root-relative mm (= joints_cam)
    root_idx = int(batch["root_idx"][0])
    w2root = extr_w2c[:, root_idx]
    root_cam = (
        jnp.einsum("bij,bnj->bni", w2root[:, :3, :3], world) + w2root[:, None, :3, 3]
    )
    pred_rel = (root_cam - root_cam[:, 0:1]) * 1000.0
    gt_rel = jnp.asarray(batch["joints_cam"])  # mm, root-relative
    return float(jnp.linalg.norm(pred_rel - gt_rel, axis=-1).mean())


def run_all(cfg: Config, split: str = "train", out_dir: str | Path | None = None) -> dict:
    """All three notebook checks in one pass. Returns a JSON-serializable
    summary; writes GT-overlay panels when out_dir is given."""
    summary = {
        "dataset": cfg.data.name,
        "split": split,
        "triangulation": gt_triangulation_check(cfg, split),
        "extrinsics": extrinsics_consistency_check(cfg, split),
    }
    if out_dir is not None:
        panels = gt_overlay_panels(cfg, split, out_dir=out_dir)
        summary["panels"] = sorted(panels)
        summary["out_dir"] = str(out_dir)
    return summary


def extrinsics_consistency_check(cfg: Config, split: str = "train",
                                 num_samples: int = 8) -> dict:
    """Scan samples for drifting camera extrinsics (reference ho3d_vis.ipynb
    cell 5): a fixed rig must report identical extrinsics in every sample.
    Returns {"consistent", "max_abs_drift", "num_samples"}."""
    ref = None
    drift = 0.0
    n = 0
    for batch in iter_batches(cfg, split, batch_size=1):
        extr = np.asarray(batch["extrinsic"][0])
        if ref is None:
            ref = extr
        else:
            drift = max(drift, float(np.abs(extr - ref).max()))
        n += 1
        if n >= num_samples:
            break
    return {"consistent": drift < 1e-5, "max_abs_drift": drift, "num_samples": n}


def main(argv=None) -> None:
    """CLI driver for the dataset-sanity checks (the notebooks call run_all
    with the same arguments)."""
    import argparse
    import json

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", required=True, help="release YAML (picks the dataset)")
    parser.add_argument("--split", default="train", choices=["train", "val", "test"])
    parser.add_argument("--out-dir", default=None, help="where to write GT-overlay panels")
    args = parser.parse_args(argv)

    cfg = Config.from_yaml(args.config)
    summary = run_all(cfg, split=args.split, out_dir=args.out_dir)
    print(json.dumps(summary, indent=2))
    tri = summary["triangulation"]["mpjpe_mm"]
    assert tri < 1.0, f"GT triangulation does not reproduce GT 3D (MPJPE {tri:.2f} mm)"
    assert summary["extrinsics"]["consistent"], "camera extrinsics drift across samples"
    print(f"OK: triangulation MPJPE {tri:.4f} mm, extrinsics consistent")


if __name__ == "__main__":
    main()
