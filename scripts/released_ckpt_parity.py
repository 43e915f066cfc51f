"""Released-checkpoint MPJPE parity runbook (the BASELINE.md north star).

The one unclosed validation in this container is bit-faithful MPJPE against
the reference's RELEASED weights (reference notebooks/infer_vis.ipynb cell 0
names them, e.g. ``epoch=150-step=60702-val_mpjpe=5.974.ckpt``; reference
src/eval.py:78-85 is the loading path being reproduced). The code path
exists end-to-end — torch ``.ckpt`` → convert_torch_state_dict (legacy
remaps) → jitted eval → val/test.json — but the real weight file, real
dataset tars and the licensed MANO pkl cannot be fetched here (zero
egress). This script keeps that closure ONE COMMAND away the moment the
assets exist:

  python scripts/released_ckpt_parity.py \
      --config configs/release/HO3D_HandMvNet.yaml \
      --checkpoint /assets/epoch=..-val_mpjpe=14.263.ckpt \
      --dataset-dir /assets/ho3d_tars [--mano-dir /assets/mano/models]

It runs the conversion + full eval and prints the val-MPJPE delta against
the figure embedded in the checkpoint filename (the reference's own
convention for its released checkpoints).

Dry run (no external assets; exercised by tests/test_released_parity.py):

  python scripts/released_ckpt_parity.py --dry-run

builds a synthetic Lightning-style ``.ckpt`` by torch.save-ing the
REFERENCE class's own ``state_dict()`` (tests/reference_oracle.py imports
the actual /root/reference model code), synthetic HO3D-schema tars, and
runs the IDENTICAL command path — so the only thing the dry run does not
exercise is the real files' bytes.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import re
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

FILENAME_MPJPE = re.compile(r"val_mpjpe=([0-9]+(?:\.[0-9]+)?)")


def mpjpe_from_filename(path: str) -> float | None:
    """The reference embeds the checkpoint's val MPJPE (mm) in its filename
    (reference train.py:34 naming template; infer_vis.ipynb cell 0)."""
    m = FILENAME_MPJPE.search(Path(path).name)
    return float(m.group(1)) if m else None


def run_parity(config: str, checkpoint: str, dataset_dir: str | None,
               mano_dir: str | None, batch_size: int = 16) -> dict:
    """Convert + eval + report. Returns the result record (also printed as
    one JSON line)."""
    import yaml

    import handmvnet_tpu.eval as eval_mod

    cfg_dict = yaml.safe_load(Path(config).read_text())
    if dataset_dir:
        cfg_dict["data"]["dataset_dir"] = dataset_dir
    if mano_dir:
        cfg_dict["data"]["mano_models_dir"] = mano_dir
    with tempfile.NamedTemporaryFile(
        "w", suffix=".yaml", delete=False
    ) as f:
        yaml.safe_dump(cfg_dict, f)
        resolved_cfg = f.name

    eval_mod.main([
        "--config", resolved_cfg,
        "--checkpoint", checkpoint,
        "--batch-size", str(batch_size),
    ])

    ckpt = Path(checkpoint)
    val = json.loads((ckpt.parent / "val.json").read_text())[0]
    test = json.loads((ckpt.parent / "test.json").read_text())[0]
    claimed = mpjpe_from_filename(checkpoint)
    record = {
        "checkpoint": str(ckpt),
        "val_mpjpe_mm": float(val["val_mpjpe"]),
        "test_mpjpe_mm": float(test["test_mpjpe"]),
        "filename_val_mpjpe_mm": claimed,
        "delta_mm": (float(val["val_mpjpe"]) - claimed)
        if claimed is not None else None,
        "val_json": str(ckpt.parent / "val.json"),
        "test_json": str(ckpt.parent / "test.json"),
    }
    print(json.dumps(record))
    return record


def _dry_run() -> dict:
    """The identical path on synthetic stand-ins: a torch-saved Lightning
    payload of the reference class's own state_dict, synthetic HO3D tars,
    the synthetic MANO fallback. Proves conversion + eval + filename
    parsing run; only the real bytes stay unexercised."""
    import jax
    import torch
    import yaml

    # the dry run is a CPU exercise (the real run keeps whatever backend the
    # host has); idempotent when the test conftest already forced cpu
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_handmvnet")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    sys.path.insert(0, str(REPO / "tests"))
    from reference_oracle import import_reference_handmvnet

    import handmvnet_tpu.train as train_mod
    from handmvnet_tpu.data.ho3d import HO3DDataset
    from handmvnet_tpu.data.synthetic import write_synthetic_ho3d_shards

    RefHandMvNet = import_reference_handmvnet()

    tmp = Path(tempfile.mkdtemp(prefix="released_parity_dry_"))
    shard_dir = tmp / "tars"
    write_synthetic_ho3d_shards(shard_dir, num_shards=3, samples_per_shard=2,
                                num_views=2, split="train", seed=5)
    write_synthetic_ho3d_shards(shard_dir, num_shards=3, samples_per_shard=2,
                                num_views=2, split="test", seed=7)

    # the reference ctor wants the raw dicts, exactly like the release YAML
    # parses (reference src/config.py:44-50 derivations inline)
    cfg_dict = yaml.safe_load(
        (REPO / "configs/release/HO3D_HandMvNet.yaml").read_text())
    cfg_dict["model"]["selected_views"] = [0, 1]
    cfg_dict["model"]["num_views"] = 2
    cfg_dict["model"]["backbone_pretrained"] = False
    cfg_dict["model"]["backbone_pretrained_path"] = "/nonexistent"
    cfg_dict["data"].update(
        selected_views=[0, 1], num_views=2, dataset_dir=str(shard_dir),
        image_size=64, heatmap_size=8, augment=False,
        mano_models_dir=str(tmp / "no_mano"),
        mask_invisible_joints=cfg_dict["train"]["mask_invisible_joints"],
    )
    cfg_dict["train"]["device"] = "cpu"
    cfg_path = tmp / "dry_cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg_dict))

    # a Lightning-style payload: released ckpts carry extra trainer state
    # around "state_dict" — eval.load_torch_checkpoint must pick the inner
    # dict (reference eval.py:78-85)
    ref_model = RefHandMvNet(
        cfg_dict["train"], cfg_dict["model"], cfg_dict["data"]).eval()
    ckpt_path = tmp / "epoch=1-step=2-val_mpjpe=123.456.ckpt"
    torch.save(
        {"state_dict": ref_model.state_dict(), "epoch": 1, "global_step": 2},
        ckpt_path,
    )

    class DryHO3D(HO3DDataset):
        train_pattern = "HO3D_mv_train-{000000..000002}.tar"
        test_pattern = "HO3D_mv_test-{000000..000002}.tar"
        split_sizes = {"train": 2, "train+val": 4, "val": 2, "test": 2}

    prev = train_mod.DATASETS["ho3d"]
    train_mod.DATASETS["ho3d"] = DryHO3D
    try:
        record = run_parity(str(cfg_path), str(ckpt_path),
                            dataset_dir=None, mano_dir=None, batch_size=2)
    finally:
        train_mod.DATASETS["ho3d"] = prev

    assert record["filename_val_mpjpe_mm"] == 123.456
    assert record["delta_mm"] is not None
    assert record["val_mpjpe_mm"] > 0  # random-weight model: large but real
    print("dry run OK: conversion + eval + filename parsing all exercised; "
          "only the real asset bytes remain unproven", file=sys.stderr)
    return record


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", default="configs/release/HO3D_HandMvNet.yaml")
    p.add_argument("--checkpoint", default="",
                   help="released Lightning .ckpt (filename embeds val_mpjpe)")
    p.add_argument("--dataset-dir", default="",
                   help="directory holding the real HO3D_mv_*.tar shards")
    p.add_argument("--mano-dir", default="",
                   help="directory holding MANO_RIGHT.pkl")
    p.add_argument("--batch-size", type=int, default=16,
                   help="reference eval.py:56 forces 16")
    p.add_argument("--dry-run", action="store_true",
                   help="run the identical path on synthetic stand-ins "
                        "(no external assets needed)")
    args = p.parse_args(argv)

    if args.dry_run:
        _dry_run()
        return
    if not args.checkpoint:
        p.error("--checkpoint is required (or use --dry-run)")
    run_parity(args.config, args.checkpoint, args.dataset_dir or None,
               args.mano_dir or None, args.batch_size)


if __name__ == "__main__":
    main()
