"""Validate mounted dataset tars against the framework's expectations.

Usage:
    python scripts/validate_dataset.py --config configs/release/HO3D_HandMvNet.yaml
    python scripts/validate_dataset.py --config ... --splits val test --strict-sizes

For every requested split this scans the shards named by the dataset class
(HO3D/DexYCB/MVHand patterns), parses every sample through the real label
parser, and reports:
  * missing shard files (hard failure),
  * schema violations — missing keys, bad shapes/dtypes — with the exact
    shard and sample key (hard failure),
  * actual sample counts vs the hardcoded epoch sizes, printing a corrected
    `split_sizes` dict when they disagree (the DexYCB/MVHand sizes are
    extrapolations from checkpoint step counts until real tars exist;
    data/dexycb.py:23-26). Mismatch is a warning unless --strict-sizes.

Exit code: 0 clean (or size-mismatch without --strict-sizes), 1 otherwise.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def expected_sample_schema(num_views: int) -> dict:
    """Parsed-sample contract (data/ho3d.py parse_multiview_labels +
    full_rgb stacking)."""
    v = num_views
    return {
        "full_rgb": ((v, None, None, 3), np.uint8),
        "intrinsic": ((v, 4), None),
        "extrinsic": ((v, 4, 4), None),
        "bboxes": ((v, 4), None),
        "joints_img": ((v, 21, 2), None),
        "joints_crop_img": ((v, 21, 2), None),
        "joints_img_mask": ((v, 21), None),
        "joints_cam": ((21, 3), None),
        "root_joint": ((1, 3), None),
        "vertices": ((778, 3), None),
    }


def check_sample(sample: dict, schema: dict) -> list[str]:
    errors = []
    for key, (shape, dtype) in schema.items():
        if key not in sample:
            errors.append(f"missing key {key!r}")
            continue
        arr = np.asarray(sample[key])
        if len(arr.shape) != len(shape) or any(
            e is not None and a != e for a, e in zip(arr.shape, shape)
        ):
            errors.append(f"{key}: shape {arr.shape}, expected {shape}")
        if dtype is not None and arr.dtype != dtype:
            errors.append(f"{key}: dtype {arr.dtype}, expected {np.dtype(dtype)}")
        elif not (np.issubdtype(arr.dtype, np.number) or arr.dtype == np.bool_):
            errors.append(f"{key}: non-numeric dtype {arr.dtype}")
    for key in ("intrinsic", "joints_cam", "vertices"):
        if key in sample and not np.isfinite(np.asarray(sample[key], np.float64)).all():
            errors.append(f"{key}: non-finite values")
    return errors


def validate_split(ds_cls, cfg, split: str) -> tuple[int, list[str]]:
    """Returns (actual sample count, hard errors)."""
    errors: list[str] = []
    ds = ds_cls(cfg.data, split, use_native=False)
    urls = ds._split_urls(split)
    missing = [u for u in urls if not Path(u).exists()]
    if missing:
        return 0, [f"{split}: {len(missing)} missing shard files, e.g. {missing[:3]}"]

    schema = expected_sample_schema(len(cfg.model.selected_views))
    from handmvnet_tpu.data.webdataset import decode_field, iter_tar_samples

    count = 0
    for url in urls:
        try:
            # decode=False: field decoding happens per sample below, so a
            # corrupt jpeg/pickle is attributed to its exact key instead of
            # aborting the whole shard scan
            for raw in iter_tar_samples(url, decode=False):
                key = raw.get("__key__", "?")
                try:
                    decoded = {
                        k: (decode_field(k, v) if isinstance(v, bytes) else v)
                        for k, v in raw.items()
                    }
                    sample = ds._parse(decoded)
                except Exception as e:  # noqa: BLE001 — report, don't crash
                    errors.append(f"{url}::{key}: decode/parse failed: {e}")
                    continue
                bad = check_sample(sample, schema)
                errors.extend(f"{url}::{key}: {b}" for b in bad)
                count += 1
        except Exception as e:  # noqa: BLE001
            errors.append(f"{url}: unreadable shard: {e}")
    return count, errors


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--splits", nargs="+", default=["train", "val", "test"])
    parser.add_argument("--strict-sizes", action="store_true",
                        help="treat sample-count mismatches as failures")
    args = parser.parse_args(argv)

    from handmvnet_tpu.config import Config
    from handmvnet_tpu.train import DATASETS

    cfg = Config.from_yaml(args.config)
    ds_cls = DATASETS[cfg.data.name]

    failed = False
    corrected: dict[str, int] = {}
    for split in args.splits:
        count, errors = validate_split(ds_cls, cfg, split)
        # num_samples() honors add_val_to_train (train -> train+val), which
        # every release config enables; comparing against the raw
        # split_sizes[split] spuriously flagged fully-correct datasets
        ds = ds_cls(cfg.data, split, use_native=False)
        expect = ds.num_samples()
        # with add_val_to_train the "train" split iterates the train+val
        # shards, so the counted size corrects the "train+val" entry
        size_key = (
            "train+val"
            if split == "train" and cfg.data.add_val_to_train
            else split
        )
        status = "OK"
        if errors:
            status = "FAIL"
            failed = True
        elif expect is not None and count != expect:
            corrected[size_key] = count
            status = f"SIZE MISMATCH (hardcoded {expect})"
            if args.strict_sizes:
                failed = True
        print(f"[{split}] {count} samples across "
              f"{len(ds._split_urls(split))} shards — {status}")
        for e in errors[:20]:
            print(f"    {e}")
        if len(errors) > 20:
            print(f"    ... and {len(errors) - 20} more")

    if corrected:
        import yaml

        print(f"\ncorrected sizes for {cfg.data.name} — add this to the "
              f"config's data: section (consumed via "
              f"DataConfig.split_size_overrides):")
        print(yaml.safe_dump(
            {"data": {"split_size_overrides": corrected}}, sort_keys=True
        ).rstrip())
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
