"""One-epoch training smoke on the current accelerator using synthetic
HO3D-format shards — proves the full driver (native loader -> on-device
preprocess -> DP shard_map step -> eval -> checkpoints) on real hardware.

Usage: python scripts/tpu_train_smoke.py [workdir]
"""

import sys
import tempfile
from pathlib import Path

import yaml

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import handmvnet_tpu.train as train_mod
from handmvnet_tpu.data.ho3d import HO3DDataset
from handmvnet_tpu.data.synthetic import write_synthetic_ho3d_shards


def main() -> None:
    work = Path(sys.argv[1]) if len(sys.argv) > 1 else Path(tempfile.mkdtemp())
    shard_dir = work / "data"
    write_synthetic_ho3d_shards(shard_dir, num_shards=3, samples_per_shard=8,
                                num_views=5, split="train")
    write_synthetic_ho3d_shards(shard_dir, num_shards=3, samples_per_shard=4,
                                num_views=5, split="test", seed=7)

    class SmokeHO3D(HO3DDataset):
        train_pattern = "HO3D_mv_train-{000000..000002}.tar"
        test_pattern = "HO3D_mv_test-{000000..000002}.tar"
        split_sizes = {"train": 8, "train+val": 16, "val": 8, "test": 8}

    train_mod.DATASETS["ho3d"] = SmokeHO3D

    cfg = {
        "name": "tpu-smoke",
        "base_output_dir": str(work / "out"),
        "data": {"name": "ho3d", "batch_size": 4, "dataset_dir": str(shard_dir),
                 "image_size": 256, "heatmap_size": 32, "augment": True,
                 "add_val_to_train": False},
        "model": {"selected_views": [0, 1, 2, 3, 4], "fusion": "cross_attn",
                  "fusion_layers": 5, "pos_enc": ["pos2d", "crop", "sin"],
                  "use_gcn": True, "backbone": "resnet",
                  "backbone_type": "50_paper", "backbone_early_return": 3,
                  "backbone_channels": [1024]},
        "train": {"epochs": 1, "accumulate_batch": 1,
                  "mask_invisible_joints": True, "root_relative": True,
                  "compute_dtype": "bfloat16",
                  "loss_weights": {"heatmap": 10.0, "joints_2d": 1.0,
                                   "joints_3d": 1000, "g2d": 1.0, "p2d": 0.5},
                  "lr": 1e-4, "lr_scheduler": {"gamma": 0.5, "milestones": [15]},
                  "weight_decay": 0.05},
    }
    cfg_path = work / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    train_mod.main(["--config", str(cfg_path)])
    assert (work / "out" / "val.json").exists()
    print("TPU train smoke OK:", work / "out")


if __name__ == "__main__":
    main()
