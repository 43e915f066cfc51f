"""End-to-end eval-driver test: orbax checkpoint -> handmvnet_tpu.eval main
-> val.json/test.json with the full metric suite (incl. vertex metrics via
the synthetic MANO stand-in)."""

import json

import jax
import pytest
import yaml

import handmvnet_tpu.eval as eval_mod
import handmvnet_tpu.train as train_mod
from handmvnet_tpu.checkpoint import save_checkpoint
from handmvnet_tpu.config import Config
from handmvnet_tpu.data.ho3d import HO3DDataset
from handmvnet_tpu.data.loader import BatchLoader
from handmvnet_tpu.data.synthetic import write_synthetic_ho3d_shards
from handmvnet_tpu.models import HandMvNet
from handmvnet_tpu.parallel import create_train_state, make_optimizer
from handmvnet_tpu.train import make_device_prepare


@pytest.mark.slow
def test_eval_driver_end_to_end(tmp_path, monkeypatch):
    shard_dir = tmp_path / "data"
    write_synthetic_ho3d_shards(shard_dir, num_shards=3, samples_per_shard=2,
                                num_views=2, split="train")
    write_synthetic_ho3d_shards(shard_dir, num_shards=3, samples_per_shard=2,
                                num_views=2, split="test", seed=3)

    class TinyHO3D(HO3DDataset):
        train_pattern = "HO3D_mv_train-{000000..000002}.tar"
        test_pattern = "HO3D_mv_test-{000000..000002}.tar"
        split_sizes = {"train": 2, "train+val": 4, "val": 2, "test": 2}

    monkeypatch.setitem(train_mod.DATASETS, "ho3d", TinyHO3D)

    cfg_dict = {
        "name": "evalsmoke",
        "base_output_dir": str(tmp_path / "out"),
        "data": {"name": "ho3d", "batch_size": 2, "dataset_dir": str(shard_dir),
                 "image_size": 64, "heatmap_size": 8, "augment": False,
                 "mano_models_dir": str(tmp_path / "no_mano")},
        "model": {"selected_views": [0, 1], "fusion": "cross_attn",
                  "fusion_layers": 3, "pos_enc": ["pos2d", "crop", "sin"],
                  "use_gcn": True, "backbone": "resnet",
                  "backbone_type": "50_paper", "backbone_early_return": 3,
                  "backbone_channels": [1024]},
        "train": {"epochs": 1, "root_relative": True,
                  "mask_invisible_joints": True,
                  "loss_weights": {"heatmap": 10.0, "joints_2d": 1.0,
                                   "joints_3d": 1000},
                  "lr": 1e-4, "lr_scheduler": {"gamma": 0.5, "milestones": [10]},
                  "weight_decay": 0.05},
    }
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg_dict))

    # make a checkpoint to evaluate
    cfg = Config.from_yaml(cfg_path)
    model = HandMvNet(cfg=cfg.model, image_size=64, heatmap_size=8)
    first = next(iter(BatchLoader(
        TinyHO3D(cfg.data, "val"), 2, 1, device_prepare=make_device_prepare(cfg, False))))
    state = create_train_state(model, cfg, jax.random.PRNGKey(0), first,
                               tx=make_optimizer(cfg))
    ckpt_dir = tmp_path / "ckpt"
    save_checkpoint(ckpt_dir, state)

    eval_mod.main([
        "--config", str(cfg_path),
        "--checkpoint", str(ckpt_dir),
        "--batch-size", "2",
    ])

    val = json.loads((tmp_path / "val.json").read_text())[0]
    test = json.loads((tmp_path / "test.json").read_text())[0]
    for results in (val, test):
        for key_suffix in ("mpjpe", "pa_mpjpe", "auc_j", "mpjpe2d"):
            assert any(k.endswith(key_suffix) for k in results), (key_suffix, results.keys())
    # vertex metrics ran through the synthetic MANO fallback? eval falls back
    # to skipping when assets are missing; either way the core suite is present
    assert val["val_mpjpe"] > 0
