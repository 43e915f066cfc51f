"""End-to-end smoke test of the training driver: synthetic HO3D-format tar
shards -> native/python reader -> on-device preprocess -> DP train step ->
val metrics -> checkpoint + val.json. Uses a shrunken config (64^2, 2 views)
to keep CPU compile times sane."""

import json

import pytest
import yaml

import handmvnet_tpu.train as train_mod
from handmvnet_tpu.data.ho3d import HO3DDataset
from handmvnet_tpu.data.synthetic import write_synthetic_ho3d_shards


@pytest.mark.slow
def test_train_driver_end_to_end(tmp_path, monkeypatch):
    shard_dir = tmp_path / "data"
    write_synthetic_ho3d_shards(shard_dir, num_shards=3, samples_per_shard=4,
                                num_views=2, split="train")
    write_synthetic_ho3d_shards(shard_dir, num_shards=3, samples_per_shard=2,
                                num_views=2, split="test", seed=7)

    class TinyHO3D(HO3DDataset):
        train_pattern = "HO3D_mv_train-{000000..000002}.tar"
        test_pattern = "HO3D_mv_test-{000000..000002}.tar"
        split_sizes = {"train": 4, "train+val": 8, "val": 4, "test": 4}

    monkeypatch.setitem(train_mod.DATASETS, "ho3d", TinyHO3D)

    cfg = {
        "name": "smoke",
        "base_output_dir": str(tmp_path / "out"),
        "data": {
            "name": "ho3d", "batch_size": 2, "dataset_dir": str(shard_dir),
            "image_size": 64, "heatmap_size": 8, "augment": True,
            "add_val_to_train": False, "num_workers": 0,
        },
        "model": {
            "selected_views": [0, 1], "fusion": "cross_attn", "fusion_layers": 3,
            "pos_enc": ["pos2d", "crop", "sin"], "use_gcn": True,
            "backbone": "resnet", "backbone_type": "50_paper",
            "backbone_early_return": 3, "backbone_channels": [1024],
            "backbone_pretrained": False,
            "get_vertices": True,
        },
        "train": {
            "epochs": 1, "accumulate_batch": 1, "mask_invisible_joints": True,
            "root_relative": True, "vis_every_n_epochs": 1,
            "loss_weights": {"heatmap": 10.0, "joints_2d": 1.0, "joints_3d": 1000,
                             "g2d": 1.0, "p2d": 0.5},
            "lr": 0.0001,
            "lr_scheduler": {"gamma": 0.5, "milestones": [15]},
            "weight_decay": 0.05,
        },
    }
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    # get_vertices without the licensed MANO pkl: route the loader to the
    # synthetic stand-in so vertex metrics are exercised end to end
    from handmvnet_tpu.models import mano as mano_mod

    monkeypatch.setattr(
        mano_mod, "load_mano_model",
        lambda d: mano_mod.synthetic_mano_model(),
    )

    train_mod.main(["--config", str(cfg_path), "--num-devices", "2"])

    out = tmp_path / "out"
    assert (out / "config.yaml").exists()
    assert (out / "metrics.jsonl").exists()
    assert (out / "val.json").exists()
    assert (out / "checkpoints" / "last").exists()

    records = [json.loads(l) for l in (out / "metrics.jsonl").read_text().splitlines()]
    assert len(records) == 1
    assert "train/loss" in records[0]
    assert "val_mpjpe" in records[0]
    # per-epoch LR logging (reference train.py:36 LearningRateMonitor);
    # epoch 0 is before any milestone, so lr == the configured base lr
    assert records[0]["lr"] == pytest.approx(1e-4)

    val = json.loads((out / "val.json").read_text())
    assert "val_mpjpe" in val[0] and val[0]["val_mpjpe"] > 0

    # vertex metrics flow through validation when get_vertices is on
    # (reference handmvnet.py:390-408)
    assert "val_mpvpe" in val[0] and val[0]["val_mpvpe"] > 0
    assert "val_pa_mpvpe" in records[0]

    # vis hook (reference handmvnet.py:425-441): vis_every_n_epochs=1 must
    # produce non-trivial 2D-joint overlays for train and val
    for mode in ("train", "val"):
        png = out / "vis" / mode / "joints2d_0.png"
        assert png.exists(), png
        assert png.stat().st_size > 1000
        proj = out / "vis" / mode / "projected_joints2d_0.png"
        assert proj.exists(), proj


@pytest.mark.slow
def test_best_val_survives_resume(tmp_path):
    """CheckpointManager must not demote the pre-preemption best checkpoint
    after --resume (round-1 weak #4)."""
    import jax.numpy as jnp

    from handmvnet_tpu.engine import CheckpointManager
    from handmvnet_tpu.parallel.train_step import TrainState

    def state(v):
        return TrainState(step=jnp.asarray(v, jnp.int32),
                          params={"w": jnp.full((2,), float(v))},
                          batch_stats={}, opt_state=())

    m1 = CheckpointManager(tmp_path / "ck")
    m1.save(state(1), epoch=0, val_mpjpe=5.0)
    best = m1.best_path
    assert best is not None and "5.000" in best.name

    # simulated resume: a fresh manager over the same directory
    m2 = CheckpointManager(tmp_path / "ck")
    assert m2.best_val == 5.0 and m2.best_path == best
    m2.save(state(2), epoch=1, val_mpjpe=7.0)  # worse: must NOT become best
    assert m2.best_path == best
    m2.save(state(3), epoch=2, val_mpjpe=4.0)  # better: must take over
    assert m2.best_path != best and "4.000" in m2.best_path.name

    restored = m2.restore_best(state(0))
    assert float(restored.params["w"][0]) == 3.0


@pytest.mark.slow
def test_best_checkpoint_pruned_on_improvement(tmp_path):
    """Lightning ModelCheckpoint keeps best + last only (save_top_k=1,
    reference train.py:34): an improving run must not accumulate a full
    orbax train state per improvement."""
    import jax.numpy as jnp

    from handmvnet_tpu.engine import CheckpointManager
    from handmvnet_tpu.parallel.train_step import TrainState

    def state(v):
        return TrainState(step=jnp.asarray(v, jnp.int32),
                          params={"w": jnp.full((2,), float(v))},
                          batch_stats={}, opt_state=())

    m = CheckpointManager(tmp_path / "ck")
    for epoch, val in enumerate([9.0, 7.0, 5.0]):  # improves every epoch
        m.save(state(epoch), epoch=epoch, val_mpjpe=val)
    dirs = sorted(p.name for p in (tmp_path / "ck").iterdir() if p.is_dir())
    assert dirs == ["epoch=2-step=2-val_mpjpe=5.000", "last"], dirs
    restored = m.restore_best(state(0))
    assert float(restored.params["w"][0]) == 2.0
