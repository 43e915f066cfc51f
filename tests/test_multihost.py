"""Real multi-process SPMD validation (2 separate JAX controllers over a TCP
coordinator + gloo CPU collectives, 4 local devices each):

  1. scripts/multihost_smoke.py --launch — the shard_mapped train step over
     per-process local batches matches a single-process 8-device oracle.
  2. train.main --multihost end-to-end: both processes train/validate/
     checkpoint collectively; process 0 alone writes the artifacts.

These run as subprocesses: the pytest process already owns a JAX backend
(conftest pins 8 virtual CPU devices) and distributed init must happen
before backend init.
"""

import json
import subprocess
import sys
from pathlib import Path

import pytest
import yaml

REPO = Path(__file__).resolve().parents[1]

WORKER_TEMPLATE = """
import os, sys
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
import handmvnet_tpu.train as train_mod
from handmvnet_tpu.data.ho3d import HO3DDataset

class TinyHO3D(HO3DDataset):
    train_pattern = "HO3D_mv_train-{{000000..000002}}.tar"
    test_pattern = "HO3D_mv_test-{{000000..000002}}.tar"
    split_sizes = {{"train": 8, "train+val": 16, "val": 8, "test": 8}}

train_mod.DATASETS["ho3d"] = TinyHO3D
from handmvnet_tpu.models import mano as mano_mod
mano_mod.load_mano_model = lambda d: mano_mod.synthetic_mano_model()
train_mod.main([
    "--config", {cfg!r}, "--multihost", "--coordinator", "127.0.0.1:{port}",
    "--num-processes", "2", "--process-id", sys.argv[1],
    "--output-dir", {out!r},
])
"""


@pytest.mark.slow
def test_train_step_matches_single_process_oracle():
    rc = subprocess.run(
        [sys.executable, str(REPO / "scripts/multihost_smoke.py"), "--launch",
         "--steps", "3", "--port", "12361"],
        cwd=REPO, timeout=580, capture_output=True, text=True,
    )
    assert rc.returncode == 0, rc.stdout[-3000:] + rc.stderr[-3000:]
    assert "OK: 2-process run matches the single-process oracle" in rc.stdout


@pytest.mark.slow
def test_train_driver_multihost_end_to_end(tmp_path):
    from handmvnet_tpu.data.synthetic import write_synthetic_ho3d_shards

    shard_dir = tmp_path / "data"
    write_synthetic_ho3d_shards(shard_dir, num_shards=3, samples_per_shard=4,
                                num_views=2, split="train")
    write_synthetic_ho3d_shards(shard_dir, num_shards=3, samples_per_shard=2,
                                num_views=2, split="test", seed=7)

    cfg = {
        "name": "mh_smoke",
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
            "get_vertices": False,
        },
        "train": {
            "epochs": 1, "accumulate_batch": 1, "mask_invisible_joints": True,
            "root_relative": True, "vis_every_n_epochs": 1,
            "loss_weights": {"heatmap": 10.0, "joints_2d": 1.0, "joints_3d": 1000},
            "lr": 0.0001,
            "lr_scheduler": {"gamma": 0.5, "milestones": [15]},
            "weight_decay": 0.05,
        },
    }
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    out = tmp_path / "out"

    worker = tmp_path / "worker.py"
    worker.write_text(WORKER_TEMPLATE.format(
        repo=str(REPO), cfg=str(cfg_path), port=12363, out=str(out)))

    procs = [
        subprocess.Popen([sys.executable, str(worker), str(pid)], cwd=REPO,
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True)
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=580)[0] for p in procs]
    assert all(p.returncode == 0 for p in procs), "\n".join(o[-3000:] for o in outs)

    # collective training ran; process 0 wrote the artifacts exactly once
    assert (out / "config.yaml").exists()
    assert (out / "val.json").exists()
    assert (out / "checkpoints" / "last").exists()
    records = [json.loads(l) for l in (out / "metrics.jsonl").read_text().splitlines()]
    assert len(records) == 1, records
    assert "train/loss" in records[0] and "val_mpjpe" in records[0]
    assert (out / "vis" / "train" / "joints2d_0.png").exists()
