"""scripts/validate_dataset.py: clean synthetic shards pass (with corrected
sizes reported), corrupted shards fail naming the exact sample key."""

import io
import sys
import tarfile
from pathlib import Path

import pytest
import yaml

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts"))

from handmvnet_tpu.data.synthetic import write_synthetic_ho3d_shards


@pytest.fixture()
def dataset_dir(tmp_path):
    write_synthetic_ho3d_shards(tmp_path, num_shards=9, samples_per_shard=2,
                                num_views=5, split="train")
    write_synthetic_ho3d_shards(tmp_path, num_shards=3, samples_per_shard=2,
                                num_views=5, split="test", seed=9)
    cfg = yaml.safe_load(open("configs/release/HO3D_HandMvNet.yaml"))
    cfg["data"]["dataset_dir"] = str(tmp_path)
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    return tmp_path, str(cfg_path)


def test_clean_shards_pass_with_corrected_sizes(dataset_dir, capsys):
    import validate_dataset

    _, cfg_path = dataset_dir
    rc = validate_dataset.main(["--config", cfg_path])
    out = capsys.readouterr().out
    assert rc == 0
    assert "SIZE MISMATCH" in out  # synthetic counts != hardcoded epoch sizes
    # corrected sizes printed as a ready-to-paste config override block
    assert "split_size_overrides" in out
    assert "val: 4" in out
    # HO3D release config sets add_val_to_train, so the train count corrects
    # the train+val entry (18 = 9 shards x 2 samples)
    assert "train+val: 18" in out
    # strict mode turns the mismatch into a failure
    assert validate_dataset.main(["--config", cfg_path, "--strict-sizes",
                                  "--splits", "val"]) == 1


def test_split_size_overrides_fix_epoch_length(dataset_dir):
    """The emitted override block, fed back through the config, corrects
    num_samples() (and hence every epoch length) without code edits."""
    from handmvnet_tpu.config import Config
    from handmvnet_tpu.data.ho3d import HO3DDataset

    root, cfg_path = dataset_dir
    cfg = Config.from_yaml(cfg_path)
    ds = HO3DDataset(cfg.data, "val", use_native=False)
    assert ds.num_samples() == 1369  # hardcoded reference count, wrong here

    raw = yaml.safe_load(open(cfg_path))
    raw["data"]["split_size_overrides"] = {"train+val": 18, "val": 4, "test": 6}
    cfg2 = Config.from_dict(raw)
    assert HO3DDataset(cfg2.data, "val", use_native=False).num_samples() == 4
    assert HO3DDataset(cfg2.data, "test", use_native=False).num_samples() == 6
    # add_val_to_train (set in the release YAML) routes train -> train+val
    assert HO3DDataset(cfg2.data, "train", use_native=False).num_samples() == 18


def test_corrupt_sample_reports_exact_key(dataset_dir, capsys):
    import validate_dataset

    root, cfg_path = dataset_dir
    shard = root / "HO3D_mv_test-000001.tar"
    tmp = root / "corrupt.tar"
    with tarfile.open(shard) as tin, tarfile.open(tmp, "w") as tout:
        for m in tin.getmembers():
            data = tin.extractfile(m).read()
            if m.name == "000000003.label.pyd":
                data = b"garbage-not-a-pickle"
                m.size = len(data)
            tout.addfile(m, io.BytesIO(data))
    tmp.replace(shard)

    rc = validate_dataset.main(["--config", cfg_path, "--splits", "test"])
    out = capsys.readouterr().out
    assert rc == 1
    assert "HO3D_mv_test-000001.tar::000000003" in out  # exact shard + key
