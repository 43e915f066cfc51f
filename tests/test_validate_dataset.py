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
    assert "'val': 4" in out  # corrected dict printed
    # strict mode turns the mismatch into a failure
    assert validate_dataset.main(["--config", cfg_path, "--strict-sizes",
                                  "--splits", "val"]) == 1


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
