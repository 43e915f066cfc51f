"""Dataset-sanity module (reference notebooks/{ho3d,dexycb,mvhand}_vis.ipynb
equivalents): GT triangulation reproduces GT 3D on geometry-consistent
shards, the check has teeth on broken geometry, extrinsics scan, GT-overlay
panels render non-trivially, and the CLI driver passes end-to-end."""

from pathlib import Path

import pytest
import yaml

from handmvnet_tpu import sanity
from handmvnet_tpu.config import Config
from handmvnet_tpu.data.synthetic import write_synthetic_ho3d_shards


def _make_cfg(root: Path, consistent: bool) -> tuple[Config, str]:
    for split, seed in (("train", 0), ("test", 7)):
        write_synthetic_ho3d_shards(
            root, num_shards=3, samples_per_shard=2, num_views=5, split=split,
            seed=seed, consistent_geometry=consistent,
        )
    raw = yaml.safe_load(open("configs/release/HO3D_HandMvNet.yaml"))
    raw["data"]["dataset_dir"] = str(root)
    path = root / "cfg.yaml"
    path.write_text(yaml.safe_dump(raw))
    return Config.from_yaml(str(path)), str(path)


@pytest.fixture(scope="module")
def consistent(tmp_path_factory):
    return _make_cfg(tmp_path_factory.mktemp("sanity_ok"), consistent=True)


def test_gt_triangulation_reproduces_gt_3d(consistent):
    cfg, _ = consistent
    res = sanity.gt_triangulation_check(cfg, num_batches=2, batch_size=2)
    assert res["num_samples"] == 4
    assert res["mpjpe_mm"] < 0.1  # sub-0.1 mm: labels are true pinhole projections


def test_triangulation_check_has_teeth(tmp_path):
    # random labels (joints_2d unrelated to joints_3d) must fail loudly
    cfg, _ = _make_cfg(tmp_path, consistent=False)
    res = sanity.gt_triangulation_check(cfg, num_batches=1, batch_size=2)
    assert res["mpjpe_mm"] > 10.0


def test_extrinsics_consistent(consistent):
    cfg, _ = consistent
    res = sanity.extrinsics_consistency_check(cfg, num_samples=4)
    assert res["consistent"]
    assert res["num_samples"] == 4


def test_gt_overlay_panels(consistent, tmp_path):
    cfg, _ = consistent
    panels = sanity.gt_overlay_panels(cfg, out_dir=tmp_path)
    for name, canvas in panels.items():
        assert canvas.ndim == 3 and canvas.shape[-1] == 3, name
        assert float(canvas.std()) > 1.0, f"{name} rendered blank"
    assert (tmp_path / "joints2d_full.png").exists()
    assert (tmp_path / "joints3d.png").exists()


def test_cli_passes_on_consistent_data(consistent, capsys):
    _, cfg_path = consistent
    sanity.main(["--config", cfg_path])
    out = capsys.readouterr().out
    assert "OK: triangulation MPJPE" in out
