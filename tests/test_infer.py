"""Smoke test of the inference+visualization driver (infer_vis parity)."""

import yaml
import pytest


@pytest.mark.slow
def test_infer_synthetic(tmp_path):
    cfg = yaml.safe_load(open("configs/release/HO3D_HandMvNet.yaml"))
    cfg["data"]["image_size"] = 64
    cfg["data"]["heatmap_size"] = 8
    cfg["model"]["selected_views"] = [0, 1]
    p = tmp_path / "cfg.yaml"
    p.write_text(yaml.safe_dump(cfg))

    from handmvnet_tpu.infer import main

    out = tmp_path / "vis"
    main(["--config", str(p), "--synthetic", "--output-dir", str(out)])
    for name in ("joints2d.png", "heatmaps.png", "joints3d.png", "mesh.png"):
        assert (out / name).exists(), name


@pytest.mark.slow
def test_infer_view_mesh(tmp_path):
    """--view-mesh runs the forward view-parallel over the virtual device
    mesh and still produces every panel."""
    cfg = yaml.safe_load(open("configs/release/HO3D_HandMvNet.yaml"))
    cfg["data"]["image_size"] = 64
    cfg["data"]["heatmap_size"] = 8
    cfg["model"]["selected_views"] = [0, 1]
    p = tmp_path / "cfg.yaml"
    p.write_text(yaml.safe_dump(cfg))

    from handmvnet_tpu.infer import main

    out = tmp_path / "vis_vp"
    main(["--config", str(p), "--synthetic", "--output-dir", str(out),
          "--view-mesh", "1x2"])
    for name in ("joints2d.png", "heatmaps.png", "joints3d.png", "mesh.png"):
        assert (out / name).exists(), name
