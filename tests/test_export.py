"""AOT serving-bundle export (handmvnet_tpu/export.py).

The exported StableHLO artifact must replay the exact serving step
(forward + MANO IK/LBS mesh recovery) after a full serialize -> disk ->
deserialize round trip, with the weights rebound from the bundle's own
orbax checkpoint — the deployment path a user ships to a fleet.
"""

import numpy as np
import pytest
import yaml


def _tiny_cfg(tmp_path):
    cfg = yaml.safe_load(open("configs/release/HO3D_HandMvNet.yaml"))
    cfg["data"]["image_size"] = 64
    cfg["data"]["heatmap_size"] = 8
    cfg["model"]["selected_views"] = [0, 1]
    p = tmp_path / "cfg.yaml"
    p.write_text(yaml.safe_dump(cfg))
    from handmvnet_tpu.config import Config

    return Config.from_yaml(str(p))


def _random_setup(cfg):
    import jax.numpy as jnp

    from bench import _random_variables
    from handmvnet_tpu.models import HandMvNet

    model = HandMvNet(cfg=cfg.model, image_size=cfg.data.image_size,
                      heatmap_size=cfg.data.heatmap_size)
    v, s = cfg.model.num_views, cfg.data.image_size
    rgb = jnp.zeros((1, v, s, s, 3), jnp.float32)
    aux = jnp.zeros((1, v, 4), jnp.float32)
    return model, _random_variables(model, 0, rgb, aux, aux)


def test_bundle_round_trip_parity(tmp_path):
    """export -> save_bundle -> load_bundle replays the live step exactly."""
    import jax

    from handmvnet_tpu.data.synthetic import synthetic_batch
    from handmvnet_tpu.export import (
        export_serving,
        load_bundle,
        make_serving_step,
        save_bundle,
    )
    from handmvnet_tpu.models import HandMvNet
    from handmvnet_tpu.models.joints_to_vertices import joints_to_vertices_fn
    from handmvnet_tpu.models.mano import ManoLayer, synthetic_mano_model

    cfg = _tiny_cfg(tmp_path)
    model, variables = _random_setup(cfg)

    mano_model = synthetic_mano_model()
    exported, in_shapes = export_serving(
        cfg, variables, batch_size=1, platforms=("cpu",),
        mano_model=mano_model,
    )
    assert "cpu" in exported.platforms
    save_bundle(tmp_path / "bundle", exported, variables, cfg, in_shapes)

    fn, meta = load_bundle(tmp_path / "bundle")
    assert meta["num_views"] == cfg.model.num_views
    assert meta["inputs"]["rgb"] == [1, cfg.model.num_views, 64, 64, 3]

    batch = synthetic_batch(batch_size=1, num_views=cfg.model.num_views,
                            image_size=64, heatmap_size=8)
    rgb = np.asarray(batch["rgb"])
    bboxes = np.asarray(batch["bboxes"])
    intr = np.asarray(batch["intrinsic"])

    got = fn(rgb, bboxes, intr)
    step = make_serving_step(
        model, joints_to_vertices_fn(ManoLayer(mano_model))
    )
    want = jax.jit(step)(variables, rgb, bboxes, intr)

    assert set(got.keys()) == set(want.keys())
    for k in ("joints_cam", "vertices", "heatmap", "joints_crop_img"):
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(want[k]), atol=1e-5, rtol=1e-5,
            err_msg=k,
        )


def test_multiplatform_artifact(tmp_path):
    """One artifact can carry cpu+tpu lowerings; built on a CPU host it
    still serializes, deserializes, and replays on the cpu lowering."""
    from handmvnet_tpu.export import export_serving
    from handmvnet_tpu.models.mano import synthetic_mano_model
    from jax import export as jexport

    cfg = _tiny_cfg(tmp_path)
    _, variables = _random_setup(cfg)
    exported, _ = export_serving(
        cfg, variables, batch_size=1, platforms=("cpu", "tpu"),
        mano_model=synthetic_mano_model(),
    )
    assert set(exported.platforms) == {"cpu", "tpu"}
    back = jexport.deserialize(exported.serialize())

    v, s = cfg.model.num_views, cfg.data.image_size
    out = back.call(
        variables,
        np.zeros((1, v, s, s, 3), np.float32),
        np.full((1, v, 4), 32.0, np.float32),
        np.full((1, v, 4), 100.0, np.float32),
    )
    assert np.asarray(out["vertices"]).shape == (1, 778, 3)


def test_view_parallel_bundle(tmp_path):
    """Sharded (1x2 view-parallel) bundle: export over a concrete mesh,
    round-trip through disk, rebuild the mesh at load time from plain
    jax.devices(), and replay HOST arrays — parity vs the single-device
    serving step incl. the vertices stage."""
    import jax

    from handmvnet_tpu.data.synthetic import synthetic_batch
    from handmvnet_tpu.export import (
        export_view_parallel,
        load_bundle,
        make_serving_step,
        save_bundle,
    )
    from handmvnet_tpu.models import HandMvNet
    from handmvnet_tpu.models.joints_to_vertices import joints_to_vertices_fn
    from handmvnet_tpu.models.mano import ManoLayer, synthetic_mano_model

    cfg = _tiny_cfg(tmp_path)
    model, variables = _random_setup(cfg)
    mano_model = synthetic_mano_model()

    exported, in_shapes, mesh_meta = export_view_parallel(
        cfg, variables, data=1, view=2, batch_size=2, platforms=("cpu",),
        mano_model=mano_model,
    )
    assert exported.nr_devices == 2
    save_bundle(tmp_path / "vp_bundle", exported, variables, cfg, in_shapes,
                extra_meta={"mesh": mesh_meta})

    fn, meta = load_bundle(tmp_path / "vp_bundle")
    assert meta["mesh"]["shape"] == [1, 2]

    batch = synthetic_batch(batch_size=2, num_views=cfg.model.num_views,
                            image_size=64, heatmap_size=8)
    rgb = np.asarray(batch["rgb"])
    bboxes = np.asarray(batch["bboxes"])
    intr = np.asarray(batch["intrinsic"])

    got = fn(rgb, bboxes, intr)  # plain host arrays in
    step = make_serving_step(
        model, joints_to_vertices_fn(ManoLayer(mano_model))
    )
    want = jax.jit(step)(variables, rgb, bboxes, intr)
    for k in ("joints_cam", "vertices", "heatmap", "joints_crop_img"):
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(want[k]), atol=1e-5, rtol=1e-5,
            err_msg=k,
        )


def test_sharded_bundle_device_count_guard(tmp_path):
    """A sharded bundle refuses to load on a host with fewer devices than
    the export-time mesh."""
    import json

    from handmvnet_tpu.export import META_NAME, load_bundle
    from handmvnet_tpu.export import export_serving, save_bundle
    from handmvnet_tpu.models.mano import synthetic_mano_model

    cfg = _tiny_cfg(tmp_path)
    _, variables = _random_setup(cfg)
    exported, in_shapes = export_serving(
        cfg, variables, batch_size=1, platforms=("cpu",),
        mano_model=synthetic_mano_model(),
    )
    save_bundle(tmp_path / "b", exported, variables, cfg, in_shapes,
                extra_meta={"mesh": {"shape": [1, 512],
                                     "axis_names": ["data", "view"]}})
    with pytest.raises(RuntimeError, match="512 devices"):
        load_bundle(tmp_path / "b")


@pytest.mark.slow
def test_export_cli_view_mesh(tmp_path):
    """CLI --view-mesh 1x2 end to end on the virtual device mesh."""
    cfg = yaml.safe_load(open("configs/release/HO3D_HandMvNet.yaml"))
    cfg["data"]["image_size"] = 64
    cfg["data"]["heatmap_size"] = 8
    cfg["model"]["selected_views"] = [0, 1]
    p = tmp_path / "cfg.yaml"
    p.write_text(yaml.safe_dump(cfg))

    from handmvnet_tpu.export import ARTIFACT_NAME, main

    out = tmp_path / "vp"
    main(["--config", str(p), "--out", str(out), "--platforms", "cpu",
          "--view-mesh", "1x2", "--verify"])
    assert (out / ARTIFACT_NAME).exists()


@pytest.mark.slow
def test_export_cli(tmp_path):
    """`python -m handmvnet_tpu.export` end to end, incl. --verify replay."""
    cfg = yaml.safe_load(open("configs/release/HO3D_HandMvNet.yaml"))
    cfg["data"]["image_size"] = 64
    cfg["data"]["heatmap_size"] = 8
    cfg["model"]["selected_views"] = [0, 1]
    p = tmp_path / "cfg.yaml"
    p.write_text(yaml.safe_dump(cfg))

    from handmvnet_tpu.export import ARTIFACT_NAME, META_NAME, main

    out = tmp_path / "bundle"
    main(["--config", str(p), "--out", str(out), "--platforms", "cpu",
          "--verify"])
    assert (out / ARTIFACT_NAME).exists()
    assert (out / META_NAME).exists()
    assert (out / "params").is_dir()
