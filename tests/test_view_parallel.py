"""View-parallel inference (parallel/view_parallel.py): the view-sharded
trunk + token all_gather + replicated fusion must reproduce the plain
single-device forward exactly (same math, different partitioning).

Runs on the 8-virtual-CPU-device mesh from conftest.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from handmvnet_tpu.data.synthetic import synthetic_batch
from handmvnet_tpu.parallel import (
    make_inference_mesh,
    make_view_parallel_forward,
    view_data_sharding,
)

from __graft_entry__ import _build


@pytest.fixture(scope="module")
def setup():
    cfg, model = _build(num_views=4, image_size=32)
    batch = synthetic_batch(batch_size=2, num_views=4, image_size=32,
                            heatmap_size=4, with_heatmaps=False, seed=11)
    inputs = (
        jnp.asarray(batch["rgb"]),
        jnp.asarray(batch["bboxes"]),
        jnp.asarray(batch["intrinsic"]),
    )
    variables = model.init(jax.random.PRNGKey(0), *inputs, train=False)
    ref = jax.jit(
        lambda v, rgb, bb, intr: model.apply(v, rgb, bb, intr, train=False)
    )(variables, *inputs)
    return cfg, model, variables, inputs, ref


@pytest.mark.parametrize("mesh_shape", [(1, 2), (1, 4), (2, 2)])
def test_view_parallel_matches_single_device(setup, mesh_shape):
    _, model, variables, inputs, ref = setup
    mesh = make_inference_mesh(*mesh_shape)
    fn = make_view_parallel_forward(model, mesh)
    sharding = view_data_sharding(mesh)
    sharded_inputs = tuple(jax.device_put(x, sharding) for x in inputs)
    out = fn(variables, *sharded_inputs)

    assert set(out) == {"joints_cam", "joints_crop_img", "heatmap"}
    # trunk partitioning must not change the math: only the conv batch size
    # differs, so agreement is to f32 accumulation noise — except the
    # coordinates, where the deliberate temp-1000 soft-argmax amplifies
    # ~1e-6 logit noise ~1000x (a few 1e-3 px in the 32^2 crop space)
    np.testing.assert_allclose(
        np.asarray(out["heatmap"]), np.asarray(ref["heatmap"]),
        rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out["joints_crop_img"]), np.asarray(ref["joints_crop_img"]),
        rtol=1e-5, atol=1e-2)
    np.testing.assert_allclose(
        np.asarray(out["joints_cam"]), np.asarray(ref["joints_cam"]),
        rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("mesh_shape", [(1, 2), (2, 2)])
def test_joints_cam_replicated_across_view_shards(setup, mesh_shape):
    """The forward's out_spec declares joints_cam replicated over "view"
    under check_vma=False (VMA can't prove value equality across the token
    all_gather). make_replication_check returns each view column's copy;
    they must be BITWISE equal — the replication claim checked where it
    runs (VERDICT r4 #8). Also exercised by dryrun_multichip."""
    from handmvnet_tpu.parallel import make_replication_check

    _, model, variables, inputs, ref = setup
    mesh = make_inference_mesh(*mesh_shape)
    sharding = view_data_sharding(mesh)
    per_col = np.asarray(
        make_replication_check(model, mesh)(
            variables, *(jax.device_put(x, sharding) for x in inputs))
    )
    assert per_col.shape[1] == mesh_shape[1]
    assert float(np.abs(per_col - per_col[:, :1]).max()) == 0.0
    # and each column is the plain forward's answer
    np.testing.assert_allclose(
        per_col[:, 0], np.asarray(ref["joints_cam"]), rtol=1e-4, atol=1e-4)


def test_view_parallel_bf16_smoke(setup):
    _, model, variables, inputs, _ = setup
    mesh = make_inference_mesh(1, 2)
    fn = make_view_parallel_forward(model, mesh, compute_dtype="bfloat16")
    sharding = view_data_sharding(mesh)
    out = fn(variables, *(jax.device_put(x, sharding) for x in inputs))
    # outputs promote to f32 regardless of compute dtype (model contract)
    assert out["joints_cam"].dtype == jnp.float32
    assert np.isfinite(np.asarray(out["joints_cam"])).all()


def test_view_axis_must_divide_views(setup):
    _, model, variables, inputs, _ = setup
    mesh = make_inference_mesh(1, 3)
    fn = make_view_parallel_forward(model, mesh)
    with pytest.raises(ValueError, match="must divide"):
        fn(variables, *inputs)


@pytest.mark.slow
def test_view_parallel_hrnet():
    """The HRNet trunk (incl. the eval-time packed fuse lattice) under the
    view mesh matches the plain forward."""
    cfg, model = _build(num_views=2, image_size=32,
                        config="configs/release/HO3D_HandMvNet_HR_wo_cam.yaml")
    batch = synthetic_batch(batch_size=2, num_views=2, image_size=32,
                            heatmap_size=4, with_heatmaps=False, seed=13)
    inputs = (
        jnp.asarray(batch["rgb"]),
        jnp.asarray(batch["bboxes"]),
        jnp.asarray(batch["intrinsic"]),
    )
    variables = model.init(jax.random.PRNGKey(1), *inputs, train=False)
    ref = jax.jit(
        lambda v, rgb, bb, intr: model.apply(v, rgb, bb, intr, train=False)
    )(variables, *inputs)

    mesh = make_inference_mesh(2, 2)
    fn = make_view_parallel_forward(model, mesh)
    sharding = view_data_sharding(mesh)
    out = fn(variables, *(jax.device_put(x, sharding) for x in inputs))
    np.testing.assert_allclose(
        np.asarray(out["joints_cam"]), np.asarray(ref["joints_cam"]),
        rtol=1e-4, atol=1e-4)


def test_root_branch_rejected():
    cfg, model = _build(num_views=2, image_size=32)
    model_abs = model.clone(root_relative=False)
    mesh = make_inference_mesh(1, 2)
    with pytest.raises(AssertionError, match="root-relative"):
        make_view_parallel_forward(model_abs, mesh)
