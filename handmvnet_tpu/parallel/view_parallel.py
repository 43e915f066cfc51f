"""View-parallel (model-parallel) multi-chip inference.

The reference has no model-parallel story (Lightning DDP is data-parallel
only, reference train.py:39-44); this is a TPU-native addition. HandMvNet's
forward is per-view almost everywhere: the backbone + heatmap head +
SampleNet trunk (~84% of the frame on the flagship, ROADMAP 5b) runs each
view independently, and the views only meet at the 168-token cross-view
fusion. That makes the VIEW axis a natural mesh dimension:

  mesh (data, view):
    rgb [b, v, H, W, 3]  sharded (data, view) on axes (0, 1)
    -> per-device trunk on its local views   (stage="tokens")
    -> all_gather tokens over "view"         (~b * v*21 * feat * 2 bytes —
       ~176 KB at the 8-view protocol (168 tokens x 524 feat x bf16): one tiny ICI hop)
    -> fusion + decoder replicated           (stage="fuse", ~0.07 ms)

  latency scales ~1/n_view for the dominant trunk; the collective moves
  kilobytes where activations-sharding schemes would move megabytes.

Eval/inference only: training wants the data axis (gradients dwarf the
trunk-latency question, and BN batch stats are per-view-batch anyway).

Params are REPLICATED (30-130 MB model — far below per-chip HBM); there is
deliberately no weight sharding: at 168 tokens the matmuls are too small to
benefit from tensor-sharded weights, while replication keeps every matmul
full-width on the MXU.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from handmvnet_tpu.parallel.mesh import DATA_AXIS, make_mesh

VIEW_AXIS = "view"


def make_inference_mesh(data: int, view: int, devices=None) -> Mesh:
    """2-D (data, view) mesh over data*view devices.

    The view axis is the minor (fastest-varying) one so that the token
    all_gather rides adjacent-device ICI links. Device selection is
    delegated to make_mesh so the multi-controller rules apply (a bare
    device prefix would land entirely on process 0 — mesh.py:37-58).
    """
    need = data * view
    selected = make_mesh(num_devices=need, devices=devices).devices
    return Mesh(selected.reshape(data, view), axis_names=(DATA_AXIS, VIEW_AXIS))


def view_data_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for [b, v, ...] batch leaves: batch over "data", views over
    "view"."""
    return NamedSharding(mesh, P(DATA_AXIS, VIEW_AXIS))


def make_view_parallel_forward(
    model, mesh: Mesh, compute_dtype: str = "float32"
) -> Callable:
    """Returns fn(variables, rgb, bboxes, intrinsic) -> output dict, jitted
    over `mesh`; rgb/bboxes/intrinsic are [b, v, ...] sharded (data, view).

    The output dict matches ``model.apply(...)`` exactly (parity-tested,
    tests/test_view_parallel.py): per-view entries (joints_crop_img,
    heatmap) come back view-sharded, joints_cam replicated over "view".
    """
    assert model.root_relative, (
        "view-parallel inference supports the release (root-relative) "
        "configs; the dormant absolute-root branch fuses per-view wrist "
        "tokens and is not plumbed through the token gather"
    )
    n_view = mesh.shape[VIEW_AXIS]

    def local_fn(variables, rgb, bboxes, intrinsic):
        # rgb local block: [b_local, v_local, H, W, 3]
        if compute_dtype == "bfloat16":
            rgb = rgb.astype(jnp.bfloat16)
            variables = dict(variables)
            variables["params"] = jax.tree.map(
                lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p,
                variables["params"],
            )
        tk = model.apply(variables, rgb, bboxes, intrinsic, train=False,
                         stage="tokens")
        # [b_l, v_l*j, feat] -> [b_l, v*j, feat]; tiled all_gather
        # concatenates in mesh-axis order == global view order (the batch is
        # sharded contiguously along axis 1)
        tokens = jax.lax.all_gather(tk["tokens"], VIEW_AXIS, axis=1, tiled=True)
        joints_cam = model.apply(variables, tokens, train=False, stage="fuse")
        out_dtype = jnp.promote_types(rgb.dtype, jnp.float32)
        return {
            "joints_crop_img": tk["joints_crop_img"],
            "heatmap": tk["heatmap"],
            "joints_cam": joints_cam.astype(out_dtype),
        }

    sharded = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(), P(DATA_AXIS, VIEW_AXIS), P(DATA_AXIS, VIEW_AXIS),
                  P(DATA_AXIS, VIEW_AXIS)),
        out_specs={
            "joints_crop_img": P(DATA_AXIS, VIEW_AXIS),
            "heatmap": P(DATA_AXIS, VIEW_AXIS),
            # identical on every view column (deterministic compute over the
            # gathered tokens) — declared replicated over "view"
            "joints_cam": P(DATA_AXIS),
        },
        check_vma=False,
    )

    n_data = mesh.shape[DATA_AXIS]

    def checked(variables, rgb, bboxes, intrinsic):
        if rgb.shape[1] % n_view:
            raise ValueError(
                f"num_views={rgb.shape[1]} must divide over the view mesh "
                f"axis ({n_view})"
            )
        if rgb.shape[0] % n_data:
            raise ValueError(
                f"batch={rgb.shape[0]} must divide over the data mesh "
                f"axis ({n_data})"
            )
        return sharded(variables, rgb, bboxes, intrinsic)

    return jax.jit(checked)


def make_replication_check(
    model, mesh: Mesh, compute_dtype: str = "float32"
) -> Callable:
    """Validation variant of make_view_parallel_forward that RETURNS each
    view column's copy of joints_cam as [b, n_view, 21, 3] instead of
    declaring replication.

    make_view_parallel_forward's out_spec asserts joints_cam is replicated
    over "view" with check_vma=False (VMA can't prove value equality across
    a collective, so check_vma=True cannot express this). This function
    makes the claim checkable where it runs: callers assert the columns are
    bitwise equal (same program, same gathered tokens, replicated params).
    Exercised by dryrun_multichip and tests/test_view_parallel.py.
    """
    n_view = mesh.shape[VIEW_AXIS]
    n_data = mesh.shape[DATA_AXIS]

    def local_fn(variables, rgb, bboxes, intrinsic):
        if compute_dtype == "bfloat16":
            rgb = rgb.astype(jnp.bfloat16)
            variables = dict(variables)
            variables["params"] = jax.tree.map(
                lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p,
                variables["params"],
            )
        tk = model.apply(variables, rgb, bboxes, intrinsic, train=False,
                         stage="tokens")
        tokens = jax.lax.all_gather(tk["tokens"], VIEW_AXIS, axis=1, tiled=True)
        joints_cam = model.apply(variables, tokens, train=False, stage="fuse")
        out_dtype = jnp.promote_types(rgb.dtype, jnp.float32)
        # expose this column's copy on a "view"-sharded axis
        return joints_cam.astype(out_dtype)[:, None]

    sharded = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(), P(DATA_AXIS, VIEW_AXIS), P(DATA_AXIS, VIEW_AXIS),
                  P(DATA_AXIS, VIEW_AXIS)),
        out_specs=P(DATA_AXIS, VIEW_AXIS),
        check_vma=False,
    )

    def checked(variables, rgb, bboxes, intrinsic):
        if rgb.shape[1] % n_view:
            raise ValueError(
                f"num_views={rgb.shape[1]} must divide over the view mesh "
                f"axis ({n_view})"
            )
        if rgb.shape[0] % n_data:
            raise ValueError(
                f"batch={rgb.shape[0]} must divide over the data mesh "
                f"axis ({n_data})"
            )
        return sharded(variables, rgb, bboxes, intrinsic)

    return jax.jit(checked)
