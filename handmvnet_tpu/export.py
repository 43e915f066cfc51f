"""AOT serving export: the full inference step as a portable artifact.

``python -m handmvnet_tpu.export --config ... [--checkpoint ...] --out <dir>``

Serializes the complete jitted inference program — HandMvNet forward plus
the on-device MANO IK/LBS mesh recovery, exactly the step `infer.py`/
`eval_fps` dispatch — to a StableHLO artifact via ``jax.export``, and
packages it with the weights into one self-contained bundle directory:

    <bundle>/
        exported.stablehlo   jax.export.Exported.serialize() bytes
        params/              orbax checkpoint of the flax variables
        meta.json            input schema, platforms, backbone, versions

Serving-time replay (``load_bundle``) needs jax/jaxlib and orbax only — no
flax, no model code, no YAML config — and the same artifact can carry
lowerings for several platforms at once (``--platforms cpu,tpu``), so the
bundle built on a CPU host deploys unchanged to a TPU fleet. This is the
deployment surface the reference has no analog of: its inference story is
a live torch process re-building the model from source + config
(reference notebooks/infer_vis.ipynb cell 0, src/eval.py:55-110).

The weights stay call-time ARGUMENTS rather than baked constants: closing
a jit over ~100 MB of arrays blows up lowering on the tunneled TPU
(CLAUDE.md invariant) and would also make every exported program
weight-sized. The bundle keeps them as an orbax checkpoint alongside and
``load_bundle`` rebinds them.

``--view-mesh DxV`` exports the MULTI-CHIP view-parallel serving step
instead (parallel/view_parallel.py: view-sharded backbone trunk, token
all_gather over ICI, replicated fusion + per-sample mesh recovery) as a
sharded artifact over a concrete (data x view) mesh; ``load_bundle``
rebuilds the mesh over the serving host's devices and device_puts inputs
to the export-time shardings automatically.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

ARTIFACT_NAME = "exported.stablehlo"
PARAMS_DIR = "params"
META_NAME = "meta.json"


def make_serving_step(model, j2v):
    """The canonical serving program: forward + mesh recovery in ONE jitted
    dispatch (same composition as infer.py's `step` / the bench protocol)."""

    def step(variables, rgb, bboxes, intrinsic):
        out = model.apply(variables, rgb, bboxes, intrinsic)
        out["vertices"] = j2v(out["joints_cam"] * 1000.0)
        return out

    return step


def export_serving(cfg, variables, *, batch_size: int = 1,
                   platforms=("cpu", "tpu"), mano_model=None):
    """Trace + lower the serving step for the given config and weight tree.

    Returns a ``jax.export.Exported``. ``variables`` is only read for its
    shapes/dtypes — the exported program takes the weights as its first
    call argument.
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from handmvnet_tpu.models import HandMvNet
    from handmvnet_tpu.models.joints_to_vertices import joints_to_vertices_fn
    from handmvnet_tpu.models.mano import (
        ManoLayer,
        load_mano_model,
        synthetic_mano_model,
    )

    model = HandMvNet(cfg=cfg.model, image_size=cfg.data.image_size,
                      heatmap_size=cfg.data.heatmap_size)
    if mano_model is None:
        try:
            mano_model = load_mano_model(cfg.data.mano_models_dir)
        except (FileNotFoundError, OSError):
            mano_model = synthetic_mano_model()
    step = make_serving_step(model, joints_to_vertices_fn(ManoLayer(mano_model)))

    v = cfg.model.num_views
    s = cfg.data.image_size
    f32 = jnp.float32
    in_shapes = {
        "rgb": (batch_size, v, s, s, 3),
        "bboxes": (batch_size, v, 4),
        "intrinsic": (batch_size, v, 4),
    }
    arg_structs = tuple(
        jax.ShapeDtypeStruct(in_shapes[k], f32)
        for k in ("rgb", "bboxes", "intrinsic")
    )
    var_structs = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), x.dtype), variables
    )
    exported = jexport.export(jax.jit(step), platforms=list(platforms))(
        var_structs, *arg_structs
    )
    return exported, in_shapes


def export_view_parallel(cfg, variables, *, data: int = 1, view: int = 2,
                         batch_size: int = 1, platforms=("tpu",),
                         compute_dtype: str = "float32", mano_model=None):
    """Export the MULTI-CHIP view-parallel serving step (parallel/
    view_parallel.py: view-sharded trunk, token all_gather over ICI,
    replicated fusion) + the per-sample mesh recovery, as one sharded
    StableHLO artifact over a concrete (data x view) mesh.

    Needs data*view devices at export time (the lowering embeds the mesh);
    the artifact then requires the same device count at serving time.
    Returns ``(exported, in_shapes, mesh_meta)``.
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jexport
    from jax.sharding import NamedSharding, PartitionSpec as P

    from handmvnet_tpu.models import HandMvNet
    from handmvnet_tpu.models.joints_to_vertices import joints_to_vertices_fn
    from handmvnet_tpu.models.mano import (
        ManoLayer,
        load_mano_model,
        synthetic_mano_model,
    )
    from handmvnet_tpu.parallel import (
        make_inference_mesh,
        make_view_parallel_forward,
        view_data_sharding,
    )

    model = HandMvNet(cfg=cfg.model, image_size=cfg.data.image_size,
                      heatmap_size=cfg.data.heatmap_size)
    if mano_model is None:
        try:
            mano_model = load_mano_model(cfg.data.mano_models_dir)
        except (FileNotFoundError, OSError):
            mano_model = synthetic_mano_model()
    j2v = joints_to_vertices_fn(ManoLayer(mano_model))

    mesh = make_inference_mesh(data, view)
    fwd = make_view_parallel_forward(model, mesh, compute_dtype)

    def step(variables, rgb, bboxes, intrinsic):
        out = dict(fwd(variables, rgb, bboxes, intrinsic))
        # per-sample (data-sharded, collective-free) on the replicated joints
        out["vertices"] = j2v(out["joints_cam"] * 1000.0)
        return out

    v, s = cfg.model.num_views, cfg.data.image_size
    in_shapes = {
        "rgb": (batch_size, v, s, s, 3),
        "bboxes": (batch_size, v, 4),
        "intrinsic": (batch_size, v, 4),
    }
    in_sh = view_data_sharding(mesh)
    rep = NamedSharding(mesh, P())
    arg_structs = tuple(
        jax.ShapeDtypeStruct(in_shapes[k], jnp.float32, sharding=in_sh)
        for k in ("rgb", "bboxes", "intrinsic")
    )
    var_structs = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), x.dtype, sharding=rep),
        variables,
    )
    exported = jexport.export(jax.jit(step), platforms=list(platforms))(
        var_structs, *arg_structs
    )
    mesh_meta = {
        "shape": [data, view],
        "axis_names": list(mesh.axis_names),
        "compute_dtype": compute_dtype,
    }
    return exported, in_shapes, mesh_meta


def save_bundle(out_dir, exported, variables, cfg, in_shapes,
                extra_meta=None) -> None:
    import jax

    from handmvnet_tpu.checkpoint import save_checkpoint

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    (out / ARTIFACT_NAME).write_bytes(exported.serialize())
    # orbax wants a fresh directory
    params_path = out / PARAMS_DIR
    if params_path.exists():
        import shutil

        shutil.rmtree(params_path)
    save_checkpoint(params_path, variables)
    meta = {
        "format": "handmvnet_tpu.export/1",
        "platforms": list(exported.platforms),
        "backbone": cfg.model.backbone,
        "num_views": cfg.model.num_views,
        "image_size": cfg.data.image_size,
        "inputs": {k: list(v) for k, v in in_shapes.items()},
        "input_dtype": "float32",
        "outputs": "dict: heatmap, joints_crop_img, joints_cam, vertices, ...",
        "jax_version": jax.__version__,
    }
    if extra_meta:
        meta.update(extra_meta)
    (out / META_NAME).write_text(json.dumps(meta, indent=2) + "\n")


def load_bundle(bundle_dir):
    """Rehydrate a bundle: returns ``(fn, meta)`` where
    ``fn(rgb, bboxes, intrinsic) -> dict`` runs the exported program with
    the bundle's own weights bound. Needs jax + orbax only.

    Sharded (view-parallel) bundles carry a ``mesh`` entry in meta; the
    mesh is rebuilt over the first N local devices and the inputs are
    device_put to the export-time shardings automatically — the caller
    passes plain host arrays either way.
    """
    import jax
    from jax import export as jexport

    from handmvnet_tpu.checkpoint import restore_checkpoint

    bundle = Path(bundle_dir)
    exported = jexport.deserialize((bundle / ARTIFACT_NAME).read_bytes())
    variables = restore_checkpoint(bundle / PARAMS_DIR, None)
    meta = json.loads((bundle / META_NAME).read_text())

    if "mesh" in meta:
        import numpy as np
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        shape = meta["mesh"]["shape"]
        names = tuple(meta["mesh"]["axis_names"])
        need = int(np.prod(shape))
        devs = jax.devices()
        if len(devs) < need:
            raise RuntimeError(
                f"bundle was exported over a {shape} mesh ({need} devices); "
                f"this host has {len(devs)}"
            )
        mesh = Mesh(np.array(devs[:need]).reshape(shape), axis_names=names)
        in_sh = NamedSharding(mesh, P(*names))
        variables = jax.device_put(variables, NamedSharding(mesh, P()))

        def fn(rgb, bboxes, intrinsic):
            return exported.call(
                variables,
                *(jax.device_put(x, in_sh) for x in (rgb, bboxes, intrinsic)),
            )

        return fn, meta

    def fn(rgb, bboxes, intrinsic):
        return exported.call(variables, rgb, bboxes, intrinsic)

    return fn, meta


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("--config", required=True)
    parser.add_argument("--checkpoint", default="",
                        help="orbax dir or torch .ckpt; omit for random "
                             "weights (schema smoke)")
    parser.add_argument("--out", required=True, help="bundle directory")
    parser.add_argument("--batch-size", type=int, default=1)
    parser.add_argument("--platforms", default="cpu,tpu",
                        help="comma-separated lowering targets baked into "
                             "the one artifact")
    parser.add_argument(
        "--view-mesh", default="",
        help="DxV (e.g. 1x4): export the multi-chip view-parallel serving "
             "step over a (data x view) mesh instead of the single-device "
             "program — needs D*V devices on the exporting host, and the "
             "bundle then requires the same count at serving time. Sharded "
             "lowering is single-platform (use --platforms tpu).")
    parser.add_argument("--compute-dtype", default="float32",
                        choices=["float32", "bfloat16"],
                        help="--view-mesh only: trunk compute dtype")
    parser.add_argument("--verify", action="store_true",
                        help="reload the saved bundle and replay it on a "
                             "synthetic batch against the live model")
    args = parser.parse_args(argv)

    import numpy as np

    from handmvnet_tpu.config import Config
    from handmvnet_tpu.models import HandMvNet

    cfg = Config.from_yaml(args.config)
    model = HandMvNet(cfg=cfg.model, image_size=cfg.data.image_size,
                      heatmap_size=cfg.data.heatmap_size)

    if args.checkpoint and Path(args.checkpoint).suffix in (".ckpt", ".pth", ".pt"):
        from handmvnet_tpu.eval import load_torch_checkpoint

        variables = load_torch_checkpoint(args.checkpoint, model, cfg)
    elif args.checkpoint:
        from handmvnet_tpu.checkpoint import restore_checkpoint

        state = restore_checkpoint(args.checkpoint, None)
        variables = {"params": state["params"] if "params" in state else state}
        if "batch_stats" in state:
            variables["batch_stats"] = state["batch_stats"]
    else:
        print("[warning] no checkpoint given — exporting with random weights")
        import jax.numpy as jnp

        from bench import _random_variables

        v, s = cfg.model.num_views, cfg.data.image_size
        variables = _random_variables(
            model, 0,
            jnp.zeros((args.batch_size, v, s, s, 3), jnp.float32),
            jnp.zeros((args.batch_size, v, 4), jnp.float32),
            jnp.zeros((args.batch_size, v, 4), jnp.float32),
        )

    platforms = tuple(p for p in args.platforms.split(",") if p)
    extra_meta = None
    if args.view_mesh:
        d, v = (int(t) for t in args.view_mesh.lower().split("x"))
        exported, in_shapes, mesh_meta = export_view_parallel(
            cfg, variables, data=d, view=v, batch_size=args.batch_size,
            platforms=platforms, compute_dtype=args.compute_dtype,
        )
        extra_meta = {"mesh": mesh_meta}
    else:
        exported, in_shapes = export_serving(
            cfg, variables, batch_size=args.batch_size, platforms=platforms
        )
    save_bundle(args.out, exported, variables, cfg, in_shapes,
                extra_meta=extra_meta)
    size_mb = sum(
        f.stat().st_size for f in Path(args.out).rglob("*") if f.is_file()
    ) / 1e6
    print(f"wrote {args.out}: {ARTIFACT_NAME} "
          f"({(Path(args.out) / ARTIFACT_NAME).stat().st_size / 1e6:.1f} MB), "
          f"{PARAMS_DIR}/, {META_NAME} — total {size_mb:.1f} MB, "
          f"platforms={list(platforms)}")

    if args.verify:
        from handmvnet_tpu.data.synthetic import synthetic_batch

        fn, meta = load_bundle(args.out)
        batch = synthetic_batch(batch_size=args.batch_size,
                                num_views=cfg.model.num_views,
                                image_size=cfg.data.image_size,
                                heatmap_size=cfg.data.heatmap_size)
        out = fn(np.asarray(batch["rgb"]), np.asarray(batch["bboxes"]),
                 np.asarray(batch["intrinsic"]))
        print("replayed bundle: joints_cam", np.asarray(out["joints_cam"]).shape,
              "vertices", np.asarray(out["vertices"]).shape)


if __name__ == "__main__":
    main()
