"""End-to-end inference + visualization:
``python -m handmvnet_tpu.infer --config ... [--checkpoint ...] [--synthetic]``

The script equivalent of the reference's infer_vis notebook
(notebooks/infer_vis.ipynb; BASELINE config #4): load a checkpoint (native
orbax or converted torch), run the jitted forward on a batch, recover the
MANO mesh on device, and write visualization panels (2D joints on crops,
heatmaps, 3D joints, mesh) to --output-dir.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--checkpoint", default="", help="orbax dir or torch .ckpt; omit for random weights")
    parser.add_argument("--synthetic", action="store_true", help="use a synthetic batch instead of the dataset")
    parser.add_argument("--output-dir", default="outputs/infer")
    parser.add_argument("--batch-size", type=int, default=1)
    parser.add_argument(
        "--view-mesh", default="",
        help="DxV (e.g. 1x4): run the network forward view-parallel over a "
             "2-D (data x view) device mesh (parallel/view_parallel.py) — "
             "for multi-chip hosts/pods; numerically equal to the plain "
             "forward (tests/test_view_parallel.py)")
    args = parser.parse_args(argv)

    import cv2
    import jax
    import jax.numpy as jnp

    from bench import _random_variables
    from handmvnet_tpu.config import Config
    from handmvnet_tpu.models import HandMvNet
    from handmvnet_tpu.models.joints_to_vertices import joints_to_vertices_fn
    from handmvnet_tpu.models.mano import ManoLayer, load_mano_model, synthetic_mano_model
    from handmvnet_tpu.vis import HandPoseVisualizer

    cfg = Config.from_yaml(args.config)
    model = HandMvNet(
        cfg=cfg.model, image_size=cfg.data.image_size, heatmap_size=cfg.data.heatmap_size
    )
    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    # ---- batch
    if args.synthetic:
        from handmvnet_tpu.data.synthetic import synthetic_batch

        batch = synthetic_batch(
            batch_size=args.batch_size, num_views=cfg.model.num_views,
            image_size=cfg.data.image_size, heatmap_size=cfg.data.heatmap_size,
        )
    else:
        from handmvnet_tpu.train import DATASETS, make_device_prepare
        from handmvnet_tpu.data.loader import BatchLoader

        ds = DATASETS[cfg.data.name](cfg.data, "test")
        loader = BatchLoader(
            ds, batch_size=args.batch_size, steps_per_epoch=1,
            device_prepare=make_device_prepare(cfg, augment=False),
        )
        batch = {k: np.asarray(v) if not isinstance(v, list) else v
                 for k, v in next(iter(loader)).items()}

    rgb = jnp.asarray(batch["rgb"])
    bboxes = jnp.asarray(batch["bboxes"])
    intr = jnp.asarray(batch["intrinsic"])

    # ---- weights
    if args.checkpoint and Path(args.checkpoint).suffix in (".ckpt", ".pth", ".pt"):
        from handmvnet_tpu.eval import load_torch_checkpoint

        variables = load_torch_checkpoint(args.checkpoint, model, cfg)
    elif args.checkpoint:
        from handmvnet_tpu.checkpoint import restore_checkpoint

        state = restore_checkpoint(args.checkpoint, None)
        variables = {
            "params": state["params"] if "params" in state else state,
        }
        if "batch_stats" in state:
            variables["batch_stats"] = state["batch_stats"]
    else:
        print("[warning] no checkpoint given — running with random weights")
        variables = _random_variables(model, 0, rgb, bboxes, intr)

    # ---- forward + mesh (one jitted program)
    try:
        mano = ManoLayer(load_mano_model(cfg.data.mano_models_dir))
    except (FileNotFoundError, OSError):
        print("[warning] MANO assets unavailable; using the synthetic MANO stand-in")
        mano = ManoLayer(synthetic_mano_model())
    j2v = joints_to_vertices_fn(mano)

    if args.view_mesh:
        from handmvnet_tpu.parallel import (
            make_inference_mesh,
            make_view_parallel_forward,
            view_data_sharding,
        )

        d, v = (int(t) for t in args.view_mesh.lower().split("x"))
        # check here: the device_put below would otherwise fail first with
        # an opaque sharding error, ahead of view_parallel's own guard
        if rgb.shape[0] % d or rgb.shape[1] % v:
            raise SystemExit(
                f"--view-mesh {d}x{v} needs --batch-size divisible by {d} "
                f"(got {rgb.shape[0]}) and the config's views divisible by "
                f"{v} (got {rgb.shape[1]})"
            )
        mesh = make_inference_mesh(d, v)
        fwd = make_view_parallel_forward(model, mesh)
        sharding = view_data_sharding(mesh)
        out = dict(fwd(
            variables,
            *(jax.device_put(x, sharding) for x in (rgb, bboxes, intr)),
        ))
        # mesh recovery is per-sample (data-sharded, collective-free) — a
        # separate jitted dispatch on the replicated joints is fine here
        out["vertices"] = jax.jit(j2v)(out["joints_cam"] * 1000.0)
    else:
        def step(variables, rgb, bboxes, intr):
            out = model.apply(variables, rgb, bboxes, intr)
            out["vertices"] = j2v(out["joints_cam"] * 1000.0)
            return out

        # Known XLA-TPU fault shape (hrnet, v5, b8): two dispatches of 4
        # instead of crashing the worker (HRNET_V5B8_BISECT.json)
        from handmvnet_tpu.shape_guard import (
            forward_batch_split,
            split_batch_step,
            warn_split,
        )

        split = forward_batch_split(
            cfg.model.backbone, cfg.model.num_views, rgb.shape[0],
            jax.devices()[0].platform,
        )
        jstep = jax.jit(step)

        def dict_step(state, b):
            return jstep(state, b["rgb"], b["bboxes"], b["intr"])

        if split > 1:
            warn_split("infer", cfg.model.backbone, cfg.model.num_views,
                       rgb.shape[0], split)
            dict_step = split_batch_step(dict_step, split)
        out = dict_step(variables, {"rgb": rgb, "bboxes": bboxes,
                                    "intr": intr})
    out_np = {k: np.asarray(v) for k, v in out.items()}
    print("joints_cam[0,0]:", out_np["joints_cam"][0, 0], "(m, root-relative)")

    # ---- visualization panels
    vis_batch = dict(batch)
    vis_batch["joints_crop_img"] = out_np["joints_crop_img"]
    vis_batch["heatmap"] = out_np["heatmap"]
    vis = HandPoseVisualizer(vis_batch)
    cv2.imwrite(str(out_dir / "joints2d.png"), vis.visualize_joints_2d_on_cropped_image())
    cv2.imwrite(str(out_dir / "heatmaps.png"), vis.visualize_combined_heatmaps())
    HandPoseVisualizer({"joints_cam": out_np["joints_cam"]}).visualize_3d_joints(
        0, save_path=str(out_dir / "joints3d.png")
    )
    HandPoseVisualizer({}).render_mesh(
        out_np["vertices"][0], mano.model.faces, save_path=str(out_dir / "mesh.png")
    )
    print(f"wrote {out_dir}/joints2d.png heatmaps.png joints3d.png mesh.png")


if __name__ == "__main__":
    main()
