"""Evaluation driver: ``python -m handmvnet_tpu.eval --config ... --checkpoint ...``

Reproduces the reference eval.py: forces batch size 16 and vertex metrics,
loads a checkpoint (native orbax OR a converted PyTorch .ckpt/.pth with the
legacy key remap), runs validate + test, writes val.json/test.json next to
the checkpoint (reference: src/eval.py:55-110).
"""

from __future__ import annotations

import argparse
import dataclasses
from pathlib import Path

import jax

from handmvnet_tpu.config import Config
from handmvnet_tpu.engine import evaluate, write_results_json
from handmvnet_tpu.models import HandMvNet
from handmvnet_tpu.parallel import create_train_state, make_eval_step, make_mesh, make_optimizer
from handmvnet_tpu.train import build_dataloaders


def load_torch_checkpoint(path: str, model, cfg: Config):
    """Load a reference Lightning .ckpt / torch .pth into flax variables,
    applying the legacy remaps (reference eval.py:15-52)."""
    import torch

    from handmvnet_tpu.checkpoint import convert_torch_state_dict

    payload = torch.load(path, map_location="cpu", weights_only=False)
    state_dict = payload.get("state_dict", payload)
    return convert_torch_state_dict(state_dict)


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--no-vertices", action="store_true")
    parser.add_argument("--batch-size", type=int, default=16,
                        help="reference eval.py:56 forces 16")
    args = parser.parse_args(argv)

    cfg = Config.from_yaml(args.config)
    # reference eval.py:56-58 forces bs=16, 6 workers, vertices on
    cfg = cfg.replace(
        data=dataclasses.replace(cfg.data, batch_size=args.batch_size, num_workers=6)
    )

    # the batch is sharded over the mesh: don't use more devices than samples
    n_dev = len(jax.devices())
    usable = max(1, min(n_dev, args.batch_size))
    while args.batch_size % usable:
        usable -= 1
    mesh = make_mesh(num_devices=usable)
    model = HandMvNet(
        cfg=cfg.model, image_size=cfg.data.image_size, heatmap_size=cfg.data.heatmap_size
    )
    _, val_loader, test_loader = build_dataloaders(cfg, mesh)

    ckpt_path = Path(args.checkpoint)
    first = next(iter(val_loader))
    tx = make_optimizer(cfg)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0), first, tx=tx)

    if ckpt_path.suffix in (".ckpt", ".pth", ".pt"):
        variables = load_torch_checkpoint(str(ckpt_path), model, cfg)
        state = state.replace(
            params=variables["params"], batch_stats=variables.get("batch_stats", {})
        )
    else:
        from handmvnet_tpu.checkpoint import restore_checkpoint

        state = restore_checkpoint(ckpt_path, state)

    # restored arrays are committed to a single device; replicate over the mesh
    from handmvnet_tpu.parallel.mesh import replicated

    state = jax.device_put(state, replicated(mesh))

    vertices_fn = None
    if not args.no_vertices:
        from handmvnet_tpu.engine import make_vertices_fn

        vertices_fn = make_vertices_fn(cfg)

    eval_step = make_eval_step(model, cfg, mesh)

    # Known XLA-TPU fault shape (hrnet, v5, b8): split the dispatch 2x4
    # instead of crashing the worker (HRNET_V5B8_BISECT.json; shape_guard.py)
    from handmvnet_tpu.shape_guard import (
        forward_batch_split,
        split_batch_step,
        warn_split,
    )

    per_device = args.batch_size // usable  # what one dispatch shard sees
    split = forward_batch_split(
        cfg.model.backbone, cfg.model.num_views, per_device,
        jax.devices()[0].platform,
    )
    if split > 1:
        warn_split("eval", cfg.model.backbone, cfg.model.num_views,
                   per_device, split)
        eval_step = split_batch_step(eval_step, split)

    val = evaluate(eval_step, state, val_loader, cfg, mode="val", vertices_fn=vertices_fn)
    write_results_json(ckpt_path.parent / "val.json", val)
    print("val:", {k: v for k, v in val.items() if "pck" not in k})

    test = evaluate(eval_step, state, test_loader, cfg, mode="test", vertices_fn=vertices_fn)
    write_results_json(ckpt_path.parent / "test.json", test)
    print("test:", {k: v for k, v in test.items() if "pck" not in k})


if __name__ == "__main__":
    main()
