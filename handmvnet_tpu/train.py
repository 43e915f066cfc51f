"""Training driver: ``python -m handmvnet_tpu.train --config configs/release/HO3D_HandMvNet.yaml``

TPU-native reproduction of the reference trainer (src/train.py): seed 42,
auto gradient accumulation (2 when batch < 64 and < 3 devices), grad clip 1,
AdamW + MultiStepLR, checkpoint-on-val_mpjpe min + last, post-fit validation
of the best checkpoint dumped to val.json, resolved-config dump with git
hash. Distribution is a shard_map DP step over all local devices instead of
Lightning DDP.
"""

from __future__ import annotations

import argparse
import dataclasses
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from handmvnet_tpu.config import Config
from handmvnet_tpu.data.dexycb import DexYCBDataset
from handmvnet_tpu.data.ho3d import HO3DDataset
from handmvnet_tpu.data.loader import BatchLoader
from handmvnet_tpu.data.mvhand import MVHandDataset
from handmvnet_tpu.data.pipeline import preprocess_views
from handmvnet_tpu.engine import (
    CheckpointManager,
    DeviceMetricAverager,
    JsonlLogger,
    evaluate,
    write_results_json,
)
from handmvnet_tpu.models import HandMvNet
from handmvnet_tpu.parallel import (
    create_train_state,
    make_eval_step,
    make_lr_schedule,
    make_mesh,
    make_optimizer,
    make_train_step,
    resolve_remat,
)
from handmvnet_tpu.parallel.mesh import data_sharding, global_batch

DATASETS = {"ho3d": HO3DDataset, "dexycb": DexYCBDataset, "mvhand": MVHandDataset}


def make_device_prepare(cfg: Config, augment: bool, seed: int = 42):
    """Host batch -> device batch: upload raw frames, run the jitted
    crop/resize/normalize + heatmap pipeline, drop host-only fields."""
    counter = {"step": 0}

    def prepare(batch):
        counter["step"] += 1
        rng = jax.random.PRNGKey(seed + counter["step"]) if augment else None
        any_visible = ~np.all(batch["joints_img_mask"], axis=-1)
        # with decode-side downscale, frames are 1/denom-sized while label
        # bboxes stay in source coords: scale the CROP boxes only (the same
        # physical region is cut from the smaller frame; the model-facing
        # bboxes for crop-FoV encoding / reprojection remain source-res)
        d = cfg.data.decode_scale_denom
        crop_boxes = jnp.asarray(batch["bboxes"])
        if d > 1:
            crop_boxes = crop_boxes / float(d)
        rgb, heatmap = preprocess_views(
            jnp.asarray(batch["full_rgb"]),
            crop_boxes,
            jnp.asarray(batch["joints_crop_img"]),
            jnp.asarray(any_visible),
            rng,
            image_size=cfg.data.image_size,
            heatmap_size=cfg.data.heatmap_size,
            augment=augment,
            box_scale_denom=d,
        )
        out = {
            k: jnp.asarray(v)
            for k, v in batch.items()
            if k not in ("full_rgb", "mv_sample_id", "root_idx", "intrinsic_mat",
                         "joints_img", "mano_pose", "mano_shape",
                         "all_joints_cam", "all_root_joints", "cropped_bboxes")
        }
        out["rgb"] = rgb
        out["heatmap"] = heatmap
        out["bboxes"] = jnp.asarray(batch["bboxes"], jnp.float32)
        return out

    return prepare


def build_dataloaders(cfg: Config, mesh=None):
    ds_cls = DATASETS[cfg.data.name]
    num_procs = jax.process_count()
    proc = jax.process_index()
    bs = cfg.data.batch_size

    def loader(split: str, augment: bool):
        ds = ds_cls(cfg.data, split, split_index=proc, split_count=num_procs)
        steps = max(1, ds.num_samples() // (bs * num_procs))
        return BatchLoader(
            ds,
            batch_size=bs,
            steps_per_epoch=steps,
            device_prepare=make_device_prepare(cfg, augment and cfg.data.augment),
        )

    return loader("train", True), loader("val", False), loader("test", False)


def make_vis_hook(cfg: Config, eval_step, out_dir: Path):
    """Per-epoch visualization hook (reference handmvnet.py:425-441 +
    train.py:62-73 dir layout): every `vis_every_n_epochs`, write
    vis/{mode}/joints2d_{epoch}.png (2D joints on the normalized crops) and,
    when reprojection is configured, projected_joints2d_{epoch}.png."""
    vis_dir = out_dir / "vis"
    for split in ("train", "val", "test"):
        (vis_dir / split).mkdir(parents=True, exist_ok=True)

    from handmvnet_tpu.ops.camera import reproject_to_views
    from handmvnet_tpu.ops.geometry import joints_img_to_crop

    @jax.jit
    def project_crop(joints_cam, root_joint, intrinsic, extrinsic, bboxes):
        projected = reproject_to_views(
            joints_cam + root_joint, cfg.root_idx, intrinsic, extrinsic
        )
        b, v = projected.shape[:2]
        return joints_img_to_crop(
            projected.reshape(b * v, -1, 2), bboxes.reshape(b * v, 4),
            float(cfg.data.image_size),
        ).reshape(b, v, -1, 2)

    def hook(state, batch, epoch: int, mode: str) -> None:
        if (epoch + 1) % max(1, cfg.train.vis_every_n_epochs):
            return
        import cv2

        from handmvnet_tpu.vis.visualizer import HandPoseVisualizer

        # eval_step is collective — every process runs it; only process 0
        # writes the pngs (batch[0] is addressable there: it owns the first
        # slice of the global batch)
        out = eval_step(state, batch)
        with_proj = cfg.train.loss_weights.g2d is not None and "extrinsic" in batch
        if with_proj:
            # deliberately BEFORE the process-0 guard: project_crop is a jit
            # over globally-sharded arrays (eval_step outputs + the global
            # batch), so in multi-process SPMD every process must execute it
            # — skipping it on ranks != 0 would desync the collective
            # programs. Only the png write below is process-0-only.
            proj = project_crop(
                out["joints_cam"],
                jnp.asarray(batch["root_joint"]) / 1000.0,
                batch["intrinsic"], batch["extrinsic"], batch["bboxes"],
            )
        if jax.process_index() != 0:
            return

        def first_row(x):
            # global arrays are only partially addressable per process:
            # read batch element 0 out of process 0's first shard
            if hasattr(x, "addressable_data"):
                x = x.addressable_data(0)
            return np.asarray(x)[0]

        img = HandPoseVisualizer.plot_images_with_joints(
            first_row(batch["rgb"]), first_row(out["joints_crop_img"])
        )
        cv2.imwrite(str(vis_dir / mode / f"joints2d_{epoch}.png"), img)
        if with_proj:
            img = HandPoseVisualizer.plot_images_with_joints(
                first_row(batch["rgb"]), first_row(proj)
            )
            cv2.imwrite(
                str(vis_dir / mode / f"projected_joints2d_{epoch}.png"), img
            )

    return hook


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--num-devices", type=int, default=0)
    parser.add_argument("--epochs", type=int, default=0, help="override config epochs")
    parser.add_argument("--steps-per-epoch", type=int, default=0, help="override (smoke runs)")
    parser.add_argument("--output-dir", default="")
    parser.add_argument("--resume", action="store_true",
                        help="resume from <output-dir>/checkpoints/last")
    parser.add_argument("--multihost", action="store_true",
                        help="initialize jax.distributed (multi-host SPMD; "
                             "the input pipeline auto-shards by process_index)")
    parser.add_argument("--coordinator", default="",
                        help="host:port for jax.distributed; omit for the "
                             "cluster auto-detection (SLURM/TPU metadata)")
    parser.add_argument("--num-processes", type=int, default=-1,
                        help="with --coordinator: total process count")
    parser.add_argument("--process-id", type=int, default=-1,
                        help="with --coordinator: this process's id")
    parser.add_argument("--detect-anomaly", action="store_true",
                        help="raise on NaNs inside jitted code (the reference's "
                             "torch detect_anomaly switch, eval.py:63)")
    parser.add_argument("--eval-first", action="store_true",
                        help="one validation pass before training (Lightning-"
                             "style sanity val, logged as epoch -1) — gives "
                             "convergence analyses a true untrained baseline")
    args = parser.parse_args(argv)

    if args.multihost:
        if args.coordinator:
            jax.distributed.initialize(
                coordinator_address=args.coordinator,
                num_processes=args.num_processes,
                process_id=args.process_id,
            )
        else:
            jax.distributed.initialize()
    if args.detect_anomaly:
        jax.config.update("jax_debug_nans", True)

    cfg = Config.from_yaml(args.config)
    if args.epochs:
        cfg = cfg.replace(train=dataclasses.replace(cfg.train, epochs=args.epochs))
    out_dir = Path(args.output_dir or cfg.base_output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    # non-collective side effects (files, logs) happen on process 0 only;
    # collective programs (train/eval steps, orbax saves) run on every process
    is_main = jax.process_index() == 0
    if is_main:
        cfg.dump(out_dir)
    logger = (
        JsonlLogger(out_dir / "metrics.jsonl", tensorboard_dir=out_dir / "tb")
        if is_main else None
    )

    seed = cfg.train.seed
    rng = jax.random.PRNGKey(seed)
    np.random.seed(seed)

    # the global batch is sharded over "data": use the largest divisor of the
    # batch size not exceeding the request (same rule as eval.py) — a batch of
    # 16 on 3 devices would otherwise die inside shard_map. Multihost: the
    # config batch size is per-process (reference DDP semantics), so the
    # divisor rule applies per process and the mesh takes an equal device
    # count from every process (make_mesh handles the selection).
    nproc = jax.process_count()
    n_avail = len(jax.devices())
    requested = args.num_devices or cfg.train.num_devices or n_avail
    per_proc = max(
        1, min(requested // nproc or 1, jax.local_device_count(), cfg.data.batch_size)
    )
    while cfg.data.batch_size % per_proc:
        per_proc -= 1
    usable = per_proc * nproc
    if usable != requested:
        print(f"[warning] shrinking mesh {requested} -> {usable} devices so each "
              f"process's slice divides batch_size={cfg.data.batch_size}")
    mesh = make_mesh(num_devices=usable)
    if nproc > 1:
        from handmvnet_tpu.parallel.mesh import warmup_collectives

        warmup_collectives(mesh)  # gloo channel setup before the big compile
    n_dev = mesh.devices.size
    print(f"devices: {[str(d) for d in mesh.devices.flat]}")

    # reference: ACCUMULATE_BATCH = 2 if bs < 64 and < 3 devices (train.py:27-28)
    accum = cfg.train.accumulate_batch or (2 if cfg.data.batch_size < 64 and n_dev < 3 else 1)

    model = HandMvNet(
        cfg=cfg.model, image_size=cfg.data.image_size,
        heatmap_size=cfg.data.heatmap_size,
        # measured policy (TRAIN_REMAT_PROBE.json): the release recipes fit
        # one v5e remat-FREE and run ~24% faster that way; remat re-engages
        # beyond the measured per-device image count (parallel.resolve_remat)
        remat=resolve_remat(cfg, n_devices=n_dev, accum_steps=accum),
    )

    train_loader, val_loader, test_loader = build_dataloaders(cfg, mesh)
    steps_per_epoch = len(train_loader)
    # the optimizer's milestone boundaries are sized from the full epoch; a
    # --steps-per-epoch override (smoke runs) shortens the LOOP only, so LR
    # logging below must map actual step counts through THESE boundaries
    sched_steps = steps_per_epoch
    tx = make_optimizer(cfg, steps_per_epoch=sched_steps)
    if args.steps_per_epoch:
        steps_per_epoch = args.steps_per_epoch
        train_loader.steps_per_epoch = steps_per_epoch

    first = next(iter(BatchLoader(
        # shape probe: one batch through the same per-process partition as
        # build_dataloaders — with cache_decoded on, an unsplit (0/1) probe
        # here would build a second full-split cache (and in multihost, N
        # processes would build into the SAME directory concurrently)
        DATASETS[cfg.data.name](
            cfg.data, "train", split_index=jax.process_index(),
            split_count=jax.process_count(),
        ),
        cfg.data.batch_size, 1,
        device_prepare=make_device_prepare(cfg, False),
    )))
    state = create_train_state(model, cfg, rng, first, tx=tx)
    # ImageNet backbone init (reference handmvnet.py:43-66) — applied before
    # resume so a restored checkpoint wins over the pretrained graft
    from handmvnet_tpu.pretrained import load_pretrained_backbone

    state = load_pretrained_backbone(state, cfg)
    if jax.process_count() > 1:
        # every process initialized an identical local state; make it one
        # replicated global array before the collective train step
        from handmvnet_tpu.parallel.mesh import replicate_state

        state = replicate_state(state, mesh)
    start_epoch = 0
    last_ckpt = out_dir / "checkpoints" / "last"
    if args.resume and last_ckpt.exists():
        from handmvnet_tpu.checkpoint import restore_checkpoint

        state = restore_checkpoint(last_ckpt, state)
        # restored arrays are committed to one device; replicate over the
        # mesh or the first sharded train step dies on a device mismatch
        from handmvnet_tpu.parallel.mesh import replicate_state

        state = replicate_state(state, mesh)
        start_epoch = int(state.step) // max(1, steps_per_epoch)
        print(f"resumed from {last_ckpt} at step {int(state.step)} (epoch {start_epoch})")
    param_count = sum(np.prod(p.shape) for p in jax.tree.leaves(state.params))
    print(f"params: {param_count/1e6:.2f}M ({param_count*4/1024/1024:.1f} MB fp32)")

    train_step = make_train_step(model, cfg, tx, mesh, accum_steps=accum)
    eval_step = make_eval_step(model, cfg, mesh)
    sharding = data_sharding(mesh)
    ckpt = CheckpointManager(out_dir / "checkpoints")
    vis_hook = make_vis_hook(cfg, eval_step, out_dir)
    # vertex metrics in validation when configured (reference
    # handmvnet.py:390-408 gates on get_vertices)
    vertices_fn = None
    if cfg.model.get_vertices:
        from handmvnet_tpu.engine import make_vertices_fn

        vertices_fn = make_vertices_fn(cfg)

    def shard(batch):
        # multihost-aware: each process contributes its local batch as one
        # slice of the global batch (see parallel/mesh.py:global_batch)
        return global_batch(sharding, batch)

    # preemption resilience (the reference records SLURM ids but has no
    # handler, SURVEY §5.3): checkpoint "last" on SIGTERM, then exit
    import signal

    preempted = {"flag": False}

    def _on_sigterm(signum, frame):
        preempted["flag"] = True

    signal.signal(signal.SIGTERM, _on_sigterm)

    if args.eval_first and start_epoch == 0:
        # untrained-model validation (epoch -1): the stable baseline for
        # convergence gates (scripts/convergence_gate.py) — epoch-0 val is
        # already one epoch into training and varies run to run
        t0 = time.time()
        init_val = evaluate(eval_step, state, val_loader, cfg, mode="val",
                            vertices_fn=vertices_fn, prepare=shard)
        if logger is not None:
            logger.log({
                "epoch": -1,
                "time_s": round(time.time() - t0, 1),
                **{k: v for k, v in init_val.items() if "pck" not in k},
            })

    vis_val_loader = None
    for epoch in range(start_epoch, cfg.train.epochs):
        t0 = time.time()
        # losses accumulate on device; ONE host sync per epoch (per-step
        # float() reads serialize the device timeline against the host loop
        # and degrade relayed transports — see engine.DeviceMetricAverager)
        avg = DeviceMetricAverager()
        last_batch = None
        for i, batch in enumerate(train_loader):
            last_batch = shard(batch)
            state, losses = train_step(state, last_batch, jax.random.fold_in(rng, epoch * 100003 + i))
            avg.update(losses)
            if preempted["flag"]:
                # step-granular preemption: a SLURM grace window (30-60 s)
                # must not lose the whole epoch
                from handmvnet_tpu.checkpoint import save_checkpoint

                save_checkpoint(out_dir / "checkpoints" / "last", state)
                print(f"SIGTERM received — checkpointed at epoch {epoch} "
                      f"step {int(state.step)}, exiting")
                return
        train_metrics = avg.result()

        val_metrics = evaluate(eval_step, state, val_loader, cfg, mode="val",
                               vertices_fn=vertices_fn, prepare=shard)
        val_mpjpe = val_metrics.get("val_mpjpe", float("inf"))
        ckpt.save(state, epoch, val_mpjpe)
        # the hooks' eval_step is collective (every process participates);
        # only process 0 writes the pngs (guarded inside the hook)
        if last_batch is not None:
            vis_hook(state, last_batch, epoch, "train")
        if (epoch + 1) % max(1, cfg.train.vis_every_n_epochs) == 0:
            # dedicated one-shot loader: pulling from val_loader's persistent
            # stream would steal ~prefetch-depth batches from the next
            # evaluate() pass (shifting the val window that picks the best
            # checkpoint) and leak its producer/preparer threads
            if vis_val_loader is None:
                vis_val_loader = BatchLoader(
                    DATASETS[cfg.data.name](
                        cfg.data, "val", split_index=jax.process_index(),
                        split_count=jax.process_count(),
                    ),
                    cfg.data.batch_size, steps_per_epoch=1,
                    device_prepare=make_device_prepare(cfg, False),
                )
            vis_hook(state, shard(next(iter(vis_val_loader))), epoch, "val")
        if logger is not None:
            # per-epoch LR (reference train.py:36 LearningRateMonitor): the
            # value the optimizer USED this epoch — evaluated at the epoch's
            # FIRST step count (optax decays AT the boundary, so
            # (epoch+1)*spe would report a milestone epoch's decay one epoch
            # early), against the same boundaries tx was built with
            # (sched_steps; the loop's steps_per_epoch may be overridden).
            # Computed on the CPU backend from a host-side step count — the
            # schedule is a jnp program, and an eager TPU dispatch or a
            # state.step D2H read here would poison the relayed transport
            # (CLAUDE.md D2H rule)
            with jax.default_device(jax.devices("cpu")[0]):
                lr = float(
                    make_lr_schedule(cfg, sched_steps)(epoch * steps_per_epoch)
                )
            logger.log(
                {
                    "epoch": epoch,
                    "time_s": round(time.time() - t0, 1),
                    "lr": lr,
                    **{f"train/{k}": v for k, v in train_metrics.items()},
                    **{k: v for k, v in val_metrics.items() if "pck" not in k},
                }
            )

    # post-fit: validate best checkpoint -> val.json (reference train.py:93-104)
    best_state = ckpt.restore_best(state)
    val = evaluate(eval_step, best_state, val_loader, cfg, mode="val",
                   vertices_fn=vertices_fn, prepare=shard)
    if is_main:
        write_results_json(out_dir / "val.json", val)
    print("Validation result:", {k: v for k, v in val.items() if "pck" not in k})


if __name__ == "__main__":
    main()
