"""End-to-end input-pipeline + train-step throughput (ROADMAP: overlap the
device upload with the step).

Times a full epoch of: tar read (native loader) -> collate -> H2D upload +
jitted on-device preprocess -> DP train step, with the loader's device
prefetch ON vs OFF. The epoch ends with one scalar VALUE read of the last
step's loss (jax.block_until_ready is not a trustworthy barrier on the
relayed transport) — no other device->host traffic inside the loop.

Usage: python scripts/pipeline_bench.py [--batch 16] [--views 5] [--steps 12]
"""

from __future__ import annotations

import argparse
import dataclasses
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--views", type=int, default=5)
    parser.add_argument("--steps", type=int, default=8)
    parser.add_argument("--dtype", choices=["float32", "bfloat16"], default="bfloat16")
    args = parser.parse_args()

    import jax

    from handmvnet_tpu.config import Config
    from handmvnet_tpu.data.ho3d import HO3DDataset
    from handmvnet_tpu.data.loader import BatchLoader
    from handmvnet_tpu.data.synthetic import write_synthetic_ho3d_shards
    from handmvnet_tpu.models import HandMvNet
    from handmvnet_tpu.parallel import (
        create_train_state,
        make_mesh,
        make_optimizer,
        make_train_step,
        resolve_remat,
    )
    from handmvnet_tpu.parallel.mesh import data_sharding, global_batch
    from handmvnet_tpu.train import make_device_prepare

    work = Path(tempfile.mkdtemp(prefix="pipeline_bench_"))
    shard_dir = work / "data"
    n_samples = args.batch * 4
    write_synthetic_ho3d_shards(shard_dir, num_shards=4,
                                samples_per_shard=n_samples // 4,
                                num_views=args.views, split="train")

    class BenchHO3D(HO3DDataset):
        train_pattern = "HO3D_mv_train-{000000..000003}.tar"
        test_pattern = "HO3D_mv_train-{000000..000003}.tar"
        split_sizes = {"train": n_samples, "train+val": n_samples,
                       "val": n_samples, "test": n_samples}

    cfg = Config.from_yaml("configs/release/HO3D_HandMvNet.yaml")
    cfg = cfg.replace(
        model=dataclasses.replace(
            cfg.model, selected_views=tuple(range(args.views))),
        data=dataclasses.replace(
            cfg.data, dataset_dir=str(shard_dir), batch_size=args.batch),
        train=dataclasses.replace(
            cfg.train, compute_dtype=args.dtype, accumulate_batch=1),
    )
    model = HandMvNet(cfg=cfg.model,
                      remat=resolve_remat(cfg, n_devices=1, accum_steps=1,
                                          batch_size=args.batch,
                                          num_views=args.views))
    mesh = make_mesh()
    sharding = data_sharding(mesh)
    tx = make_optimizer(cfg, steps_per_epoch=100)
    step = make_train_step(model, cfg, tx, mesh, accum_steps=1)
    rng = jax.random.PRNGKey(0)

    def run(device_prefetch: bool, state):
        loader = BatchLoader(
            BenchHO3D(cfg.data, "train"), args.batch, args.steps,
            device_prepare=make_device_prepare(cfg, True),
            device_prefetch=device_prefetch,
        )
        # warmup epoch: compiles + pays first-transfer costs
        for i, batch in enumerate(loader):
            state, losses = step(state, global_batch(sharding, batch),
                                 jax.random.fold_in(rng, i))
        _ = float(losses["loss"])  # value read: the only trustworthy barrier
        t0 = time.perf_counter()
        for i, batch in enumerate(loader):
            state, losses = step(state, global_batch(sharding, batch),
                                 jax.random.fold_in(rng, 100 + i))
        _ = float(losses["loss"])
        dt = time.perf_counter() - t0
        sps = args.steps * args.batch / dt
        print(f"device_prefetch={device_prefetch}: {dt:.2f}s for {args.steps} "
              f"steps -> {sps:.1f} samples/s", flush=True)
        return sps, state

    from handmvnet_tpu.data.synthetic import synthetic_batch

    init = synthetic_batch(batch_size=args.batch, num_views=args.views, seed=0)
    state = create_train_state(model, cfg, rng, init, tx=tx)
    # level the playing field: the FIRST device->host read permanently
    # degrades the relayed transport (uploads ~40x slower), so whichever
    # mode ran second would otherwise measure under different conditions.
    # One deliberate read here puts BOTH modes in the post-read state — the
    # state any real training loop is in after its first metric sync.
    _ = float(jax.numpy.asarray(state.step))
    off, state = run(False, state)
    on, state = run(True, state)
    print(f"overlap speedup: {on / off:.3f}x")


if __name__ == "__main__":
    main()
