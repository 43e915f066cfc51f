"""Training-throughput benchmark: full DP train step (forward + loss incl.
reprojection terms + backward + AdamW) on synthetic HO3D-shaped batches.

Usage: python scripts/train_bench.py [--batch 16] [--views 5] [--dtype bfloat16]
Reports samples/sec and step time (chunked syncs, same measurement story as
bench.py).
"""

from __future__ import annotations

import argparse
import dataclasses
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--views", type=int, default=5)
    parser.add_argument("--iters", type=int, default=50)
    parser.add_argument("--dtype", choices=["float32", "bfloat16"], default="bfloat16")
    args = parser.parse_args()

    import jax

    from handmvnet_tpu.config import Config
    from handmvnet_tpu.data.synthetic import synthetic_batch
    from handmvnet_tpu.models import HandMvNet
    from handmvnet_tpu.parallel import (
        create_train_state,
        make_mesh,
        make_optimizer,
        make_train_step,
        resolve_remat,
    )
    from handmvnet_tpu.parallel.mesh import data_sharding

    cfg = Config.from_yaml("configs/release/HO3D_HandMvNet.yaml")
    cfg = cfg.replace(
        model=dataclasses.replace(cfg.model, selected_views=tuple(range(args.views))),
        train=dataclasses.replace(cfg.train, compute_dtype=args.dtype, accumulate_batch=1),
    )
    model = HandMvNet(cfg=cfg.model,
                      remat=resolve_remat(cfg, n_devices=1, accum_steps=1,
                                          batch_size=args.batch,
                                          num_views=args.views))
    mesh = make_mesh()
    batch = synthetic_batch(batch_size=args.batch, num_views=args.views, seed=0)

    tx = make_optimizer(cfg, steps_per_epoch=100)
    t0 = time.time()
    state = create_train_state(model, cfg, jax.random.PRNGKey(0), batch, tx=tx)
    print(f"init {time.time() - t0:.1f}s", file=sys.stderr)

    step = make_train_step(model, cfg, tx, mesh, accum_steps=1)
    sharding = data_sharding(mesh)
    dbatch = {k: jax.device_put(v, sharding) for k, v in batch.items()}
    rng = jax.random.PRNGKey(1)

    t0 = time.time()
    state, losses = step(state, dbatch, rng)
    jax.block_until_ready(losses)
    print(f"compile+first step {time.time() - t0:.1f}s", file=sys.stderr)

    # warmup
    for _ in range(5):
        state, losses = step(state, dbatch, rng)
    jax.block_until_ready(losses)

    # chunked sync with a VALUE read per chunk: on the relayed transport
    # block_until_ready can return before the queued executions finish
    # (measured: 100 x 97ms steps "completed" in 0.28s), so only a scalar
    # read is a trustworthy barrier — same methodology as bench.py
    _ = float(losses["loss"])
    t0 = time.perf_counter()
    done = 0
    while done < args.iters:
        n = min(25, args.iters - done)
        for _ in range(n):
            state, losses = step(state, dbatch, rng)
        _ = float(losses["loss"])
        done += n
    dt = (time.perf_counter() - t0) / args.iters

    print(
        f"train step: batch={args.batch} views={args.views} dtype={args.dtype} "
        f"{dt * 1e3:.2f} ms/step, {args.batch / dt:.1f} samples/s, "
        f"{args.batch * args.views / dt:.1f} images/s, loss={float(losses['loss']):.3f}"
    )


if __name__ == "__main__":
    main()
