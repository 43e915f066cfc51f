"""Real multi-process SPMD validation (ROADMAP: multi-host not yet validated
beyond single-process virtual meshes).

Launch mode spawns N worker processes on localhost, each a separate JAX
controller (jax.distributed over a TCP coordinator, gloo CPU collectives,
8//N local devices each), running the REAL shard_mapped train step
(parallel/train_step.py) for a few steps over per-process local batches
assembled into global arrays via parallel/mesh.py:global_batch — exactly the
train.py --multihost code path. A 1-process 8-device run over the same
global data is the oracle: loss trajectories and the final parameter
checksum must agree to float-reduction noise.

Usage:
  python scripts/multihost_smoke.py --launch [--num-processes 2] [--steps 3]
  (worker mode is internal)
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
TOTAL_DEVICES = 8
GLOBAL_BATCH = 8
NUM_VIEWS = 2
IMAGE_SIZE = 64


def worker(args) -> None:
    # strip any pre-existing instance of the flag (e.g. set by a pytest
    # conftest or dryrun_multichip) before appending ours — two conflicting
    # instances make jax.device_count() unpredictable
    flags = [
        f for f in os.environ.get("XLA_FLAGS", "").split()
        if not f.startswith("--xla_force_host_platform_device_count")
    ]
    flags.append(
        f"--xla_force_host_platform_device_count={TOTAL_DEVICES // args.num_processes}"
    )
    os.environ["XLA_FLAGS"] = " ".join(flags)
    import jax

    jax.config.update("jax_platforms", "cpu")
    if args.num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=f"127.0.0.1:{args.port}",
            num_processes=args.num_processes,
            process_id=args.process_id,
        )
    assert jax.device_count() == TOTAL_DEVICES, jax.devices()

    import dataclasses

    import numpy as np

    from handmvnet_tpu.config import Config
    from handmvnet_tpu.data.synthetic import synthetic_batch
    from handmvnet_tpu.models import HandMvNet
    from handmvnet_tpu.parallel import (
        create_train_state,
        make_mesh,
        make_optimizer,
        make_train_step,
    )
    from handmvnet_tpu.parallel.mesh import (
        data_sharding, global_batch, replicate_state, warmup_collectives,
    )

    cfg = Config.from_yaml(str(REPO / "configs/release/HO3D_HandMvNet.yaml"))
    cfg = cfg.replace(
        model=dataclasses.replace(cfg.model, selected_views=(0, 1)),
        data=dataclasses.replace(cfg.data, image_size=IMAGE_SIZE, heatmap_size=8),
    )
    model = HandMvNet(cfg=cfg.model, image_size=IMAGE_SIZE, heatmap_size=8)

    # identical global data in every run; this process sees only its slice
    local_bs = GLOBAL_BATCH // args.num_processes
    lo = args.process_id * local_bs
    batches = [
        {
            k: v[lo:lo + local_bs]
            for k, v in synthetic_batch(
                batch_size=GLOBAL_BATCH, num_views=NUM_VIEWS,
                image_size=IMAGE_SIZE, heatmap_size=8, seed=100 + s,
            ).items()
        }
        for s in range(args.steps)
    ]

    mesh = make_mesh()
    warmup_collectives(mesh)  # gloo channels before the long compiles
    tx = make_optimizer(cfg, steps_per_epoch=10)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0), batches[0], tx=tx)
    state = replicate_state(state, mesh)
    step = make_train_step(model, cfg, tx, mesh, accum_steps=1)
    sharding = data_sharding(mesh)

    rng = jax.random.PRNGKey(7)
    losses_out = []
    for s, batch in enumerate(batches):
        state, losses = step(state, global_batch(sharding, batch),
                             jax.random.fold_in(rng, s))
        losses_out.append(float(losses["loss"]))

    checksum = float(
        sum(float(jax.numpy.abs(p).sum()) for p in jax.tree.leaves(state.params))
    )
    result = {"losses": losses_out, "param_checksum": checksum,
              "devices": jax.device_count(), "processes": args.num_processes}
    if args.process_id == 0:
        Path(args.out).write_text(json.dumps(result))
    print(f"[proc {args.process_id}] {result}", flush=True)


def launch(args) -> int:
    tmp = Path(tempfile.mkdtemp(prefix="multihost_smoke_"))
    runs = {}
    for nproc in (1, args.num_processes):
        out = tmp / f"result_{nproc}.json"
        procs = [
            subprocess.Popen(
                [sys.executable, __file__, "--process-id", str(pid),
                 "--num-processes", str(nproc), "--port", str(args.port),
                 "--steps", str(args.steps), "--out", str(out)],
                cwd=REPO,
            )
            for pid in range(nproc)
        ]
        try:
            rcs = [p.wait(timeout=600) for p in procs]
        finally:
            # a hung worker must not leak (it would keep the coordinator
            # port bound and wedge the next invocation)
            for p in procs:
                if p.poll() is None:
                    p.kill()
        if any(rcs):
            print(f"FAIL: worker exit codes {rcs} for nproc={nproc}")
            return 1
        runs[nproc] = json.loads(out.read_text())

    ref, multi = runs[1], runs[args.num_processes]
    print(f"1-proc : {ref}")
    print(f"{args.num_processes}-proc : {multi}")
    # step 0 must match to fp32 noise — it proves the global-batch assembly,
    # state replication, and gradient all-reduce are identical. Later steps
    # see reduction-order differences (gloo ring vs single-process
    # all-reduce) chaotically amplified through Adam: allow geometric slack.
    ok = True
    for k, (a, b) in enumerate(zip(ref["losses"], multi["losses"])):
        rtol = min(1e-5 * (300.0 ** k), 1e-2)
        step_ok = abs(a - b) <= rtol * abs(a)
        print(f"step {k}: {a:.6f} vs {b:.6f} (rtol {rtol:.1e}) "
              f"{'ok' if step_ok else 'MISMATCH'}")
        ok &= step_ok
    ck_rel = abs(ref["param_checksum"] - multi["param_checksum"]) / abs(ref["param_checksum"])
    ck_ok = ck_rel <= 1e-3
    print(f"param checksum rel diff {ck_rel:.2e} {'ok' if ck_ok else 'MISMATCH'}")
    if ok and ck_ok:
        print(f"OK: {args.num_processes}-process run matches the single-process oracle")
        return 0
    print("FAIL")
    return 1


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--launch", action="store_true")
    parser.add_argument("--process-id", type=int, default=0)
    parser.add_argument("--num-processes", type=int, default=2)
    parser.add_argument("--port", type=int, default=12357)
    parser.add_argument("--steps", type=int, default=3)
    parser.add_argument("--out", default="")
    args = parser.parse_args(argv)
    if args.launch:
        return launch(args)
    worker(args)
    return 0


if __name__ == "__main__":
    sys.exit(main())
