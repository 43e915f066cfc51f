"""Capture a real-TPU XLA/XProf trace of the flagship forward.

Proves the §5.1 profiling subsystem (utils/profiling.trace) on actual
hardware — the reference has no first-party profiler at all (SURVEY.md §5.1).
Captures a K-frame scanned dispatch (bench.py's device-throughput probe
graph: forward + on-device mesh, per-frame semantics) under jax.profiler and
records what landed in TRACE_CAPTURE.json: whether the relayed axon backend
supports device tracing, the trace payload size, and the event files written.

Run LAST among TPU jobs: tracing is a control-plane feature of the tunneled
runtime and its behavior on this relay is exactly what we are recording.

  python scripts/capture_trace.py [--logdir traces/flagship] [--frames 50]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

CFG = "configs/release/HO3D_HandMvNet.yaml"


def _build(frames: int, cfg_path: str = CFG):
    """The bench.py scan-probe graph at the flagship protocol (b=1, v=8,
    bf16, vertices on), compiled; returns (callable, args) where calling
    reads one scalar (a real execution barrier on this relay)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from bench import _random_variables
    from handmvnet_tpu.config import Config
    from handmvnet_tpu.data.synthetic import synthetic_batch
    from handmvnet_tpu.models import HandMvNet
    from handmvnet_tpu.models.joints_to_vertices import joints_to_vertices_fn
    from handmvnet_tpu.models.mano import ManoLayer, synthetic_mano_model

    cfg = Config.from_yaml(REPO / cfg_path)
    cfg = cfg.replace(model=dataclasses.replace(
        cfg.model, selected_views=tuple(range(8))))
    model = HandMvNet(cfg=cfg.model)
    b = synthetic_batch(batch_size=1, num_views=8, with_heatmaps=False, seed=0)
    rgb = jnp.asarray(b["rgb"], jnp.bfloat16)
    bboxes = jnp.asarray(b["bboxes"])
    intr = jnp.asarray(b["intrinsic"])
    variables = _random_variables(model, 1, rgb, bboxes, intr)
    variables = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        variables,
    )
    j2v = joints_to_vertices_fn(ManoLayer(synthetic_mano_model()))

    key = jax.random.PRNGKey(7)
    rgbK = rgb[None] + (jax.random.normal(
        key, (frames,) + rgb.shape, jnp.float32) * 0.01).astype(rgb.dtype)
    bboxesK = jnp.broadcast_to(bboxes, (frames,) + bboxes.shape)
    intrK = jnp.broadcast_to(intr, (frames,) + intr.shape)

    def scanned(variables, rgbK, bboxesK, intrK):
        def body(carry, xs):
            r, bb, it = xs
            out = model.apply(variables, r, bb, it)
            joints = out["joints_cam"]
            return carry, (joints[0, 0], j2v(joints * 1000.0)[0, 0])
        _, outs = jax.lax.scan(body, 0, (rgbK, bboxesK, intrK))
        return outs

    compiled = jax.jit(scanned).lower(variables, rgbK, bboxesK, intrK).compile()
    fargs = (variables, rgbK, bboxesK, intrK)

    def run() -> float:
        res = compiled(*fargs)
        return float(res[0][(0,) * res[0].ndim])  # value read = barrier

    return run


def _build_train(steps: int, cfg_path: str = CFG, batch_size: int = 16,
                 views: int = 5):
    """The bench_matrix train device-throughput graph (HO3D recipe: bs16 x
    v5, bf16 compute + fp32 master params, per-block remat, all loss terms
    incl. g2d/p2d reprojection, AdamW + clip), K steps per dispatch via
    lax.scan; calling reads one scalar loss (a real barrier). This is the
    98.2 ms/step, 0.345-MFU path VERDICT r4 #1 wants attributed.
    Reference path being traced: src/models/handmvnet.py:443-466 + :268-277.
    """
    import dataclasses

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

    cfg = Config.from_yaml(REPO / cfg_path)
    cfg = cfg.replace(
        train=dataclasses.replace(
            cfg.train, compute_dtype="bfloat16", accumulate_batch=1
        ),
    )
    model = HandMvNet(cfg=cfg.model,
                      remat=resolve_remat(cfg, n_devices=1, accum_steps=1,
                                          batch_size=batch_size,
                                          num_views=views))
    mesh = make_mesh()
    batch = synthetic_batch(batch_size=batch_size, num_views=views, seed=0)
    tx = make_optimizer(cfg, steps_per_epoch=100)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0), batch, tx=tx)
    step = make_train_step(model, cfg, tx, mesh, accum_steps=1)
    sharding = data_sharding(mesh)
    dbatch = {k: jax.device_put(v, sharding) for k, v in batch.items()}
    rng = jax.random.PRNGKey(1)

    def k_steps(state, dbatch, rng):
        def body(carry, _):
            st, r = carry
            r_step, r = jax.random.split(r)
            st, losses = step(st, dbatch, r_step)
            return (st, r), losses["loss"]

        (st, _), ls = jax.lax.scan(body, (state, rng), None, length=steps)
        return st, ls

    # NOT donated: the traced run calls it twice (warmup + capture) with the
    # same state buffers
    compiled = jax.jit(k_steps).lower(state, dbatch, rng).compile()

    def run() -> float:
        st, ls = compiled(state, dbatch, rng)
        return float(ls[-1])  # value read = barrier

    return run


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--logdir", default=str(REPO / "traces" / "flagship"))
    parser.add_argument("--frames", type=int, default=50)
    parser.add_argument("--config", default=CFG,
                        help="release config to trace (e.g. the HRNet one)")
    parser.add_argument("--out", default=str(REPO / "TRACE_CAPTURE.json"))
    parser.add_argument("--train", action="store_true",
                        help="trace the TRAIN step (bs16 x v5 bf16 + remat, "
                             "--frames steps per dispatch via lax.scan) "
                             "instead of the inference forward")
    args = parser.parse_args()

    # resolve early: a relative --logdir otherwise breaks relative_to(REPO)
    args.logdir = str(Path(args.logdir).resolve())
    record: dict = {"logdir": str(Path(args.logdir).relative_to(REPO)
                                  if str(args.logdir).startswith(str(REPO))
                                  else args.logdir),
                    "frames": args.frames,
                    "config": args.config}
    t0 = time.time()
    try:
        import jax

        record["device"] = str(jax.devices()[0].device_kind)
        if args.train:
            record["mode"] = "train"
            run = _build_train(args.frames, args.config)
        else:
            run = _build(args.frames, args.config)
        # warm up OUTSIDE the trace so the capture shows steady-state exec,
        # not compilation
        run()
        from handmvnet_tpu.utils.profiling import trace

        logdir = Path(args.logdir)
        logdir.mkdir(parents=True, exist_ok=True)
        with trace(str(logdir)):
            record["value_read"] = run()
        files = sorted(p for p in logdir.rglob("*") if p.is_file())
        record["trace_files"] = [str(p.relative_to(REPO)) for p in files]
        record["trace_bytes"] = sum(p.stat().st_size for p in files)
        record["ok"] = bool(files)
        if not files:
            record["note"] = ("start/stop_trace returned without error but "
                              "wrote no events — device tracing unsupported "
                              "through this relay")
    except Exception as e:  # record the failure mode, never crash the queue
        record["ok"] = False
        record["error"] = f"{type(e).__name__}: {e}"[:400]
    record["wall_s"] = round(time.time() - t0, 1)
    Path(args.out).write_text(json.dumps(record, indent=2) + "\n")
    print(json.dumps(record))


if __name__ == "__main__":
    main()
