"""Execute the AOT serving bundle's TPU lowering on the real chip.

Closes the last untested link in the serving story: `handmvnet_tpu.export`
serializes the full inference step (forward + MANO IK/LBS mesh recovery)
to a StableHLO artifact with cpu+tpu lowerings, and tests/test_export.py
proves round-trip parity — but only on the CPU backend. This script builds
the flagship bundle, reloads it, and runs the *tpu* lowering on the
attached v5e, recording:

  * parity: max |joints_cam| / |vertices| delta between the replayed
    bundle and the live jitted step on the same inputs + weights;
  * throughput: the bench protocol's two figures (chunked-sync per-call
    FPS + lax.scan device FPS) for BOTH the live step and the bundle call,
    as a paired A/B — does the serialize->deserialize->exported.call route
    cost anything vs live jit?

Artifact: EXPORT_TPU_BENCH.json (repo root, or --out). Protocol matches
bench.py (reference src/eval_fps.py:69-97): batch 1, 8 views, 256^2, f32
(the export schema dtype). Harness rules followed (CLAUDE.md): weights are
call-time arguments, never closed over; completion barriers are scalar
VALUE reads (block_until_ready is not trustworthy on the relay); timing is
best-of-3 chunked sync.

Run: timeout 1200 python scripts/verify_export_tpu.py
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


_T0 = time.time()


def _mark(label: str) -> None:
    print(f"[export-verify +{time.time() - _T0:6.1f}s] {label}",
          file=sys.stderr, flush=True)


def _value_read(tree) -> float:
    """Scalar VALUE read of one output leaf — the only trustworthy
    completion barrier on the relayed transport (bench.py module doc)."""
    leaf = tree["joints_cam"] if isinstance(tree, dict) else tree
    return float(leaf[(0,) * leaf.ndim])


def _time_calls(fn, args, iters: int, chunk: int) -> float:
    """Best-of-3 chunked-sync seconds for `iters` calls of fn(*args)."""

    def once() -> float:
        t0 = time.perf_counter()
        done = 0
        while done < iters:
            n = min(chunk, iters - done)
            for _ in range(n):
                res = fn(*args)
            _value_read(res)
            done += n
        return time.perf_counter() - t0

    return min(once() for _ in range(3))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="configs/release/HO3D_HandMvNet.yaml")
    p.add_argument("--views", type=int, default=8)
    p.add_argument("--iters", type=int, default=300)
    p.add_argument("--chunk", type=int, default=100)
    p.add_argument("--scan-frames", type=int, default=50)
    p.add_argument("--warmup", type=int, default=30)
    p.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "EXPORT_TPU_BENCH.json"))
    args = p.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp

    from bench import _random_variables
    from handmvnet_tpu.config import Config
    from handmvnet_tpu.data.synthetic import synthetic_batch
    from handmvnet_tpu.export import (
        export_serving,
        load_bundle,
        make_serving_step,
        save_bundle,
    )
    from handmvnet_tpu.models import HandMvNet
    from handmvnet_tpu.models.joints_to_vertices import joints_to_vertices_fn
    from handmvnet_tpu.models.mano import ManoLayer, synthetic_mano_model

    _mark("backend up: devices()")
    platform = jax.devices()[0].platform
    cfg = Config.from_yaml(args.config)
    cfg = cfg.replace(model=dataclasses.replace(
        cfg.model, selected_views=tuple(range(args.views))))

    model = HandMvNet(cfg=cfg.model, image_size=cfg.data.image_size,
                      heatmap_size=cfg.data.heatmap_size)
    batch = synthetic_batch(batch_size=1, num_views=args.views,
                            with_heatmaps=False, seed=0)
    rgb = jnp.asarray(batch["rgb"], jnp.float32)
    bboxes = jnp.asarray(batch["bboxes"])
    intr = jnp.asarray(batch["intrinsic"])
    variables = _random_variables(model, 1, rgb, bboxes, intr)
    mano = synthetic_mano_model()

    # --- export + save + reload (serialize/deserialize + orbax round trip)
    _mark("export trace+lower (cpu,tpu)")
    t_exp = time.perf_counter()
    exported, in_shapes = export_serving(
        cfg, variables, batch_size=1, platforms=("cpu", "tpu"),
        mano_model=mano)
    export_s = time.perf_counter() - t_exp
    tmp = tempfile.mkdtemp(prefix="handmvnet_bundle_")
    save_bundle(tmp, exported, variables, cfg, in_shapes)
    artifact_mb = os.path.getsize(os.path.join(tmp, "exported.stablehlo")) / 1e6
    _mark(f"bundle saved ({artifact_mb:.1f} MB); reload")
    bundle_fn, meta = load_bundle(tmp)
    assert "tpu" in meta["platforms"], meta["platforms"]

    # --- live step, same weights/inputs (the bench protocol's program)
    step = make_serving_step(
        model, joints_to_vertices_fn(ManoLayer(mano)))
    _mark("compile live step (TPU)")
    live = jax.jit(step).lower(variables, rgb, bboxes, intr).compile()

    # host copies for the bundle call (a served host passes plain arrays)
    rgb_h, bb_h, intr_h = (np.asarray(batch["rgb"], np.float32),
                           np.asarray(batch["bboxes"], np.float32),
                           np.asarray(batch["intrinsic"], np.float32))

    # parity through the PUBLIC path (load_bundle's fn, plain host arrays) —
    # one call; this is what a serving host does
    _mark("parity call (public load_bundle path)")
    out_live = live(variables, rgb, bboxes, intr)
    out_bundle = bundle_fn(rgb_h, bb_h, intr_h)
    jc = np.abs(np.asarray(out_live["joints_cam"]) -
                np.asarray(out_bundle["joints_cam"])).max()
    vx = np.abs(np.asarray(out_live["vertices"]) -
                np.asarray(out_bundle["vertices"])).max()

    # timing uses the deserialized program with DEVICE-resident weights +
    # inputs, matching the live step call-for-call (load_bundle's fn may
    # hold the orbax-restored tree host-side, which would re-upload ~100 MB
    # per call — a transport artifact, not the program's cost)
    from jax import export as jexport

    raw = jexport.deserialize(
        open(os.path.join(tmp, "exported.stablehlo"), "rb").read())

    # AOT-compile the wrapper so per-call timing measures the program, not
    # Exported.call's eager dispatch path
    _mark("compile bundle call (TPU)")
    bundle_call = jax.jit(
        lambda variables, rgb, bboxes, intr:
            raw.call(variables, rgb, bboxes, intr)
    ).lower(variables, rgb, bboxes, intr).compile()

    for _ in range(args.warmup):
        out_live = live(variables, rgb, bboxes, intr)
        out_bundle = bundle_call(variables, rgb, bboxes, intr)
    _value_read(out_live), _value_read(out_bundle)

    _mark("per-call timing")
    live_s = _time_calls(live, (variables, rgb, bboxes, intr),
                         args.iters, args.chunk)
    bundle_s = _time_calls(bundle_call, (variables, rgb, bboxes, intr),
                           args.iters, args.chunk)

    # --- device-sustained figure: K frames per dispatch via lax.scan.
    # exported.call is traceable, so the deserialized program scans exactly
    # like the live step does in bench.py.
    K = args.scan_frames
    key = jax.random.PRNGKey(7)
    rgbK = rgb[None] + (jax.random.normal(key, (K,) + rgb.shape,
                                          jnp.float32) * 0.01)
    bbK = jnp.broadcast_to(bboxes, (K,) + bboxes.shape)
    intrK = jnp.broadcast_to(intr, (K,) + intr.shape)

    def scanned(call):
        def run(variables, rgbK, bbK, intrK):
            def body(carry, xs):
                r, bb, it = xs
                out = call(variables, r, bb, it)
                return carry, (out["joints_cam"][0, 0], out["vertices"][0, 0])
            _, outs = jax.lax.scan(body, 0, (rgbK, bbK, intrK))
            return outs
        return run

    _mark("compile scan programs")
    live_scan = jax.jit(scanned(
        lambda v, r, bb, it: step(v, r, bb, it))).lower(
            variables, rgbK, bbK, intrK).compile()
    bundle_scan = jax.jit(scanned(
        lambda v, r, bb, it: raw.call(v, r, bb, it))).lower(
            variables, rgbK, bbK, intrK).compile()

    def scan_fps(compiled) -> float:
        res = compiled(variables, rgbK, bbK, intrK)
        _ = float(res[0][(0,) * res[0].ndim])
        calls = max(1, args.iters // K)

        def once() -> float:
            t0 = time.perf_counter()
            for _ in range(calls):
                res = compiled(variables, rgbK, bbK, intrK)
            _ = float(res[0][(0,) * res[0].ndim])
            return time.perf_counter() - t0

        return calls * K / min(once() for _ in range(3))

    _mark("scan timing")
    live_dev = scan_fps(live_scan)
    bundle_dev = scan_fps(bundle_scan)

    record = {
        "what": "AOT StableHLO serving bundle executed on the real TPU "
                "(export.py lowering never before run off-CPU)",
        "platform": platform,
        "protocol": f"b1 v{args.views} 256^2 f32 + MANO mesh stage, "
                    f"{args.iters} iters chunk {args.chunk}, "
                    f"scan K={K}, best-of-3, value-read barriers",
        "artifact_mb": round(artifact_mb, 2),
        "export_trace_lower_s": round(export_s, 1),
        "parity_max_joints_cam_m": float(jc),
        "parity_max_vertices_mm": float(vx),
        "live_fps": round(args.iters / live_s, 1),
        "bundle_fps": round(args.iters / bundle_s, 1),
        "live_device_fps": round(live_dev, 1),
        "bundle_device_fps": round(bundle_dev, 1),
        "bundle_vs_live_device": round(bundle_dev / live_dev, 3),
        "bundle_dir": tmp,
    }
    with open(args.out, "w") as f:
        json.dump(record, f, indent=2)
        f.write("\n")
    print(json.dumps(record))


if __name__ == "__main__":
    main()
