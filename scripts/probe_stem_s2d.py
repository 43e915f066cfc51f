"""A/B the ResNet stem space-to-depth rewrite on the real TPU.

Measures the flagship scanned device throughput (bench.py methodology:
K frames/dispatch via lax.scan, scalar value read as the barrier, best of
3) with ``resnet_stem_s2d`` on vs off, plus the stem conv in isolation.
Writes STEM_S2D_PROBE.json.

Motivation: the flagship XProf trace attributes 347 us/frame = 22.3% of
the 8-view forward to the plain 7x7/s2 stem (TRACE_ANALYSIS.json,
fusion.1992 — 3 input channels fill 3/128 MXU lanes). The rewrite is an
exact algebraic identity (see resnet.SpaceToDepthStem).

Usage:  python scripts/probe_stem_s2d.py [--views 8] [--frames 50]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def measure_model(stem_s2d: bool, views: int, frames: int, reps: int,
                  batch: int = 1) -> dict:
    from bench import _random_variables
    from handmvnet_tpu.config import Config
    from handmvnet_tpu.data.synthetic import synthetic_batch
    from handmvnet_tpu.models import HandMvNet

    from handmvnet_tpu.models.backbones import resnet

    # force the gate open for the measured shape, so stem_s2d=True really
    # compares the rewrite even at row counts outside the shipped gate
    resnet.STEM_S2D_ROWS = (batch * views,)

    cfg = Config.from_yaml(REPO / "configs/release/HO3D_HandMvNet.yaml")
    cfg = cfg.replace(model=dataclasses.replace(
        cfg.model,
        selected_views=tuple(range(views)),
        resnet_stem_s2d=stem_s2d,
    ))
    model = HandMvNet(cfg=cfg.model)

    b = synthetic_batch(batch_size=batch, num_views=views,
                        with_heatmaps=False, seed=0)
    rgb = jnp.asarray(b["rgb"], jnp.bfloat16)
    bboxes = jnp.asarray(b["bboxes"])
    intr = jnp.asarray(b["intrinsic"])
    variables = _random_variables(model, 1, rgb, bboxes, intr)
    variables = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        variables,
    )

    # distinct per-iteration frames (bench.py's rgbK discipline): a scan
    # whose body consumes the same operands every step is loop-invariant
    # and XLA may hoist/CSE the whole forward out of the loop
    key = jax.random.PRNGKey(7)
    rgbK = rgb[None] + (
        jax.random.normal(key, (frames,) + rgb.shape, jnp.float32) * 0.01
    ).astype(rgb.dtype)

    def scanned(v, rk, bb, it):
        def body(_, r):
            out = model.apply(v, r, bb, it)
            return None, out["joints_cam"][0, 0, 0]

        _, vals = jax.lax.scan(body, None, rk)
        return vals[-1]

    fn = jax.jit(scanned)
    _ = float(fn(variables, rgbK, bboxes, intr))  # compile + warm
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        val = float(fn(variables, rgbK, bboxes, intr))
        dt = time.perf_counter() - t0
        best = dt if best is None or dt < best else best
        assert val == val, "NaN"
    return {
        "device_fps": round(batch * frames / best, 1),
        "ms_per_frame": round(best / (batch * frames) * 1e3, 4),
    }


def measure_stem_only(stem_s2d: bool, views: int, frames: int,
                      reps: int) -> dict:
    from handmvnet_tpu.models.backbones.resnet import SpaceToDepthStem

    rng = jax.random.PRNGKey(0)
    # distinct input per scan step (see measure_model note on hoisting)
    xk = jax.random.normal(rng, (frames, views, 256, 256, 3), jnp.bfloat16)
    k = (jax.random.normal(rng, (7, 7, 3, 64), jnp.float32) * 0.05)

    if stem_s2d:
        mod = SpaceToDepthStem(features=64)

        def one(kern, inp):
            return mod.apply({"params": {"kernel": kern}}, inp)
    else:
        def one(kern, inp):
            return jax.lax.conv_general_dilated(
                inp, kern.astype(inp.dtype), (2, 2), ((3, 3), (3, 3)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def scanned(kern, inps):
        def body(_, inp):
            return None, one(kern, inp).sum()

        _, vals = jax.lax.scan(body, None, inps)
        return vals[-1]

    fn = jax.jit(scanned)
    _ = float(fn(k, xk))
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = float(fn(k, xk))
        dt = time.perf_counter() - t0
        best = dt if best is None or dt < best else best
    return {"us_per_call": round(best / frames * 1e6, 1)}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--views", type=int, default=8)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--skip-stem-only", action="store_true")
    ap.add_argument("--frames", type=int, default=50)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default=str(REPO / "STEM_S2D_PROBE.json"))
    args = ap.parse_args()

    out = {
        "protocol": (
            f"flagship resnet50_paper {args.views} views batch "
            f"{args.batch} bf16, "
            f"{args.frames} frames/dispatch via lax.scan, scalar value "
            f"read, best of {args.reps}; stem-only rows scan the stem conv "
            f"alone on [{args.views},256,256,3]"
        ),
        "device": jax.devices()[0].device_kind,
    }
    rows = [] if args.skip_stem_only else [
        ("stem_only_plain", lambda: measure_stem_only(False, args.views,
                                                      args.frames, args.reps)),
        ("stem_only_s2d", lambda: measure_stem_only(True, args.views,
                                                    args.frames, args.reps)),
    ]
    rows += [
        ("model_plain", lambda: measure_model(False, args.views,
                                              args.frames, args.reps,
                                              args.batch)),
        ("model_s2d", lambda: measure_model(True, args.views,
                                            args.frames, args.reps,
                                            args.batch)),
    ]
    for name, fn in rows:
        try:
            out[name] = fn()
        except Exception as e:  # noqa: BLE001
            out[name] = {"error": f"{type(e).__name__}: {e}"[:300]}
        print(name, json.dumps(out[name]), file=sys.stderr)

    if "device_fps" in out.get("model_plain", {}) and \
            "device_fps" in out.get("model_s2d", {}):
        out["speedup"] = round(
            out["model_s2d"]["device_fps"] / out["model_plain"]["device_fps"],
            3,
        )
    Path(args.out).write_text(json.dumps(out, indent=2) + "\n")
    print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
