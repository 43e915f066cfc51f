"""A/B the space-to-depth stem PRODUCTION modes on the real TPU (VERDICT r4
#3: reclaim the ~6% copy overhead the materialized transpose costs).

TRACE_ANALYSIS_S2D.json: with the round-4 "transpose" mode the flagship
frame spends ~12.5% in copy kernels (~90 us/frame attributable to the
[8,256,256,3] -> [8,128,128,12] shuffle) + 79.7 us in the s2d conv itself.
All candidate modes are exact (tests/test_stem_modes.py); this probe
measures which is fastest, stem-only and end-to-end at the flagship
protocol:

  * transpose      — round 4's shipping path (baseline)
  * rowsplit       — row-phase slices + free reshapes + fusable concat
  * identity_conv  — the shuffle as a one-hot [2,2,3,12] conv
  * pallas         — ops/pallas/stem.stem_s2d_fused (im2col in VMEM, one
                     MXU matmul; shuffled layout never touches HBM)
  * plain          — no s2d at all (the 7x7/s2 conv), for reference

Writes STEM_S2D_FUSE_PROBE.json. Usage:
  python scripts/probe_stem_fuse.py [--views 8] [--frames 50]
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

MODES = ("transpose", "rowsplit", "identity_conv", "pallas")


def _scan_time(fn, args, frames: int, reps: int) -> float:
    """best-of-reps wall time of one scanned dispatch (value-read barrier)."""
    _ = float(fn(*args))  # compile + warm
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        val = float(fn(*args))
        dt = time.perf_counter() - t0
        best = dt if best is None or dt < best else best
        assert val == val, "NaN"
    return best


def measure_stem_only(mode: str | None, views: int, frames: int,
                      reps: int) -> dict:
    """mode=None -> the plain 7x7/s2 conv."""
    import handmvnet_tpu.models.backbones.resnet as resnet_mod
    from handmvnet_tpu.models.backbones.resnet import SpaceToDepthStem

    rng = jax.random.PRNGKey(0)
    # distinct input per scan step: a loop-invariant body gets hoisted and
    # the timing reads ~3x high (memory: scan-bench hoisting)
    xk = jax.random.normal(rng, (frames, views, 256, 256, 3), jnp.bfloat16)
    k = jax.random.normal(rng, (7, 7, 3, 64), jnp.float32) * 0.05

    if mode is None:
        def one(kern, inp):
            return jax.lax.conv_general_dilated(
                inp, kern.astype(inp.dtype), (2, 2), ((3, 3), (3, 3)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
    else:
        resnet_mod.STEM_S2D_MODE = mode
        mod = SpaceToDepthStem(features=64)

        def one(kern, inp):
            return mod.apply({"params": {"kernel": kern}}, inp)

    def scanned(kern, inps):
        def body(_, inp):
            return None, one(kern, inp).sum()

        _, vals = jax.lax.scan(body, None, inps)
        return vals[-1]

    best = _scan_time(jax.jit(scanned), (k, xk), frames, reps)
    return {"us_per_call": round(best / frames * 1e6, 1)}


def measure_model(mode: str, views: int, frames: int, reps: int,
                  batch: int = 1) -> dict:
    from bench import _random_variables
    from handmvnet_tpu.config import Config
    from handmvnet_tpu.data.synthetic import synthetic_batch
    from handmvnet_tpu.models import HandMvNet
    import handmvnet_tpu.models.backbones.resnet as resnet_mod

    resnet_mod.STEM_S2D_ROWS = (batch * views,)
    resnet_mod.STEM_S2D_MODE = mode

    cfg = Config.from_yaml(REPO / "configs/release/HO3D_HandMvNet.yaml")
    cfg = cfg.replace(model=dataclasses.replace(
        cfg.model,
        selected_views=tuple(range(views)),
        resnet_stem_s2d=True,
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

    best = _scan_time(jax.jit(scanned), (variables, rgbK, bboxes, intr),
                      frames, reps)
    return {
        "device_fps": round(batch * frames / best, 1),
        "ms_per_frame": round(best / (batch * frames) * 1e3, 4),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--views", type=int, default=8)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--frames", type=int, default=50)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--skip-stem-only", action="store_true")
    ap.add_argument("--modes", default=",".join(MODES),
                    help="comma-separated subset to (re-)measure; existing "
                         "rows in --out are kept (selective re-runs after a "
                         "kernel fix)")
    ap.add_argument("--out", default=str(REPO / "STEM_S2D_FUSE_PROBE.json"))
    args = ap.parse_args()
    modes = tuple(m for m in args.modes.split(",") if m)

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_handmvnet")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    out = {
        "protocol": (
            f"flagship resnet50_paper v{args.views} b{args.batch} bf16, "
            f"{args.frames} frames/dispatch via lax.scan, scalar value "
            f"read, best of {args.reps}; stem-only rows scan the stem "
            f"alone on [{args.views},256,256,3]"
        ),
        "device": jax.devices()[0].device_kind,
    }
    if Path(args.out).exists():
        prev = json.loads(Path(args.out).read_text())
        out.update({k: v for k, v in prev.items()
                    if k not in ("protocol", "device")})
    if not args.skip_stem_only:
        for mode in (None,) + modes:
            name = f"stem_only_{mode or 'plain'}"
            try:
                out[name] = measure_stem_only(mode, args.views, args.frames,
                                              args.reps)
            except Exception as e:  # noqa: BLE001
                out[name] = {"error": f"{type(e).__name__}: {e}"[:300]}
            print(name, json.dumps(out[name]), file=sys.stderr)
            Path(args.out).write_text(json.dumps(out, indent=2) + "\n")
    for mode in modes:
        name = f"model_{mode}"
        try:
            out[name] = measure_model(mode, args.views, args.frames,
                                      args.reps, args.batch)
        except Exception as e:  # noqa: BLE001
            out[name] = {"error": f"{type(e).__name__}: {e}"[:300]}
        print(name, json.dumps(out[name]), file=sys.stderr)
        Path(args.out).write_text(json.dumps(out, indent=2) + "\n")

    base = out.get("model_transpose", {}).get("device_fps")
    if base:
        for mode in MODES[1:]:
            fps = out.get(f"model_{mode}", {}).get("device_fps")
            if fps:
                out[f"speedup_{mode}_vs_transpose"] = round(fps / base, 3)
    Path(args.out).write_text(json.dumps(out, indent=2) + "\n")
    print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
