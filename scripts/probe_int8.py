"""Measure int8 MXU throughput vs bf16 on this chip, at the flagship's own
dominant shapes (round-5 perf lever: the v5e datasheet rates int8 at 2x the
bf16 MXU rate — 394 TOPS vs 197 TFLOP/s — and no quantized compute path has
ever been probed in this repo).

Rows (each semantically one op, chained K-deep per dispatch so nothing is
elided; scalar VALUE read as the barrier — block_until_ready is not
trustworthy on the relayed transport, see bench.py header; best of 3):

  matmul_{bf16,int8}    [2048,2048] x [2048,2048]  (raw MXU rate calibration)
  conv3_{bf16,int8}     [8,32,32,256] x [3,3,256,256]   — the paper-variant
                        layer3 3x3 (x6 blocks; the backbone's FLOPs center)
  conv1_{bf16,int8}     [8,32,32,1024] x [1,1,1024,256] — the bottleneck 1x1
  dot1_{bf16,int8}      the same 1x1 expressed as a [8192,1024]x[1024,256]
                        dot_general (fallback in case XLA's TPU int8 CONV
                        lowering is missing/slow but the matmul one is fine)

int8 rows accumulate in int32 (preferred_element_type) and chain through a
cheap arithmetic right-shift + clip requantization, so K applies stay a true
sequential dependency without overflow.

Run (real TPU): python scripts/probe_int8.py
Writes INT8_PROBE.json. Verdict feeds the round-5 decision: if int8 convs
run ~2x bf16, a PTQ serving path for the backbone (90% of flagship FLOPs)
is worth building; if XLA's int8 conv lowering loses, record the rejection
with numbers (the BRANCH_PACKING_PROBE.json precedent: measured, not
assumed).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from functools import partial
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def timed_chained(make_inputs, op_fn, requant_fn, K: int,
                  repeats: int = 3) -> float:
    """Seconds per apply: K data-dependent applies inside one dispatch."""
    import jax

    x, k = make_inputs()

    def scanned(x, k):
        def body(h, _):
            y = op_fn(h, k)
            return requant_fn(y, h.dtype), ()

        h, _ = jax.lax.scan(body, x, None, length=K)
        return h

    compiled = jax.jit(scanned).lower(x, k).compile()
    res = compiled(x, k)
    _ = float(res[(0,) * res.ndim])  # warm + barrier

    def once() -> float:
        t0 = time.perf_counter()
        r = compiled(x, k)
        _ = float(r[(0,) * r.ndim])
        return time.perf_counter() - t0

    return min(once() for _ in range(repeats)) / K


def requant_float(y, dtype):
    import jax
    import jax.numpy as jnp

    return (y * jax.lax.rsqrt(jnp.mean(jnp.square(y)) + 1e-6)).astype(dtype)


def requant_int(y, dtype):
    import jax.numpy as jnp
    from jax import lax

    # int32 accumulator -> int8 range via arithmetic shift + clip (cheap VPU
    # work, same flavor as a real requantization epilogue)
    return jnp.clip(lax.shift_right_arithmetic(y, 8), -127, 127).astype(dtype)


def model_row(int8: bool, K: int, calls: int, repeats: int = 3,
              batch: int = 1) -> dict:
    """End-to-end flagship A/B at the bench protocol (batch x 8 views, 256²,
    bf16, forward + MANO IK mesh recovery in the timed region): device-
    sustained FPS via K frames/dispatch lax.scan, value-read barrier —
    exactly bench.py's device_fps methodology — plus the output delta of
    the int8 path vs the exact bf16 path on identical inputs/weights.
    batch>1 probes the batch-serving regime (higher arithmetic intensity,
    where the int8 MXU rate has a chance to show)."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import _random_variables
    from handmvnet_tpu.config import Config
    from handmvnet_tpu.data.synthetic import synthetic_batch
    from handmvnet_tpu.models import HandMvNet
    from handmvnet_tpu.models.joints_to_vertices import joints_to_vertices_fn
    from handmvnet_tpu.models.mano import ManoLayer, synthetic_mano_model

    cfg = Config.from_yaml(
        str(REPO / "configs/release/HO3D_HandMvNet.yaml"))
    mcfg = dataclasses.replace(
        cfg.model, selected_views=tuple(range(8)), backbone_int8=int8)
    model = HandMvNet(cfg=mcfg)
    data = synthetic_batch(batch_size=batch, num_views=8,
                           with_heatmaps=False, seed=0)
    rgb = jnp.asarray(data["rgb"], jnp.bfloat16)
    bboxes = jnp.asarray(data["bboxes"])
    intr = jnp.asarray(data["intrinsic"])
    # weights: built for the PLAIN model so both A/B arms share the exact
    # same tree (test_quant pins tree equality), then bf16-cast like bench
    plain = HandMvNet(cfg=dataclasses.replace(mcfg, backbone_int8=False))
    variables = _random_variables(plain, batch, rgb, bboxes, intr)
    variables = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        variables)
    j2v = joints_to_vertices_fn(ManoLayer(synthetic_mano_model()))

    def step(variables, rgb, bboxes, intr):
        out = model.apply(variables, rgb, bboxes, intr)
        return out["joints_cam"], j2v(out["joints_cam"] * 1000.0), \
            out["joints_crop_img"]

    key = jax.random.PRNGKey(7)
    rgbK = rgb[None] + (jax.random.normal(key, (K,) + rgb.shape, jnp.float32)
                        * 0.01).astype(rgb.dtype)
    bboxesK = jnp.broadcast_to(bboxes, (K,) + bboxes.shape)
    intrK = jnp.broadcast_to(intr, (K,) + intr.shape)

    def scanned(variables, rgbK, bboxesK, intrK):
        def body(carry, xs):
            r, bb, it = xs
            joints, verts, crop = step(variables, r, bb, it)
            return carry, (joints[0, 0], verts[0, 0])
        _, outs = jax.lax.scan(body, 0, (rgbK, bboxesK, intrK))
        return outs

    compiled = jax.jit(scanned).lower(variables, rgbK, bboxesK, intrK).compile()
    res = compiled(variables, rgbK, bboxesK, intrK)
    _ = float(res[0][(0,) * res[0].ndim])  # warm + barrier

    def once() -> float:
        t0 = time.perf_counter()
        for _ in range(calls):
            r = compiled(variables, rgbK, bboxesK, intrK)
        _ = float(r[0][(0,) * r[0].ndim])
        return time.perf_counter() - t0

    device_fps = calls * K * batch / min(once() for _ in range(repeats))

    # output delta vs the exact path on the SAME weights/inputs (random
    # weights — indicative of quantization noise scale, not of trained-
    # checkpoint accuracy; the released-weight delta needs real assets)
    pstep = jax.jit(
        lambda v, r, b, i: plain.apply(v, r, b, i))
    qstep = jax.jit(
        lambda v, r, b, i: model.apply(v, r, b, i))
    po = pstep(variables, rgb, bboxes, intr)
    qo = qstep(variables, rgb, bboxes, intr)
    dcrop = np.abs(np.asarray(qo["joints_crop_img"], np.float32)
                   - np.asarray(po["joints_crop_img"], np.float32))
    djoint = np.abs(np.asarray(qo["joints_cam"], np.float32)
                    - np.asarray(po["joints_cam"], np.float32)) * 1000.0
    return {
        "device_fps": round(device_fps, 1),
        "crop_px_delta_median": round(float(np.median(dcrop)), 4),
        "crop_px_delta_max": round(float(np.max(dcrop)), 4),
        "joints_mm_delta_median": round(float(np.median(djoint)), 4),
        "joints_mm_delta_max": round(float(np.max(djoint)), 4),
    }


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--scan", type=int, default=100)
    parser.add_argument("--model-scan", type=int, default=10,
                        help="frames per dispatch for the integrated A/B")
    parser.add_argument("--model-calls", type=int, default=10,
                        help="dispatches per timed region for the A/B")
    parser.add_argument("--model-batches", type=int, nargs="+", default=[1],
                        help="batch sizes for the integrated A/B (1 = the "
                             "flagship protocol; 8 probes batch serving)")
    parser.add_argument("--skip-model", action="store_true")
    parser.add_argument("--platform", default="",
                        help="force a jax platform (cpu for CI sanity; the "
                             "axon plugin ignores JAX_PLATFORMS, only "
                             "jax.config.update wins)")
    parser.add_argument("--out", default=str(REPO / "INT8_PROBE.json"))
    args = parser.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    from jax import lax

    key = jax.random.PRNGKey(0)

    def randf(shape, dtype):
        return (jax.random.normal(key, shape, jnp.float32) * 0.1).astype(dtype)

    def randi(shape):
        return jax.random.randint(key, shape, -127, 128, jnp.int8)

    conv = partial(
        lax.conv_general_dilated,
        window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )

    def matmul(h, k, acc):
        return lax.dot_general(h, k, (((1,), (0,)), ((), ())),
                               preferred_element_type=acc)

    M = 2048
    B, HW, C3, CIN1, COUT1 = 8, 32, 256, 1024, 256
    cases = {
        "matmul_bf16": (
            lambda: (randf((M, M), jnp.bfloat16), randf((M, M), jnp.bfloat16)),
            partial(matmul, acc=jnp.float32), requant_float,
            2 * M * M * M,
        ),
        "matmul_int8": (
            lambda: (randi((M, M)), randi((M, M))),
            partial(matmul, acc=jnp.int32), requant_int,
            2 * M * M * M,
        ),
        "conv3_bf16": (
            lambda: (randf((B, HW, HW, C3), jnp.bfloat16),
                     randf((3, 3, C3, C3), jnp.bfloat16)),
            lambda h, k: conv(h, k, preferred_element_type=jnp.float32),
            requant_float,
            2 * 9 * B * HW * HW * C3 * C3,
        ),
        "conv3_int8": (
            lambda: (randi((B, HW, HW, C3)), randi((3, 3, C3, C3))),
            lambda h, k: conv(h, k, preferred_element_type=jnp.int32),
            requant_int,
            2 * 9 * B * HW * HW * C3 * C3,
        ),
        # 1x1 chains COUT1 -> next input; keep square by projecting back:
        # express as two steps is overkill — instead chain a square 1x1
        # [1024->1024]? No: measure the real 1024->256 by chaining through a
        # cheap pad back to 1024 channels (tile 4x). The pad is VPU-trivial
        # next to the 0.5 GFLOP conv.
        "conv1_bf16": (
            lambda: (randf((B, HW, HW, CIN1), jnp.bfloat16),
                     randf((1, 1, CIN1, COUT1), jnp.bfloat16)),
            lambda h, k: conv(h, k, preferred_element_type=jnp.float32),
            lambda y, dt: jnp.tile(requant_float(y, dt), (1, 1, 1, 4)),
            2 * B * HW * HW * CIN1 * COUT1,
        ),
        "conv1_int8": (
            lambda: (randi((B, HW, HW, CIN1)), randi((1, 1, CIN1, COUT1))),
            lambda h, k: conv(h, k, preferred_element_type=jnp.int32),
            lambda y, dt: jnp.tile(requant_int(y, dt), (1, 1, 1, 4)),
            2 * B * HW * HW * CIN1 * COUT1,
        ),
        "dot1_bf16": (
            lambda: (randf((B * HW * HW, CIN1), jnp.bfloat16),
                     randf((CIN1, COUT1), jnp.bfloat16)),
            partial(matmul, acc=jnp.float32),
            lambda y, dt: jnp.tile(requant_float(y, dt), (1, 4)),
            2 * B * HW * HW * CIN1 * COUT1,
        ),
        "dot1_int8": (
            lambda: (randi((B * HW * HW, CIN1)), randi((CIN1, COUT1))),
            partial(matmul, acc=jnp.int32),
            lambda y, dt: jnp.tile(requant_int(y, dt), (1, 4)),
            2 * B * HW * HW * CIN1 * COUT1,
        ),
    }

    result = {
        "device": str(jax.devices()[0]),
        "scan_len": args.scan,
        "rows": {},
    }
    for name, (mk, fn, rq, flops) in cases.items():
        try:
            sec = timed_chained(mk, fn, rq, args.scan)
            result["rows"][name] = {
                "us_per_apply": round(sec * 1e6, 2),
                "tops": round(flops / sec / 1e12, 2),
            }
        except Exception as e:  # noqa: BLE001 - record per-case
            result["rows"][name] = {"error": f"{type(e).__name__}: {e}"[:300]}
        print(name, json.dumps(result["rows"][name]), file=sys.stderr)

    for stem in ("matmul", "conv3", "conv1", "dot1"):
        b = result["rows"].get(f"{stem}_bf16", {}).get("us_per_apply")
        i = result["rows"].get(f"{stem}_int8", {}).get("us_per_apply")
        if b and i:
            result["rows"][f"{stem}_int8"]["speedup_vs_bf16"] = round(b / i, 3)

    if not args.skip_model:
        for batch in args.model_batches:
            suffix = "" if batch == 1 else f"_b{batch}"
            for int8 in (False, True):
                name = ("model_int8" if int8 else "model_bf16") + suffix
                try:
                    result["rows"][name] = model_row(
                        int8, args.model_scan, args.model_calls, batch=batch)
                except Exception as e:  # noqa: BLE001 - record per-case
                    result["rows"][name] = {
                        "error": f"{type(e).__name__}: {e}"[:300]}
                print(name, json.dumps(result["rows"][name]), file=sys.stderr)
            mb = result["rows"].get(f"model_bf16{suffix}", {}).get("device_fps")
            mi = result["rows"].get(f"model_int8{suffix}", {}).get("device_fps")
            if mb and mi:
                result["rows"][f"model_int8{suffix}"]["speedup_vs_bf16"] = \
                    round(mi / mb, 3)

    mi_row = result["rows"].get("model_int8", {})
    sp = mi_row.get("speedup_vs_bf16")
    if sp is not None:
        mm = mi_row.get("joints_mm_delta_median")
        sp8 = result["rows"].get("model_int8_b8", {}).get("speedup_vs_bf16")
        b8 = f" Batch-serving b8 A/B: {sp8}x." if sp8 is not None else ""
        result["verdict"] = (
            f"int8 PTQ backbone: {sp}x end-to-end at the flagship protocol "
            f"(raw MXU rows above), {mm} mm median joint delta on random "
            f"weights.{b8} Disposition: stays opt-in (model.backbone_int8, "
            f"default OFF) — the flagship's conv shapes are bandwidth-bound "
            f"(0.6 MFU), so the int8 MXU rate barely shows end-to-end, and "
            f"a noise-level speedup does not justify non-exact math. "
            f"Mechanism + parity bounds kept (ops/quant.py, tests/"
            f"test_quant.py)."
            if sp < 1.15 and (sp8 is None or sp8 < 1.15) else
            f"int8 PTQ backbone: {sp}x end-to-end at the flagship protocol, "
            f"{mm} mm median joint delta on random weights.{b8} Measured "
            f"win at at least one protocol — still opt-in (non-exact math; "
            f"trained-checkpoint accuracy delta needs real assets), but "
            f"worth flipping on for throughput-bound serving."
        )
    Path(args.out).write_text(json.dumps(result, indent=2) + "\n")
    print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
