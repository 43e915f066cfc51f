"""Measure candidate reformulations of HRNet-w40's lane-underfilled branch
convs (ROADMAP item 5 / VERDICT r3 #3: 5.61 ms/frame measured vs a computed
>=4.3 ms/frame lane-utilization ceiling; the gap is the 208 sequential
40/80-channel branch convs whose output width fills 40/128 MXU lanes).

Formulations timed, each semantically a batch of B independent 3x3 convs
C -> C at HxW (the branch-conv shape; defaults match stage-4 branch 0 at
the 8-view protocol: B=8, 64x64, C=40):

  baseline   [B, H, W, C]   x [3, 3, C, C]        (what HRNet does today)
  grouped    [1, H, W, B*C] x fgc=B               (batch folded into
             channels as a grouped conv: 8 x 40 = 320-lane output IF XLA's
             TPU lowering runs groups natively on the MXU)
  blockdiag  [1, H, W, B*C] x [3, 3, B*C, B*C]    (dense block-diagonal
             kernel: 100% lane fill but B x the MACs — the upper bound on
             what grouped can cost if XLA densifies it)
  widedummy  [B, H, W, 128] x [3, 3, 128, 128]    (the 128-lane rate the
             ceiling math assumes, for calibration)

Each timing: K applies per dispatch via lax.scan (sequential dependency so
nothing is elided), scalar VALUE read as the barrier (block_until_ready is
not trustworthy on the relayed transport — bench.py header), best of 3.

Additionally measures the INTEGRATED path end-to-end: the full
HRNetBackbone-w40 at the 8-view protocol shape with
HRModule.branch_grouped off vs on (the shipped, parity-tested
implementation of the `grouped` formulation — models/backbones/hrnet.py
_branch_grouped). K chained applies per dispatch (outputs folded back into
the input so nothing is elided), scalar value-read barrier.

Run (real TPU): python scripts/probe_branch_packing.py
Writes BRANCH_PACKING_PROBE.json; the verdict feeds the ROADMAP ledger —
either a winning formulation to flip on (config
model.hrnet_branch_grouped), or a recorded rejection with numbers.
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


def timed_conv(make_inputs, conv_fn, K: int, repeats: int = 3) -> float:
    """Seconds per apply: K data-dependent applies inside one dispatch."""
    import jax
    import jax.numpy as jnp

    x, k = make_inputs()

    def scanned(x, k):
        def body(h, _):
            y = conv_fn(h, k)
            # renormalize so K chained convs neither overflow nor denormal
            y = y * jax.lax.rsqrt(jnp.mean(jnp.square(y)) + 1e-6)
            return y, ()
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


def timed_backbone(grouped: bool, dt, batch: int = 8, image: int = 256,
                   K: int = 20, repeats: int = 3) -> float:
    """Seconds per full HRNetBackbone-w40 eval apply at the 8-view protocol
    shape, branch_grouped off/on; K chained applies per dispatch (each
    iteration's input is perturbed by the previous outputs so the scan is a
    true sequential dependency)."""
    import jax
    import jax.numpy as jnp

    from handmvnet_tpu.models.backbones.hrnet import HRNetBackbone

    model = HRNetBackbone(width="w40", branch_grouped=grouped)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (batch, image, image, 3), dt) * 0.3
    v = jax.jit(lambda k, x: model.init(k, x, False))(key, x)
    if dt == jnp.bfloat16:
        # match the bench's mixed-precision eval: params in bf16 on the MXU
        v = jax.tree.map(
            lambda p: p.astype(dt) if p.dtype == jnp.float32 else p, v
        )

    def chained(v, x):
        def body(h, _):
            outs = model.apply(v, h, False)
            s = sum(jnp.mean(jnp.square(o.astype(jnp.float32))) for o in outs)
            h = h * (0.999 + 1e-6 * jax.lax.rsqrt(s + 1e-6)).astype(h.dtype)
            return h, ()

        h, _ = jax.lax.scan(body, x, None, length=K)
        return h

    compiled = jax.jit(chained).lower(v, x).compile()
    res = compiled(v, x)
    _ = float(res[(0,) * res.ndim])  # warm + barrier

    def once() -> float:
        t0 = time.perf_counter()
        r = compiled(v, x)
        _ = float(r[(0,) * r.ndim])
        return time.perf_counter() - t0

    return min(once() for _ in range(repeats)) / K


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--hw", type=int, default=64)
    parser.add_argument("--channels", type=int, default=40)
    parser.add_argument("--scan", type=int, default=200)
    parser.add_argument("--image", type=int, default=256,
                        help="input resolution for the integrated model A/B")
    parser.add_argument("--dtype", default="bfloat16")
    parser.add_argument("--platform", default="",
                        help="force a jax platform (e.g. cpu for CI sanity; "
                             "the axon plugin ignores JAX_PLATFORMS, only "
                             "jax.config.update wins)")
    parser.add_argument("--out", default=str(REPO / "BRANCH_PACKING_PROBE.json"))
    args = parser.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    B, H, C = args.batch, args.hw, args.channels
    key = jax.random.PRNGKey(0)

    conv = partial(
        jax.lax.conv_general_dilated,
        window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )

    def baseline_inputs():
        x = jax.random.normal(key, (B, H, H, C), dt)
        k = jax.random.normal(key, (3, 3, C, C), dt) * 0.1
        return x, k

    def grouped_inputs():
        x = jax.random.normal(key, (1, H, H, B * C), dt)
        k = jax.random.normal(key, (3, 3, C, B * C), dt) * 0.1
        return x, k

    def blockdiag_inputs():
        x = jax.random.normal(key, (1, H, H, B * C), dt)
        blocks = jax.random.normal(key, (B, 3, 3, C, C), dt) * 0.1
        k = jnp.zeros((3, 3, B * C, B * C), dt)
        for i in range(B):
            k = k.at[:, :, i * C:(i + 1) * C, i * C:(i + 1) * C].set(blocks[i])
        return x, k

    def wide_inputs():
        x = jax.random.normal(key, (B, H, H, 128), dt)
        k = jax.random.normal(key, (3, 3, 128, 128), dt) * 0.1
        return x, k

    cases = {
        "baseline": (baseline_inputs, conv,
                     2 * 9 * B * H * H * C * C),
        "grouped": (grouped_inputs,
                    partial(conv, feature_group_count=B),
                    2 * 9 * B * H * H * C * C),
        "blockdiag": (blockdiag_inputs, conv,
                      2 * 9 * H * H * (B * C) * (B * C)),
        "widedummy": (wide_inputs, conv,
                      2 * 9 * B * H * H * 128 * 128),
    }

    result = {
        "shape": {"batch": B, "hw": H, "channels": C, "dtype": args.dtype},
        "device": str(jax.devices()[0]),
        "scan_len": args.scan,
        "rows": {},
    }
    useful_flops = 2 * 9 * B * H * H * C * C  # the branch conv's real work
    for name, (mk, fn, flops) in cases.items():
        try:
            sec = timed_conv(mk, fn, args.scan)
            result["rows"][name] = {
                "us_per_apply": round(sec * 1e6, 2),
                "tflops_executed": round(flops / sec / 1e12, 2),
                "tflops_useful": round(useful_flops / sec / 1e12, 2),
            }
        except Exception as e:  # noqa: BLE001 - record per-case
            result["rows"][name] = {"error": f"{type(e).__name__}: {e}"[:200]}
        print(name, json.dumps(result["rows"][name]), file=sys.stderr)

    base = result["rows"].get("baseline", {}).get("us_per_apply")
    for name, row in result["rows"].items():
        if base and "us_per_apply" in row:
            row["speedup_vs_baseline"] = round(base / row["us_per_apply"], 3)

    # integrated A/B: the full backbone with the shipped branch_grouped
    # implementation off vs on (what flipping model.hrnet_branch_grouped
    # actually buys end-to-end)
    for grouped in (False, True):
        name = "model_grouped" if grouped else "model_plain"
        try:
            sec = timed_backbone(grouped, dt, batch=args.batch,
                                 image=args.image,
                                 K=max(args.scan // 10, 10))
            result["rows"][name] = {"ms_per_apply": round(sec * 1e3, 3)}
        except Exception as e:  # noqa: BLE001 - record per-case
            result["rows"][name] = {"error": f"{type(e).__name__}: {e}"[:200]}
        print(name, json.dumps(result["rows"][name]), file=sys.stderr)
    mp = result["rows"].get("model_plain", {}).get("ms_per_apply")
    mg = result["rows"].get("model_grouped", {}).get("ms_per_apply")
    if mp and mg:
        result["rows"]["model_grouped"]["speedup_vs_plain"] = round(mp / mg, 3)

    Path(args.out).write_text(json.dumps(result, indent=2) + "\n")
    print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
