"""Second-kernel ledger: measured disposition for a fused ChebConv/graph
epilogue (the GraFormer-derived joint refinement named in BASELINE.json's
north star, alongside the fused QKV attention kernel).

The attention kernel earned its default-off with a real e2e A/B
(scripts/bench_pallas_attention.py). This script closes the remaining
ledger entry the same way — with numbers, not an argument:

  1. XLA cost analysis of the 3x ChebConv(K=2) decoder at release shapes
     (batch 1, 8 views -> tokens [1, 21, 524]): FLOPs and HBM bytes.
  2. Device-time measurement of the decoder alone: K applications per
     dispatch via lax.scan (the only trustworthy way to resolve
     microsecond-scale device work through the relayed transport — per-call
     dispatch is ~2-5 ms, see bench.py header), scalar value-read barrier.
  3. The bound: decoder device time as a share of the measured full-forward
     frame time -> the maximum possible e2e gain from ANY fused epilogue
     kernel, even an infinitely fast one.

Writes outputs/graph_epilogue_bench.json.

Run (real TPU): python scripts/bench_graph_epilogue.py
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=1)
    parser.add_argument("--feat", type=int, default=524,
                        help="flagship feat_dim (resnet50_paper with crop enc)")
    parser.add_argument("--scan-k", type=int, default=4000)
    parser.add_argument("--repeats", type=int, default=3)
    parser.add_argument("--frame-us", type=float, default=1600.0,
                        help="measured full-forward device time per 8-view "
                             "frame (1/device_fps from BENCH_r02: ~626 FPS "
                             "bf16 -> ~1600 us)")
    parser.add_argument("--out", default=str(REPO / "GRAPH_EPILOGUE_BENCH.json"))
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from handmvnet_tpu.models.nets import JointsDecoderGCN

    result: dict = {
        "device": str(jax.devices()[0]),
        "shapes": {"tokens": [args.batch, 21, args.feat]},
    }

    def mark(s: str) -> None:
        print(f"# {s}", file=sys.stderr, flush=True)

    decoder = JointsDecoderGCN(in_features=args.feat)
    x = jnp.asarray(
        jax.random.normal(jax.random.PRNGKey(0), (args.batch, 21, args.feat))
    )
    # jitted init: eager flax init dispatches per-op RPCs, pathological on
    # the relayed transport (CLAUDE.md invariant)
    params = jax.jit(decoder.init)(jax.random.PRNGKey(1), x)
    mark("init done")

    # (1) cost analysis of the compiled decoder
    compiled = jax.jit(decoder.apply).lower(params, x).compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, list) else ca
    result["cost_analysis"] = {
        "flops": float(ca.get("flops", -1)),
        "bytes_accessed": float(ca.get("bytes accessed", -1)),
    }

    # (2) K applications per dispatch: resolves device-us through the relay
    def scanned(params, x):
        def body(carry, _):
            y = decoder.apply(params, carry)
            # feed a reduction of the output back so the scan cannot be
            # collapsed; shape is preserved via broadcast
            return carry + y.mean() * 1e-9, y[0, 0, 0]
        _, ys = jax.lax.scan(body, x, None, length=args.scan_k)
        return ys

    sc = jax.jit(scanned).lower(params, x).compile()
    mark("scan compiled")
    ys = sc(params, x)
    _ = float(ys[0])  # warm + trustworthy barrier
    mark("scan warm")

    times = []
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        ys = sc(params, x)
        _ = float(ys[0])
        times.append(time.perf_counter() - t0)
    per_apply_us = min(times) / args.scan_k * 1e6
    result["decoder_us_per_apply"] = round(per_apply_us, 3)
    result["scan_k"] = args.scan_k

    # (3) the bound
    share = per_apply_us / args.frame_us
    result["frame_us"] = args.frame_us
    result["decoder_share_of_frame"] = round(share, 5)
    result["max_e2e_gain_pct_from_any_fused_kernel"] = round(share * 100, 3)
    result["disposition"] = (
        f"decoder is {per_apply_us:.1f} us of a {args.frame_us:.0f} us frame "
        f"({share * 100:.2f}%): even an infinitely fast fused ChebConv "
        "epilogue kernel cannot move e2e FPS beyond that share. "
        "Matches the attention-kernel finding (XLA fusion wins at these "
        "sizes); no Pallas graph kernel is justified. Revisit if token "
        "count or feat_dim grow >=10x."
    )

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(result, indent=2) + "\n")
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
