"""Summarize a captured XProf trace (scripts/capture_trace.py) into
TRACE_ANALYSIS.json: per-frame device time and the top kernels.

The capture runs bench.py's scanned flagship dispatch (50 frames per
jit_scanned call), so the trace's "XLA Modules" row carries one while-loop
span per dispatch and the "XLA Ops" row the kernels inside it. The while
wrapper double-counts its body; we report it separately and attribute the
budget to the inner kernels.

Usage:  python scripts/analyze_trace.py [--logdir traces/flagship]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def categorize(name: str) -> str:
    n = name.lower()
    for k in ("conv", "all-gather", "all-reduce", "copy", "scatter",
              "gather", "transpose", "fusion", "dynamic", "slice",
              "broadcast", "reduce", "iota"):
        if k in n:
            return k
    return "other"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--logdir", default=str(REPO / "traces" / "flagship"))
    ap.add_argument("--frames", type=int, default=50,
                    help="frames per scanned dispatch in the captured run")
    ap.add_argument("--out", default=str(REPO / "TRACE_ANALYSIS.json"))
    ap.add_argument("--module", default="scanned",
                    help="substring of the traced jit module's name used to "
                         "count dispatches (train capture: k_steps)")
    ap.add_argument("--top", type=int, default=15,
                    help="top-N kernels to record")
    args = ap.parse_args()

    paths = sorted(glob.glob(
        f"{args.logdir}/plugins/profile/*/*.trace.json.gz"))
    if not paths:
        raise SystemExit(f"no trace.json.gz under {args.logdir}")
    with gzip.open(paths[-1]) as f:
        d = json.load(f)

    events = d["traceEvents"]
    # device pid: the process named like /device:TPU:*
    dev_pids = {e["pid"] for e in events
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "TPU" in (e.get("args", {}).get("name") or "")}
    threads = {(e["pid"], e["tid"]): e["args"].get("name")
               for e in events if e.get("ph") == "M"
               and e.get("name") == "thread_name"}
    spans = [e for e in events
             if e.get("ph") == "X" and e.get("pid") in dev_pids]
    mod_spans = [e for e in spans
                 if threads.get((e["pid"], e["tid"])) == "XLA Modules"]
    op_spans = [e for e in spans
                if threads.get((e["pid"], e["tid"])) == "XLA Ops"]

    mod_us = collections.Counter()
    for m in mod_spans:
        mod_us[m["name"].split("(")[0]] += m["dur"]

    # the while wrapper spans (the lax.scan loop) contain their body ops;
    # exclude them from the kernel attribution to avoid double counting
    wrapper_us = sum(e["dur"] for e in op_spans
                     if e["name"].startswith("while"))
    inner = [e for e in op_spans if not e["name"].startswith("while")]
    inner_us = sum(e["dur"] for e in inner)

    by_name = collections.Counter()
    by_cat = collections.Counter()
    calls = collections.Counter()
    for e in inner:
        by_name[e["name"]] += e["dur"]
        calls[e["name"]] += 1
        by_cat[categorize(e["name"])] += e["dur"]

    # frames in the trace = frames/dispatch x number of scanned dispatches
    n_dispatch = sum(1 for m in mod_spans if args.module in m["name"])
    frames = args.frames * max(n_dispatch, 1)

    artifact = {
        "trace": paths[-1].replace(str(REPO) + "/", ""),
        "scanned_dispatches": n_dispatch,
        "frames": frames,
        "device_total_ms": round(inner_us / 1e3, 2),
        "ms_per_frame": round(inner_us / 1e3 / frames, 4),
        "while_wrapper_ms": round(wrapper_us / 1e3, 2),
        "categories_pct": {
            k: round(100 * v / inner_us, 1)
            for k, v in by_cat.most_common()
        },
        "top_kernels": [
            {
                "name": n,
                "ms_total": round(us / 1e3, 2),
                "us_per_frame": round(us / frames, 1),
                "pct": round(100 * us / inner_us, 1),
                "calls": calls[n],
            }
            for n, us in by_name.most_common(args.top)
        ],
        "modules_ms": {k: round(v / 1e3, 2) for k, v in mod_us.items()},
    }
    Path(args.out).write_text(json.dumps(artifact, indent=2) + "\n")
    print(json.dumps({"ms_per_frame": artifact["ms_per_frame"],
                      "frames": frames,
                      "top": artifact["top_kernels"][0]["name"]}))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
