"""Measured A/B of the train step's rematerialization policy (VERDICT r5
item 1: harvest or close the 0.345-MFU train gap).

TRACE_ANALYSIS_TRAIN.json shows a FLAT 97 ms/step profile (top kernel 1.2%,
fusion 69.6% / conv 23.2% / copy 3.4%) — no single kernel to rewrite. But
the FLOP ledger says the step carries recompute: XLA counts 6672 GFLOP/step
while fwd+bwd of 80 view-images is ~5200 GFLOP — the per-block remat
(train.py:273) re-runs most of the backbone forward inside backward, ~+28%
FLOPs. Round 2 chose remat because the unremat'd step was believed to
exceed one v5e's HBM; that was never measured with the compiler's own
numbers. This probe:

  1. AOT-compiles the step per variant and reads compiled.memory_analysis()
     — temp + argument + output bytes — so an over-HBM variant is REJECTED
     WITHOUT EXECUTING (an OOM execution can kill the relayed TPU worker,
     BENCH_MATRIX bench_args note);
  2. for variants that fit, measures device-sustained step time exactly
     like bench_matrix's train row (K steps/dispatch via lax.scan, scalar
     VALUE read as the barrier, best of 3).

Variants:
  * remat_on            — the shipping recipe (baseline reproduction)
  * remat_off           — full activation storage, no recompute
  * remat_off_accum2    — the reference's OWN accumulation setting at this
                          batch size (accumulate_grad_batches=2 when bs<64,
                          reference train.py:27-28): microbatch 8 halves
                          live activations, possibly fitting remat-free
  * hrnet_remat_on/off  — the HRNet-w40 recipe (HO3D_HandMvNet_HR.yaml):
                          the high-res branch activations are why remat was
                          assumed necessary; measured per-backbone so the
                          production default can differ per family

Writes TRAIN_REMAT_PROBE.json. Run (real TPU):
  python scripts/probe_train_remat.py [--steps 10] [--iters 3]
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

CFG = "configs/release/HO3D_HandMvNet.yaml"
CFG_HRNET = "configs/release/HO3D_HandMvNet_HR.yaml"
# leave headroom below the v5e's 16 GB for XLA's own reservations/fragments
HBM_BUDGET_BYTES = 13.5e9


def build_step(remat: bool, accum: int, batch_size: int = 16, views: int = 5,
               cfg_path: str = CFG):
    import jax

    from handmvnet_tpu.config import Config
    from handmvnet_tpu.data.synthetic import synthetic_batch
    from handmvnet_tpu.models import HandMvNet
    from handmvnet_tpu.parallel import (
        create_train_state,
        make_mesh,
        make_optimizer,
        make_train_step,
    )
    from handmvnet_tpu.parallel.mesh import data_sharding

    cfg = Config.from_yaml(REPO / cfg_path)
    cfg = cfg.replace(
        train=dataclasses.replace(
            cfg.train, compute_dtype="bfloat16", accumulate_batch=accum
        ),
    )
    model = HandMvNet(cfg=cfg.model, remat=remat)
    mesh = make_mesh()
    batch = synthetic_batch(batch_size=batch_size, num_views=views, seed=0)
    tx = make_optimizer(cfg, steps_per_epoch=100)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0), batch, tx=tx)
    step = make_train_step(model, cfg, tx, mesh, accum_steps=accum)
    sharding = data_sharding(mesh)
    dbatch = {k: jax.device_put(v, sharding) for k, v in batch.items()}
    return step, state, dbatch


def probe_variant(name: str, remat: bool, accum: int, steps: int,
                  iters: int, cfg_path: str = CFG) -> dict:
    import jax

    from bench import compiled_flops

    t0 = time.time()
    out: dict = {"variant": name, "remat": remat, "accum": accum,
                 "config": cfg_path, "scan_steps": steps}
    step, state, dbatch = build_step(remat, accum, cfg_path=cfg_path)
    rng = jax.random.PRNGKey(1)

    # ---- compile the single step AOT and read the compiler's memory plan
    lowered = step.lower(state, dbatch, rng)
    compiled = lowered.compile()
    mem = {}
    try:
        ma = compiled.memory_analysis()
        mem = {
            "temp_bytes": int(ma.temp_size_in_bytes),
            "argument_bytes": int(ma.argument_size_in_bytes),
            "output_bytes": int(ma.output_size_in_bytes),
            "alias_bytes": int(ma.alias_size_in_bytes),
        }
        # donated state aliases in/out; peak ~ args + temps (outputs alias)
        mem["peak_estimate_gb"] = round(
            (ma.temp_size_in_bytes + ma.argument_size_in_bytes) / 1e9, 2
        )
        out["memory"] = mem
    except Exception as e:  # noqa: BLE001 - relay may not expose it
        out["memory_error"] = f"{type(e).__name__}: {e}"[:200]
    flops = compiled_flops(compiled)
    if flops:
        out["gflops_per_step"] = round(flops / 1e9, 1)
        if accum > 1:
            # XLA's cost analysis counts a lax.scan body ONCE, so with
            # accum microbatches the per-step FLOPs (and the MFU derived
            # from them) are undercounted ~1/accum — device_step_ms is the
            # trustworthy cross-variant figure
            out["flops_note"] = (
                "cost analysis counts the accumulation scan body once; "
                "gflops/MFU are ~1/accum of the executed work"
            )

    if mem and (mem["temp_bytes"] + mem["argument_bytes"]) > HBM_BUDGET_BYTES:
        out["skipped"] = (
            f"compiler memory plan {mem['peak_estimate_gb']} GB exceeds the "
            f"{HBM_BUDGET_BYTES/1e9:.1f} GB budget — executing would risk an "
            "OOM worker crash on the relayed backend; rejected without running"
        )
        out["wall_s"] = round(time.time() - t0, 1)
        return out

    # ---- device-sustained step time: K steps/dispatch via lax.scan,
    # scalar VALUE read as the barrier (bench_matrix train methodology)
    def k_steps(state, dbatch, rng):
        def body(carry, _):
            st, r = carry
            r_step, r = jax.random.split(r)
            st, losses = step(st, dbatch, r_step)
            return (st, r), losses["loss"]

        (st, _), ls = jax.lax.scan(body, (state, rng), None, length=steps)
        return st, ls

    k_jit = jax.jit(k_steps, donate_argnums=(0,))
    state, ls = k_jit(state, dbatch, rng)  # compile + warm
    _ = float(ls[-1])
    times = []
    for _ in range(iters):
        t1 = time.perf_counter()
        state, ls = k_jit(state, dbatch, rng)
        _ = float(ls[-1])
        times.append(time.perf_counter() - t1)
    best = min(times)
    step_ms = best / steps * 1e3
    out["device_step_ms"] = round(step_ms, 2)
    out["device_sps"] = round(16 / (best / steps), 2)
    if flops:
        out["device_achieved_tflops"] = round(flops / 1e12 / (best / steps), 2)
        out["device_mfu_vs_bf16_peak"] = round(
            out["device_achieved_tflops"] / 197.0, 4
        )
    out["wall_s"] = round(time.time() - t0, 1)
    return out


def run_variant_subprocess(spec: str, steps: int, iters: int,
                           timeout_s: float) -> dict:
    """Each variant in its own process: a crash/hang costs one variant."""
    import subprocess

    try:
        proc = subprocess.run(
            [sys.executable, str(Path(__file__).resolve()), "--one", spec,
             "--steps", str(steps), "--iters", str(iters)],
            capture_output=True, text=True, timeout=timeout_s,
        )
        if proc.returncode == 0:
            return json.loads(proc.stdout.strip().splitlines()[-1])
        return {"variant": spec, "error":
                f"rc={proc.returncode}: "
                + (proc.stderr or proc.stdout).strip()[-300:]}
    except subprocess.TimeoutExpired:
        return {"variant": spec, "error": f"hang > {timeout_s:.0f}s"}


VARIANTS = {
    # name: (remat, accum, config)
    "remat_on": (True, 1, CFG),
    "remat_off": (False, 1, CFG),
    "remat_off_accum2": (False, 2, CFG),
    # HRNet-w40 at the same recipe: its high-res branch activations are the
    # reason remat existed; the AOT memory check rejects over-budget
    # variants before they execute
    "hrnet_remat_on": (True, 1, CFG_HRNET),
    "hrnet_remat_off": (False, 1, CFG_HRNET),
}


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--timeout", type=float, default=1500.0)
    p.add_argument("--one", default="", help="internal: run ONE variant")
    p.add_argument("--variants", default=",".join(VARIANTS),
                   help="comma-separated subset to (re-)measure; rows already "
                        "in --out for other variants are kept (selective "
                        "re-runs, e.g. after a baseline-only session)")
    p.add_argument("--out", default=str(REPO / "TRAIN_REMAT_PROBE.json"))
    args = p.parse_args()

    if args.one:
        import jax

        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/jax_cache_handmvnet")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        remat, accum, cfg_path = VARIANTS[args.one]
        print(json.dumps(probe_variant(args.one, remat, accum, args.steps,
                                       args.iters, cfg_path)))
        return

    selected = [v for v in args.variants.split(",") if v]
    results = []
    extra: dict = {}  # preserve hand-written keys (verdict) across re-runs
    if Path(args.out).exists():  # keep rows not being re-measured
        prev = json.loads(Path(args.out).read_text())
        extra = {k: v for k, v in prev.items()
                 if k not in ("protocol", "results")}
        results = [r for r in prev.get("results", [])
                   if r.get("variant") not in selected]
    for name in (n for n in VARIANTS if n in selected):
        # baseline-first order: reproduce before experimenting
        r = run_variant_subprocess(name, args.steps, args.iters, args.timeout)
        results.append(r)
        print(json.dumps(r), file=sys.stderr)
        Path(args.out).write_text(json.dumps({
            "protocol": (
                "HO3D recipe train step (bs16 x v5, bf16 compute + fp32 "
                "master, AdamW+clip), device-sustained via lax.scan "
                f"{args.steps} steps/dispatch, scalar-read barrier, best of "
                f"{args.iters}; variants compiled AOT and memory-checked "
                "against the compiler's own plan before executing"
            ),
            "results": results,
            **extra,
        }, indent=2) + "\n")
    print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
