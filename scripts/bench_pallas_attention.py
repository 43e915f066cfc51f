"""Measure the Pallas fused-attention kernel against the XLA einsum path on
the attached TPU: (1) kernel-level compile + numerics + microbench, (2) the
full flagship bench protocol (bench.run_protocol) with the kernel forced on
vs off.

Run from the repo root:  python scripts/bench_pallas_attention.py

Recorded result (2026-08-17, TPU v5 lite via the axon transport, 8-view
flagship protocol, vertices on, trustworthy scalar-read barriers — the
earlier 5015/4643 figures were phantom-barrier artifacts, see bench.py):

    end-to-end device_fps (K frames per dispatch, amortized relay RPC):
        bf16  pallas ON 604.7   OFF ~626 (separate run, +-4% noise band)
        fp32  pallas ON 583.5   OFF ~604
    kernel-only microbench: NOT resolvable through this relay — with read
        barriers both paths measure 400-700 us/call, dominated by per-call
        dispatch turnaround (the kernel itself is ~10 us of device work at
        168 tokens); the earlier "pallas wins in isolation" figures were
        phantom-barrier artifacts. The e2e device_fps A/B above is the
        meaningful comparison.
    kernel numerics: max_abs_err 1.2e-4 fp32 / 2.9e-3 bf16 vs the jnp
    path (default MXU precision), compile ~0.6 s.

Conclusion: the Mosaic compile hang seen in round 1 is gone — the kernel
compiles in ~0.5 s and matches the jnp path to MXU precision — but at 168
tokens XLA's fusion of the einsum chain into the surrounding layers beats
the standalone pallas_call (which pads 168->176 tokens and breaks the
producer/consumer fusion). The default therefore stays use_pallas=False
(ops/pallas/attention.py), now on measured evidence rather than a compile
failure. A second kernel (fused IK+LBS / ChebConv epilogue) is not
justified at these sizes: the whole 8-view forward + mesh stage is
~0.2 ms on-chip.
"""

from __future__ import annotations

import argparse
import dataclasses
import sys
import time


def kernel_bench() -> None:
    import jax
    import jax.numpy as jnp

    from handmvnet_tpu.ops.pallas.attention import (
        _attention_jnp,
        _fused_attention_pallas,
    )

    for dtype in (jnp.float32, jnp.bfloat16):
        b, h, n, d = 5, 4, 168, 32
        q = jax.random.normal(jax.random.PRNGKey(0), (b, h, n, d), dtype)
        k = jax.random.normal(jax.random.PRNGKey(1), (b, h, n, d), dtype)
        v = jax.random.normal(jax.random.PRNGKey(2), (b, h, n, d), dtype)
        t0 = time.time()
        out = _fused_attention_pallas(q, k, v, 0.125)
        out.block_until_ready()
        print(f"{dtype.__name__}: pallas compiled+ran in {time.time() - t0:.1f}s")
        ref = _attention_jnp(q, k, v, 0.125)
        err = float(jnp.max(jnp.abs((out - ref).astype(jnp.float32))))
        print(f"{dtype.__name__}: max_abs_err {err:.2e}")
        assert err < (5e-2 if dtype == jnp.bfloat16 else 5e-4), err

        jpath = jax.jit(lambda q, k, v: _attention_jnp(q, k, v, 0.125))
        for name, fn in (
            ("pallas", lambda: _fused_attention_pallas(q, k, v, 0.125)),
            ("jnp   ", lambda: jpath(q, k, v)),
        ):
            # scalar value read as the barrier — block_until_ready can
            # return before queued executions finish on this transport
            _ = float(fn()[0, 0, 0, 0])
            t0 = time.time()
            for _ in range(200):
                o = fn()
            _ = float(o[0, 0, 0, 0])
            print(f"{dtype.__name__} {name}: {(time.time() - t0) / 200 * 1e6:.1f} us/call")


def e2e_bench(views: int, iters: int) -> None:
    import handmvnet_tpu.ops.pallas.attention as pa
    from bench import run_protocol
    from handmvnet_tpu.config import Config

    args = argparse.Namespace(
        batch=1, views=views, warmup=50, iters=iters, chunk=200,
        no_vertices=False, verbose=True, scan_frames=50,
    )
    cfg = Config.from_yaml("configs/release/HO3D_HandMvNet.yaml")
    cfg = cfg.replace(
        model=dataclasses.replace(cfg.model, selected_views=tuple(range(views)))
    )

    orig = pa.fused_attention
    try:
        for mode in (False, True):
            def patched(q, k, v, scale, use_pallas=None, interpret=False, _m=mode):
                return orig(q, k, v, scale, use_pallas=_m, interpret=interpret)

            pa.fused_attention = patched
            for dt in ("bfloat16", "float32"):
                fps, p50, dev_fps, _stats = run_protocol(cfg, args, dt)
                # device_fps is the discriminator: the per-call figure is
                # dominated by relay turnaround noise (see bench.py docstring)
                print(
                    f"pallas={mode} dtype={dt}: per-call {fps:.1f} FPS, "
                    f"device {dev_fps:.1f} FPS, blocking_p50={p50:.2f}ms"
                )
    finally:
        pa.fused_attention = orig


if __name__ == "__main__":
    sys.path.insert(0, ".")
    p = argparse.ArgumentParser()
    p.add_argument("--views", type=int, default=8)
    p.add_argument("--iters", type=int, default=400)
    p.add_argument("--kernel-only", action="store_true")
    a = p.parse_args()
    # e2e FIRST: the kernel numerics check reads an error value back to the
    # host, and that D2H flips the process into the transport's degraded
    # mode (scripts/probe_slowmode.py) — any timing after it is invalid.
    if not a.kernel_only:
        e2e_bench(a.views, a.iters)
    kernel_bench()
