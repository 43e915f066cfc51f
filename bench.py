"""FPS benchmark reproducing the reference eval_fps protocol on TPU.

Protocol (reference src/eval_fps.py:69-97): batch 1, 8 views, 256x256
synthetic input, 100 warmup + 1000 timed iterations of the full inference
step. The reference runs forward on GPU then per-sample CPU MANO IK inside
the timed region; here the whole step is ONE jitted XLA program on-chip
(IK/MANO included once built — see --with-vertices).

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "frames/sec", "vs_baseline": N/48}
vs_baseline is against the reference's reported ~48 FPS on an RTX 3090
(docs/fps.png; BASELINE.md).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--views", type=int, default=8)
    parser.add_argument("--batch", type=int, default=1)
    parser.add_argument("--warmup", type=int, default=100)
    parser.add_argument("--iters", type=int, default=1000)
    parser.add_argument("--dtype", choices=["float32", "bfloat16"], default="bfloat16")
    parser.add_argument("--no-vertices", action="store_true",
                        help="skip the MANO IK + LBS stage")
    parser.add_argument("--verbose", action="store_true")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from handmvnet_tpu.config import Config
    from handmvnet_tpu.data.synthetic import synthetic_batch
    from handmvnet_tpu.models import HandMvNet

    cfg = Config.from_yaml("configs/release/HO3D_HandMvNet.yaml")
    import dataclasses

    cfg = cfg.replace(
        model=dataclasses.replace(cfg.model, selected_views=tuple(range(args.views)))
    )
    model = HandMvNet(cfg=cfg.model)

    batch = synthetic_batch(
        batch_size=args.batch, num_views=args.views, with_heatmaps=False, seed=0
    )
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    rgb = jnp.asarray(batch["rgb"], dtype=dtype)
    bboxes = jnp.asarray(batch["bboxes"])
    intr = jnp.asarray(batch["intrinsic"])

    rng = jax.random.PRNGKey(0)
    variables = model.init(rng, rgb, bboxes, intr)

    with_vertices = not args.no_vertices
    try:
        from handmvnet_tpu.models.mano import synthetic_mano_model, ManoLayer
        from handmvnet_tpu.models.joints_to_vertices import joints_to_vertices_fn

        mano = ManoLayer(synthetic_mano_model())
        j2v = joints_to_vertices_fn(mano)
    except Exception:
        with_vertices = False
        j2v = None

    def step(rgb, bboxes, intr):
        out = model.apply(variables, rgb, bboxes, intr)
        if with_vertices:
            out["vertices"] = j2v(out["joints_cam"] * 1000.0)
        return out["joints_cam"], out.get("vertices", out["joints_crop_img"])

    fn = jax.jit(step)

    for _ in range(args.warmup):
        res = fn(rgb, bboxes, intr)
    jax.block_until_ready(res)

    times = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        res = fn(rgb, bboxes, intr)
        jax.block_until_ready(res)
        times.append(time.perf_counter() - t0)

    total = sum(times)
    fps = args.iters * args.batch / total
    latency_ms = total / args.iters * 1000.0

    if args.verbose:
        dev = jax.devices()[0]
        print(
            f"# device={dev} dtype={args.dtype} views={args.views} "
            f"vertices={with_vertices} latency={latency_ms:.3f}ms "
            f"p50={np.percentile(times, 50)*1e3:.3f}ms p99={np.percentile(times, 99)*1e3:.3f}ms",
            file=sys.stderr,
        )

    print(
        json.dumps(
            {
                "metric": f"handmvnet_fps_b{args.batch}_v{args.views}_{args.dtype}"
                + ("" if with_vertices else "_novtx"),
                "value": round(fps, 2),
                "unit": "frames/sec",
                "vs_baseline": round(fps / 48.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
