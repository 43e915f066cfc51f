"""Input-pipeline throughput bench: does the loader feed the train step?

Round-2 analysis (ROADMAP 6) estimated ~550 ms/batch of JPEG decode against
a ~99 ms/step trainer — an unquantified ~5x input-bound gap. This script
turns that into a recorded artifact: it writes real-JPEG synthetic shards
(reference HO3D-MV tar format), then measures each pipeline stage in
steady state on THIS machine, for BOTH decode modes (full-res and the
opt-in DCT-domain downscale) plus the decode-once cache:

  * native decode-only: C++ tar reader + libjpeg pool (samples/s)
  * parsed samples: decode + label parse + crop/bbox host work (samples/s)
  * collated batches through BatchLoader, no device stage (batches/s)
  * decode-once cache (data.cache_decoded): build cost + steady-state
    collated samples/s (epochs after the first never touch libjpeg)

and reports the input-bound ratio against a given train-step time
(--step-ms, default 99 ms = the measured flagship TPU step), plus the
thread-pool size actually used (scaled to os.cpu_count(), data/ho3d.py).
Container caveat recorded in the artifact: this box has few cores; the
ratio is a property of the host, not the framework.

Run: python scripts/loader_bench.py  [--out LOADER_BENCH.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

# host-only measurement: no device work, keep JAX off any accelerator
os.environ.setdefault("JAX_PLATFORMS", "")


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--shards", type=int, default=4)
    parser.add_argument("--samples-per-shard", type=int, default=24)
    parser.add_argument("--views", type=int, default=5)
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--step-ms", type=float, default=99.0,
                        help="train-step time to compare against "
                             "(flagship TPU measurement)")
    parser.add_argument("--passes", type=int, default=3)
    parser.add_argument("--denoms", type=int, nargs="+", default=[1, 2],
                        help="decode-side DCT downscales to measure "
                             "(DataConfig.decode_scale_denom); 2 ~= 3x "
                             "cheaper decode")
    parser.add_argument("--out", default=str(REPO / "LOADER_BENCH.json"))
    args = parser.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from handmvnet_tpu.config import DataConfig
    from handmvnet_tpu.data.ho3d import HO3DDataset
    from handmvnet_tpu.data.loader import BatchLoader
    from handmvnet_tpu.data.native_loader import (
        NativeShardLoader,
        native_available,
    )
    from handmvnet_tpu.data.synthetic import write_synthetic_ho3d_shards

    step_sps = args.batch / (args.step_ms / 1e3)
    result: dict = {
        "cpu_count": os.cpu_count(),
        "views": args.views,
        "batch": args.batch,
        "train_step_ms": args.step_ms,
        "train_step_samples_per_sec": round(step_sps, 2),
        "native_available": native_available(),
        "note": (
            "input_bound_ratio > 1 means the streaming loader starves the "
            "accelerator by that factor on THIS host; the decode stage "
            f"parallelizes with cores (this box: {os.cpu_count()}). "
            "'cached_*' rows are the decode-once cache steady state "
            "(data.cache_decoded), where epochs stream the mmap store and "
            "never decode."
        ),
        "denoms": {},
    }

    with tempfile.TemporaryDirectory() as tmp:
        urls = write_synthetic_ho3d_shards(
            tmp, num_shards=args.shards,
            samples_per_shard=args.samples_per_shard,
            num_views=args.views, split="train", consistent_geometry=True,
        )
        n_samples = args.shards * args.samples_per_shard

        class BenchHO3D(HO3DDataset):
            # test split = all shards, no resampling -> one deterministic
            # full pass per iteration (the train split samples shards with
            # replacement, which would blur the count)
            train_pattern = (
                f"HO3D_mv_train-{{000000..{args.shards - 1:06d}}}.tar"
            )
            test_pattern = train_pattern
            split_sizes = {
                "train": n_samples, "train+val": n_samples,
                "val": n_samples, "test": n_samples,
            }

        for denom in dict.fromkeys(args.denoms):
            section: dict = {}

            if native_available():
                n_threads = max(2, min(os.cpu_count() or 4, len(urls)))
                section["native_threads"] = n_threads
                # decode-only: drain the C++ pool, nothing else on this thread
                times = []
                for _ in range(args.passes):
                    loader = NativeShardLoader(
                        urls, num_views=args.views, image_hw=(480, 640),
                        n_threads=n_threads, scale_denom=denom,
                    )
                    t0 = time.perf_counter()
                    count = sum(1 for _ in loader)
                    times.append(time.perf_counter() - t0)
                    assert count == n_samples, (count, n_samples)
                section["native_decode_samples_per_sec"] = round(
                    n_samples / min(times), 2
                )

            cfg = DataConfig(
                name="ho3d", batch_size=args.batch, dataset_dir=tmp,
                num_workers=0, augment=False, add_val_to_train=False,
                selected_views=tuple(range(args.views)),
                decode_scale_denom=denom,
            )

            # parsed samples: decode + label parse + host-side geometry
            ds = BenchHO3D(cfg, "test")
            times = []
            for _ in range(args.passes):
                t0 = time.perf_counter()
                count = sum(1 for _ in ds)
                times.append(time.perf_counter() - t0)
            section["parsed_samples_per_sec"] = round(count / min(times), 2)

            # batches through BatchLoader (prefetch thread + collate)
            steps = max(1, n_samples // args.batch)
            bl = BatchLoader(ds, batch_size=args.batch, steps_per_epoch=steps,
                             device_prepare=None)
            t_batches = []
            for _ in range(args.passes):
                t0 = time.perf_counter()
                n_b = sum(1 for _ in bl)
                t_batches.append(time.perf_counter() - t0)
            batch_sps = n_b * args.batch / min(t_batches)
            section["collated_samples_per_sec"] = round(batch_sps, 2)
            section["input_bound_ratio"] = round(step_sps / batch_sps, 3)
            section["feeds_the_step"] = bool(batch_sps >= step_sps)

            # decode-once cache: pass 1 builds the mmap store; steady-state
            # epochs never touch libjpeg. Same BatchLoader stage for
            # comparability.
            cached_cfg = DataConfig(
                name="ho3d", batch_size=args.batch, dataset_dir=tmp,
                num_workers=0, augment=False, add_val_to_train=False,
                selected_views=tuple(range(args.views)),
                decode_scale_denom=denom,
                cache_decoded=True,
                cache_dir=os.path.join(tmp, f"decoded_cache_{denom}"),
            )
            cds = BenchHO3D(cached_cfg, "test")
            t0 = time.perf_counter()
            n_built = sum(1 for _ in cds)  # build pass (decode once)
            section["cache_build_seconds"] = round(time.perf_counter() - t0, 3)
            assert n_built == n_samples, (n_built, n_samples)
            cbl = BatchLoader(cds, batch_size=args.batch,
                              steps_per_epoch=steps, device_prepare=None)
            t_cached = []
            for _ in range(args.passes):
                t0 = time.perf_counter()
                n_b = sum(1 for _ in cbl)
                t_cached.append(time.perf_counter() - t0)
            cached_sps = n_b * args.batch / min(t_cached)
            section["cached_collated_samples_per_sec"] = round(cached_sps, 2)
            section["cached_input_bound_ratio"] = round(step_sps / cached_sps, 3)
            section["cached_feeds_the_step"] = bool(cached_sps >= step_sps)

            result["denoms"][str(denom)] = section
            print(f"denom={denom}", json.dumps(section), file=sys.stderr)

    # cross-denom speedups (the CLAUDE.md / config.py claims)
    d = result["denoms"]
    if "1" in d and "2" in d and "native_decode_samples_per_sec" in d["1"]:
        result["denom2_decode_speedup"] = round(
            d["2"]["native_decode_samples_per_sec"]
            / d["1"]["native_decode_samples_per_sec"], 2
        )
        result["denom2_collated_speedup"] = round(
            d["2"]["collated_samples_per_sec"]
            / d["1"]["collated_samples_per_sec"], 2
        )

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(result, indent=2) + "\n")
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
