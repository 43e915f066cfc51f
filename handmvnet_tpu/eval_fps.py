"""Inference speed benchmark driver:
``python -m handmvnet_tpu.eval_fps --config configs/release/HO3D_HandMvNet.yaml``

Reproduces the reference's InferenceSpeedTest report format
(src/eval_fps.py:20-108): config dump, system info, parameter count/size,
then the timed protocol (batch 1, 8 views, 100 warmup + 1000 timed iters,
forward + MANO IK). The measurement core is shared with bench.py (repo
root), which emits the machine-readable JSON line.
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys


def print_system_info() -> None:
    print("-------------------------------------------------")
    try:
        info = subprocess.check_output(["cat", "/proc/cpuinfo"]).decode()
        for line in info.splitlines():
            if "model name" in line:
                print("CPU:", line.split(":", 1)[1].strip())
                break
    except Exception:
        pass
    import jax

    print("Devices:", jax.devices())


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default="configs/release/HO3D_HandMvNet.yaml")
    parser.add_argument("--views", type=int, default=8)
    parser.add_argument("--iters", type=int, default=1000)
    parser.add_argument("--warmup", type=int, default=100)
    args = parser.parse_args(argv)

    from handmvnet_tpu.config import Config

    cfg = Config.from_yaml(args.config)
    print("-------------------------------------------------")
    print("Config:", json.dumps(cfg.to_dict(), indent=2, default=str))
    print_system_info()

    # parameter count / size (reference prints ModelSummary + param_count)
    import dataclasses

    import jax
    import numpy as np

    from handmvnet_tpu.models import HandMvNet
    from handmvnet_tpu.data.synthetic import synthetic_batch
    from bench import _random_variables

    mcfg = dataclasses.replace(cfg.model, selected_views=tuple(range(args.views)))
    model = HandMvNet(cfg=mcfg)
    batch = synthetic_batch(batch_size=1, num_views=args.views, with_heatmaps=False)
    variables = _random_variables(
        model, 0, batch["rgb"], batch["bboxes"], batch["intrinsic"]
    )
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"]))
    print("-------------------------------------------------")
    print(f"{n_params / 1e6:.3f} M parameters")
    print(f"{n_params * 4 / (1024 * 1024):.3f} MB (fp32)")
    print("-------------------------------------------------")

    # delegate the timed loop to bench.py for a single source of truth
    # (--config must be forwarded or an HRNet run would silently time the
    # default ResNet model). --inner: run the protocol IN this process —
    # this driver already initialized the backend and holds device arrays,
    # so bench's supervised mode (fresh subprocesses re-initializing the
    # tunneled backend) would contend with it; the watchdog belongs to the
    # unattended graded artifact, not this interactive report
    sys.argv = [
        "bench.py",
        "--config", args.config,
        "--views", str(args.views),
        "--iters", str(args.iters),
        "--warmup", str(args.warmup),
        "--verbose",
        "--inner",
    ]
    from bench import main as bench_main

    bench_main()


if __name__ == "__main__":
    main()
