"""Known XLA-TPU-backend fault shapes and the measured batch-split mitigation.

HRNET_V5B8_BISECT.json (round 4, 17 on-chip probes) pinned a TPU worker
crash — ``UNAVAILABLE: TPU worker process crashed or restarted`` — to one
increment of the HRNet forward at EXACTLY (hrnet, views=5, batch=8): the
fused pos2d-concat + [40,21,302] -> [8,105,302] batch reshape. Every
neighboring shape (b6v5, b4v5, b8v4, b8v6) passes, the same graph under
lax.scan passes in both dtypes, and the fusion/decoder on synthetic tokens
of the same shape passes — a shape-specific XLA TPU backend codegen/runtime
fault, not a model bug. bf16 crashes deterministically (3/3 in round 3,
reproduced round 4); fp32 is intermittent (crashed round 3, passed round 4),
so the guard covers BOTH dtypes: a worker crash is catastrophic on the
relayed transport (it permanently degrades the tunnel — CLAUDE.md), while
the mitigation costs one extra dispatch.

Mitigation = the bisect's measured-clean workaround: split the batch into
two dispatches of 4 (``full:b8v4`` passes). The scanned dispatch path
(serving / bench device_fps) is unaffected and needs no guard.
"""

from __future__ import annotations

import sys
from typing import Any, Callable, Mapping

# (backbone, num_views, per-dispatch batch) -> split factor. Exactly the
# bisected shape: neighboring shapes measured clean (HRNET_V5B8_BISECT.json).
FAULT_SHAPES: dict[tuple[str, int, int], int] = {("hrnet", 5, 8): 2}

# platforms backed by the XLA TPU backend (the axon relay reports "axon")
_TPU_PLATFORMS = ("tpu", "axon")


def forward_batch_split(
    backbone: str, num_views: int, batch: int, platform: str
) -> int:
    """Split factor (1 = no split) for ONE unscanned forward dispatch of
    `batch` samples at `num_views` views on `platform`. Callers divide the
    dispatch into this many sub-batches (the bisect's 2x4 workaround)."""
    if platform not in _TPU_PLATFORMS:
        return 1
    return FAULT_SHAPES.get((backbone, num_views, batch), 1)


def warn_split(context: str, backbone: str, num_views: int, batch: int,
               split: int) -> None:
    print(
        f"[shape-guard] {context}: ({backbone}, views={num_views}, "
        f"batch={batch}) is a known XLA TPU backend fault shape "
        f"(HRNET_V5B8_BISECT.json: worker crash in the fused pos2d-concat "
        f"reshape); splitting the dispatch into {split}x{batch // split}",
        file=sys.stderr,
    )


def split_batch_step(
    step: Callable[..., Any], split: int
) -> Callable[..., Any]:
    """Wrap ``step(state, batch_dict) -> out_tree`` so each call runs
    `split` sub-dispatches over leading-axis chunks of every batch leaf and
    concatenates the outputs. The sub-dispatch never builds the fault-shape
    program; results are bitwise identical per sample (batch entries are
    independent in the forward)."""
    import jax
    import jax.numpy as jnp

    def guarded(state, batch: Mapping[str, Any]):
        n = batch["rgb"].shape[0]
        assert n % split == 0, (n, split)
        c = n // split
        outs = [
            step(state, {k: v[i * c:(i + 1) * c] for k, v in batch.items()})
            for i in range(split)
        ]
        return jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *outs)

    return guarded
