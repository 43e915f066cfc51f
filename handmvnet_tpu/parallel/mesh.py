"""Device mesh helpers.

HandMvNet is a ~30-130 MB model operating on <=168-token sequences
(SURVEY.md §2.8): data parallelism over ICI is the one distributed strategy
the reference ships (Lightning DDP/NCCL, reference train.py:39-44), and the
one that matters here. The mesh is 1-D over axis "data"; gradients are
psum-averaged inside the shard_mapped train step. Multi-host: call
jax.distributed.initialize() before building the mesh and shard the input
pipeline by process_index (data/loader.py).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(num_devices: int = 0, devices=None) -> Mesh:
    """1-D data mesh over the first `num_devices` devices (all if 0).

    Raises if fewer devices are available than requested — silent truncation
    would let an 8-way dryrun "pass" on a 1-device mesh.
    """
    if devices is None:
        devices = jax.devices()
    if num_devices and num_devices > 0:
        if len(devices) < num_devices:
            raise ValueError(
                f"requested a {num_devices}-device mesh but only "
                f"{len(devices)} devices are available: "
                f"{[str(d) for d in devices]}"
            )
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), axis_names=(DATA_AXIS,))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
