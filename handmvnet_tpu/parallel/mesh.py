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
import jax.numpy as jnp
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
        nproc = jax.process_count()
        if nproc > 1:
            # multi-controller: a device *prefix* would land entirely on the
            # first process(es); every process must own an equal mesh slice
            # (its local batch is one contiguous slice of the global batch —
            # see global_batch). Pick num_devices//nproc from each process,
            # in process order.
            if num_devices % nproc:
                raise ValueError(
                    f"num_devices={num_devices} must be a multiple of "
                    f"process_count={nproc}"
                )
            per = num_devices // nproc
            devices = [
                d
                for p in range(nproc)
                for d in [x for x in devices if x.process_index == p][:per]
            ]
            if len(devices) != num_devices:
                raise ValueError(
                    f"could not select {per} devices from each of {nproc} processes"
                )
        else:
            devices = devices[:num_devices]
    return Mesh(np.asarray(devices), axis_names=(DATA_AXIS,))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding."""
    return NamedSharding(mesh, P(DATA_AXIS))


def global_batch(sharding: NamedSharding, batch) -> dict:
    """Place one host batch onto the data mesh.

    Single-process: a plain device_put scatter. Multi-process
    (multi-controller SPMD, after jax.distributed.initialize): each process
    contributes its *local* batch as one contiguous slice of the global
    batch along the data axis — global B = local B x process_count, matching
    the reference's per-rank DataLoader semantics (Lightning DDP: train
    batch_size is per-GPU) and this repo's per-process tar sharding
    (ShardDataset split_index=process_index, train.py). device_put would be
    wrong here: it treats each process's array as the *whole* global batch.
    """
    if jax.process_count() == 1:
        return {k: jax.device_put(v, sharding) for k, v in batch.items()}
    nproc = jax.process_count()
    local_devs = _local_mesh_devices(sharding.mesh)
    out = {}
    for k, v in batch.items():
        b_local = v.shape[0]
        if b_local % len(local_devs):
            raise ValueError(
                f"local batch {b_local} for '{k}' does not divide over "
                f"{len(local_devs)} local mesh devices"
            )
        gshape = (b_local * nproc,) + tuple(v.shape[1:])
        per = b_local // len(local_devs)
        # slice + device_put stays on-device for device-prepared batches
        # (D2D scatter) — np.asarray here would be a device->host read on
        # every training step, which the CLAUDE.md invariant forbids
        pieces = [
            jax.device_put(v[i * per:(i + 1) * per], d)
            for i, d in enumerate(local_devs)
        ]
        out[k] = jax.make_array_from_single_device_arrays(gshape, sharding, pieces)
    return out


def _local_mesh_devices(mesh: Mesh) -> list:
    """This process's mesh devices, in mesh (flat) order — the order fixes
    which slice of the global batch each local piece becomes."""
    me = jax.process_index()
    return [d for d in mesh.devices.flat if d.process_index == me]


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def warmup_collectives(mesh: Mesh) -> None:
    """Establish cross-process communication channels BEFORE any large
    compile. Gloo (CPU multihost) sets its channels up lazily at the first
    collective with a ~30 s key-exchange deadline; per-process compile-time
    skew (one process compiling the train step for a minute while another
    hits a warm cache) can blow past it and kill the job with
    'Gloo initialization failed: DEADLINE_EXCEEDED'. One tiny all-reduce
    right after mesh construction pins channel setup to a moment when every
    process is synchronized. No-op single-process."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("handmvnet_warmup_collectives")


def replicate_state(tree, mesh: Mesh):
    """Replicate a locally-materialized pytree (train state) over the mesh.

    Every process holds an identical local copy (state init is
    deterministic), but committed single-device arrays can't be device_put
    across hosts. Multi-process: broadcast each leaf to this process's mesh
    devices (D2D) and assemble the replicated global array from the
    addressable copies — no device->host transfer (which would permanently
    degrade a tunneled TPU transport, see CLAUDE.md). Single-process: plain
    device_put."""
    if jax.process_count() == 1:
        return jax.device_put(tree, replicated(mesh))
    local_devs = _local_mesh_devices(mesh)
    shard = replicated(mesh)

    def put(x):
        x = jnp.asarray(x)
        pieces = [jax.device_put(x, d) for d in local_devs]
        return jax.make_array_from_single_device_arrays(x.shape, shard, pieces)

    return jax.tree.map(put, tree)
