"""Characterize the relayed-TPU-transport 'slow mode' degradation.

Measured behavior (2026-08-16, TPU v5 lite via the axon transport): a
compiled HRNet forward runs at ~1.2 ms/frame (chunked sync) in a fresh
process. Certain host<->device interactions PERMANENTLY flip the process
into a degraded mode where the SAME pre-compiled executable runs at
~6.2 ms/frame and fully-blocking dispatch is quantized at ~30 ms. No
recovery: recompiling, jax.clear_caches(), running 1000 steps, and idling
were all measured and none restore the fast path.

Triggers (measured, one fresh process per mode below):
  d2h             np.asarray(device_array) — blocking device->host read   SLOW
  device_closure  compiling a jit that closes over a DEVICE array
                  (lowering must fetch the literal: an implicit D2H)      SLOW
  eager           eager ops (no transfer)                                  ok
  h2d             host->device transfers                                   ok
  numpy_closure   jit closing over a NUMPY array                           ok
  inline_const    jnp constants created inside the traced function         ok

Rules derived for this repo (enforced in bench.py, models/ik.py,
models/mano.py, models/joints_to_vertices.py):
  1. never read a device value back to the host in any setup or timed path;
  2. constants captured by jitted closures must be numpy, never jnp arrays
     (indexing a numpy array with a device array counts — numpy silently
     converts via D2H);
  3. feeding data host->device and running eagerly are both fine.

Round-1 consequence: the MANO joints_template() D2H put every round-1
benchmark in slow mode — the flagship went 536 -> 3284 FPS (bf16, 8-view,
mesh stage included) once the transfers were eliminated.

Usage:  python scripts/probe_slowmode.py {d2h,device_closure,eager,h2d,numpy_closure,inline_const}
"""

import sys; sys.path.insert(0, ".")
import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

from handmvnet_tpu.config import Config
from handmvnet_tpu.models import HandMvNet
from handmvnet_tpu.data.synthetic import synthetic_batch
from bench import _random_variables

mode = sys.argv[1] if len(sys.argv) > 1 else "d2h"

cfg = Config.from_yaml("configs/release/HO3D_HandMvNet_HR.yaml")
cfg = cfg.replace(model=dataclasses.replace(cfg.model, selected_views=tuple(range(8))))
batch = synthetic_batch(batch_size=1, num_views=8, with_heatmaps=False, seed=0)
rgb = jnp.asarray(batch["rgb"], jnp.bfloat16)
bboxes = jnp.asarray(batch["bboxes"])
intr = jnp.asarray(batch["intrinsic"])
model = HandMvNet(cfg=cfg.model)
variables = _random_variables(model, 1, rgb, bboxes, intr)
variables = jax.tree.map(
    lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, variables
)


def fn(v, r, b, i):
    return model.apply(v, r, b, i)["joints_cam"]


c = jax.jit(fn).lower(variables, rgb, bboxes, intr).compile()
r = c(variables, rgb, bboxes, intr)
jax.block_until_ready(r)


def measure(tag):
    # barrier with a scalar VALUE read: block_until_ready can return before
    # queued executions finish on this transport (see bench.py). NOTE the
    # read itself triggers the degraded mode, so only the FIRST measure()
    # in a process observes the pre-read state — and only its first repeat
    # is clean; keep that in mind reading "baseline" numbers.
    best = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(100):
            out = c(variables, rgb, bboxes, intr)
        _ = float(out[(0,) * out.ndim])
        best = min(best, (time.perf_counter() - t0) / 100 * 1e3)
    print(f"{tag}: {best:.3f} ms/frame", flush=True)


measure("baseline")

if mode == "d2h":
    _ = np.asarray(r)
    measure("after D2H")
    jax.clear_caches()
    c2 = jax.jit(fn).lower(variables, rgb, bboxes, intr).compile()
    r2 = c2(variables, rgb, bboxes, intr)
    jax.block_until_ready(r2)
    c = c2
    measure("after clear_caches + recompile")
    for _ in range(1000):
        r2 = c2(variables, rgb, bboxes, intr)
    jax.block_until_ready(r2)
    time.sleep(5)
    measure("after 1000 steps + 5s sleep")
elif mode == "device_closure":
    const = jnp.asarray(np.ones((21, 3), np.float32))  # device array
    jax.jit(lambda x: x + const).lower(jnp.ones((21, 3))).compile()
    measure("after compile w/ device-array closure")
elif mode == "eager":
    y = jnp.ones((64, 64), jnp.float32) * 2.0
    y.block_until_ready()
    measure("after eager mul (no transfer)")
elif mode == "h2d":
    y = jnp.asarray(np.ones((256, 256), np.float32))
    y.block_until_ready()
    measure("after H2D")
elif mode == "numpy_closure":
    const = np.ones((21, 3), np.float32)
    jax.jit(lambda x: x + const).lower(jnp.ones((21, 3))).compile()
    measure("after compile w/ numpy closure")
elif mode == "inline_const":
    jax.jit(lambda x: x + jnp.asarray([1.0, 2.0, 3.0])).lower(
        jnp.ones((21, 3))
    ).compile()
    measure("after compile w/ inline jnp const")
else:
    raise SystemExit(f"unknown mode: {mode}")
