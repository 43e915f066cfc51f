"""Jitted data-parallel train/eval steps.

The reference delegates DP to Lightning DDP + NCCL (train.py:39-44) and
metric reduction to sync_dist (handmvnet.py:349). Here the whole step —
forward, loss, backward, psum-mean gradient reduction over ICI, optimizer
update, LR schedule — is ONE jitted shard_map program over the 1-D "data"
mesh:

  * gradients:   lax.pmean over "data"  (== DDP all-reduce)
  * batch stats: computed per replica (DDP does not sync BN), then pmean'd
    into the state so replicas stay bitwise identical (documented deviation:
    DDP lets per-rank stats drift; averaging them is strictly more stable)
  * loss/metric scalars: pmean (== sync_dist)
  * gradient accumulation: lax.scan over a leading microbatch axis
    (reference auto-sets accumulate_grad_batches=2, train.py:27-28)

Optimizer parity: AdamW(lr=1e-4, betas=(0.9, 0.999), eps=1e-8, wd on ALL
params like torch), global-norm clip 1.0, MultiStepLR per epoch.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Mapping

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from handmvnet_tpu.config import Config
from handmvnet_tpu.losses import handmvnet_loss
from handmvnet_tpu.parallel.mesh import DATA_AXIS


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any


def make_lr_schedule(cfg: Config, steps_per_epoch: int) -> optax.Schedule:
    """MultiStepLR: lr *= gamma at each milestone epoch (reference
    handmvnet.py:273-276)."""
    sched = cfg.train.lr_scheduler
    boundaries = {
        int(m) * steps_per_epoch: sched.gamma for m in sched.milestones
    }
    return optax.piecewise_constant_schedule(cfg.train.lr, boundaries)


def make_optimizer(cfg: Config, steps_per_epoch: int = 1000) -> optax.GradientTransformation:
    schedule = make_lr_schedule(cfg, steps_per_epoch)
    return optax.chain(
        optax.clip_by_global_norm(cfg.train.grad_clip),
        optax.adamw(
            learning_rate=schedule,
            b1=0.9,
            b2=0.999,
            eps=1e-8,
            weight_decay=cfg.train.weight_decay,
        ),
    )


def create_train_state(model, cfg: Config, rng, sample_batch, tx=None) -> TrainState:
    # jit the init: eager (op-by-op) flax init dispatches hundreds of tiny
    # kernels, which is pathologically slow on relayed TPU transports
    init_fn = jax.jit(
        lambda rng, rgb, boxes, intr: model.init(rng, rgb, boxes, intr, train=False)
    )
    variables = init_fn(
        rng,
        jnp.asarray(sample_batch["rgb"]),
        jnp.asarray(sample_batch["bboxes"]),
        jnp.asarray(sample_batch["intrinsic"]),
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = tx if tx is not None else make_optimizer(cfg)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
    )


def _forward_loss(model, cfg: Config, params, batch_stats, batch, rng):
    compute_params = params
    if cfg.train.compute_dtype == "bfloat16":
        # true mixed precision: cast params + activations to bf16 so the
        # convs/attention hit the MXU at native width (fp32 params alone
        # make XLA upcast every matmul — measured ~3x slower); the fp32
        # master params live in the optimizer state, and grads come back
        # fp32 through the cast's transpose. Losses/metrics stay fp32 (the
        # model casts its outputs up).
        batch = dict(batch)
        batch["rgb"] = batch["rgb"].astype(jnp.bfloat16)
        compute_params = jax.tree.map(
            lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p,
            params,
        )
    out, mutated = model.apply(
        {"params": compute_params, "batch_stats": batch_stats},
        batch["rgb"],
        batch["bboxes"],
        batch["intrinsic"],
        train=True,
        rngs={"dropout": rng},
        mutable=["batch_stats"],
    )
    if cfg.train.compute_dtype == "bfloat16":
        # running BN stats keep their fp32 storage (bf16 stats would also
        # flip the state pytree dtype between steps and force a recompile)
        mutated = {
            "batch_stats": jax.tree.map(
                lambda x: x.astype(jnp.float32), mutated["batch_stats"]
            )
        }
    labels = dict(batch)
    # meters for numeric stability (reference handmvnet.py:452-453)
    labels["joints_cam"] = batch["joints_cam"] / 1000.0
    labels["root_joint"] = batch["root_joint"] / 1000.0
    losses = handmvnet_loss(
        out,
        labels,
        cfg.train.loss_weights,
        mask_invisible_joints=cfg.train.mask_invisible_joints,
        root_relative=cfg.train.root_relative,
        intrinsics=batch.get("intrinsic"),
        extrinsics=batch.get("extrinsic"),
        root_idx=cfg.root_idx,
        image_size=float(cfg.data.image_size),
    )
    return losses["loss"], (mutated["batch_stats"], losses, out)


# Measured remat-free anchors (TRAIN_REMAT_PROBE.json, bf16, one 16 GB v5e):
# at the release recipe (global batch 16 x 5 views = 80 images/step) the
# compiler's own memory plan for the remat-FREE step is 6.85 GB
# (resnet50_paper) — comfortably inside the 13.5 GB budget — and dropping
# remat measures 101.1 -> 81.5 ms/step (+24% throughput; +28% with the
# reference's accum=2). Round 2's "exceeds one chip's HBM" assumption was
# never checked against the compiler and is falsified. "auto" therefore
# keeps remat OFF up to the measured per-device image count and re-enables
# it beyond (where it is untested but memory-bound), halving the anchor for
# fp32 activations (2x the bytes of the measured bf16 plan).
_REMAT_FREE_IMAGES = {"resnet": 80, "hrnet": 80}


def resolve_remat(
    cfg: Config,
    n_devices: int = 1,
    accum_steps: int = 1,
    *,
    batch_size: int | None = None,
    num_views: int | None = None,
) -> bool:
    """Production remat policy for the train step (TrainConfig.remat).

    The memory anchor is images-per-microbatch; by default that comes from
    the data config (what `train.py` feeds the step). Callers that build
    batches with shapes the config doesn't describe (bench/trace scripts
    using synthetic batches) must pass the actual batch_size/num_views, or
    the policy resolves against the YAML's shapes instead of the step's.
    """
    setting = str(cfg.train.remat).lower()
    if setting in ("on", "true"):
        return True
    if setting in ("off", "false"):
        return False
    if setting != "auto":
        raise ValueError(f"train.remat must be auto/on/off, got {cfg.train.remat!r}")
    if batch_size is None:
        batch_size = cfg.data.batch_size
    if num_views is None:
        num_views = cfg.data.num_views
    per_dev = -(-batch_size // max(1, n_devices))
    microbatch = -(-per_dev // max(1, accum_steps))
    images = microbatch * num_views
    limit = _REMAT_FREE_IMAGES.get(cfg.model.backbone, 0)
    if cfg.train.compute_dtype == "float32":
        limit //= 2
    return images > limit


def make_train_step(model, cfg: Config, tx, mesh: Mesh, accum_steps: int = 1) -> Callable:
    """Returns step(state, batch, rng) -> (state, metrics).

    `batch` is a dict of arrays with leading dim B_global; it is sharded over
    the mesh "data" axis. With accum_steps > 1, each shard's local batch is
    split into `accum_steps` microbatches scanned sequentially (gradients
    averaged), trading HBM for batch size exactly like the reference's
    accumulate_grad_batches.
    """

    def local_step(state: TrainState, batch: Mapping[str, jax.Array], rng: jax.Array):
        rng = jax.random.fold_in(rng, jax.lax.axis_index(DATA_AXIS))
        grad_fn = jax.grad(
            partial(_forward_loss, model, cfg), has_aux=True, argnums=0
        )

        if accum_steps > 1:
            micro = jax.tree.map(
                lambda x: x.reshape((accum_steps, x.shape[0] // accum_steps) + x.shape[1:]),
                dict(batch),
            )

            def scan_body(carry, mb_and_idx):
                mb, micro_idx = mb_and_idx
                grads_acc, bs = carry
                # fresh dropout masks per microbatch (the reference's
                # accumulate_grad_batches advances torch's global RNG per
                # forward; a shared key would correlate the masks)
                mb_rng = jax.random.fold_in(rng, micro_idx)
                grads, (bs_new, losses, _) = grad_fn(state.params, bs, mb, mb_rng)
                grads_acc = jax.tree.map(jnp.add, grads_acc, grads)
                return (grads_acc, bs_new), losses

            zero_grads = jax.tree.map(jnp.zeros_like, state.params)
            (grads, new_bs), losses = jax.lax.scan(
                scan_body, (zero_grads, state.batch_stats),
                (micro, jnp.arange(accum_steps)),
            )
            grads = jax.tree.map(lambda g: g / accum_steps, grads)
            losses = jax.tree.map(lambda x: x.mean(), losses)
        else:
            grads, (new_bs, losses, _) = grad_fn(state.params, state.batch_stats, dict(batch), rng)

        # DDP-equivalent all-reduce over ICI
        grads = jax.lax.pmean(grads, DATA_AXIS)
        losses = jax.lax.pmean(losses, DATA_AXIS)
        new_bs = jax.lax.pmean(new_bs, DATA_AXIS)

        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1, params=params, batch_stats=new_bs, opt_state=opt_state
        )
        return new_state, losses

    sharded = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(), P(DATA_AXIS), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,))


def make_eval_step(model, cfg: Config, mesh: Mesh) -> Callable:
    """Returns eval_step(state, batch) -> model outputs (replicated metrics
    are computed by the caller)."""

    def local_eval(state: TrainState, batch: Mapping[str, jax.Array]):
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["rgb"],
            batch["bboxes"],
            batch["intrinsic"],
            train=False,
        )
        return out

    sharded = shard_map(
        local_eval,
        mesh=mesh,
        in_specs=(P(), P(DATA_AXIS)),
        out_specs=P(DATA_AXIS),
        check_vma=False,
    )
    return jax.jit(sharded)
