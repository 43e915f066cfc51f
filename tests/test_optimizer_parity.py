"""Numerical parity of the training update rule vs torch.

The reference trains with AdamW(lr, wd=0.05) + clip_grad_norm_(1.0) +
MultiStepLR stepped per epoch (reference src/models/handmvnet.py:268-277,
src/train.py:43-46 via Lightning). make_optimizer claims equivalence
(parallel/train_step.py:55-66); this test *measures* it: a tiny torch module
and its converted flax twin take identical synthetic gradients for several
steps crossing two LR milestones, and the resulting parameters must agree to
<=1e-6 — surfacing any clip-ordering, wd-coupling, eps-placement, or
schedule off-by-one mismatch.
"""

import dataclasses

import numpy as np
import optax
import torch
import jax

from handmvnet_tpu.checkpoint import convert_torch_state_dict
from handmvnet_tpu.config import Config, LRSchedulerConfig
from handmvnet_tpu.parallel.train_step import make_lr_schedule, make_optimizer


class TinyNet(torch.nn.Module):
    """Conv + linear so the grad conversion exercises both kernel layouts."""

    def __init__(self):
        super().__init__()
        self.conv = torch.nn.Conv2d(3, 4, kernel_size=3, padding=1)
        self.fc = torch.nn.Linear(4, 3)


def make_cfg(steps_per_epoch_milestones=(1, 2), gamma=0.5):
    cfg = Config()
    return cfg.replace(
        train=dataclasses.replace(
            cfg.train,
            lr=1e-4,
            weight_decay=0.05,
            grad_clip=1.0,
            lr_scheduler=LRSchedulerConfig(
                gamma=gamma, milestones=tuple(steps_per_epoch_milestones)
            ),
        )
    )


def synthetic_grads(tmodel, rng, step):
    """Deterministic per-step grads, large enough that clipping engages on
    some steps and not others (global norm straddles 1.0)."""
    scale = 0.4 * (step + 1)
    grads = {}
    for name, p in tmodel.named_parameters():
        g = rng.normal(size=tuple(p.shape)).astype(np.float32) * scale
        grads[name] = g
    return grads


class TestOptimizerParity:
    def test_adamw_clip_multistep_parity(self, rng):
        steps_per_epoch = 2
        n_steps = 6  # epochs 0..2 -> crosses milestones at epochs 1 and 2
        cfg = make_cfg(steps_per_epoch_milestones=(1, 2), gamma=0.5)

        tmodel = TinyNet()
        opt = torch.optim.AdamW(
            tmodel.parameters(),
            lr=cfg.train.lr,
            weight_decay=cfg.train.weight_decay,
            betas=(0.9, 0.999),
            eps=1e-8,
        )
        sched = torch.optim.lr_scheduler.MultiStepLR(
            opt, milestones=list(cfg.train.lr_scheduler.milestones),
            gamma=cfg.train.lr_scheduler.gamma,
        )

        # converted flax twin (same tree structure as the grads below)
        params = convert_torch_state_dict(tmodel.state_dict())["params"]
        tx = make_optimizer(cfg, steps_per_epoch=steps_per_epoch)
        opt_state = tx.init(params)

        grads_per_step = [synthetic_grads(tmodel, rng, s) for s in range(n_steps)]
        torch_lrs = []

        for s in range(n_steps):
            opt.zero_grad()
            for name, p in tmodel.named_parameters():
                p.grad = torch.from_numpy(grads_per_step[s][name].copy())
            torch.nn.utils.clip_grad_norm_(tmodel.parameters(), cfg.train.grad_clip)
            torch_lrs.append(opt.param_groups[0]["lr"])
            opt.step()
            if (s + 1) % steps_per_epoch == 0:
                sched.step()  # Lightning steps MultiStepLR per epoch

            g_flax = convert_torch_state_dict(
                {k: torch.from_numpy(v) for k, v in grads_per_step[s].items()}
            )["params"]
            updates, opt_state = tx.update(g_flax, opt_state, params)
            params = optax.apply_updates(params, updates)

        # schedule parity at every step taken
        schedule = make_lr_schedule(cfg, steps_per_epoch)
        for s in range(n_steps):
            # rtol covers fp32 storage of the schedule value (1e-4 is not
            # exactly representable)
            np.testing.assert_allclose(
                float(schedule(s)), torch_lrs[s], rtol=1e-6,
                err_msg=f"lr at update {s}",
            )

        # parameter parity after 6 updates crossing both milestones
        final_torch = convert_torch_state_dict(tmodel.state_dict())["params"]
        flat_ours = jax.tree_util.tree_leaves_with_path(params)
        flat_ref = dict(jax.tree_util.tree_leaves_with_path(final_torch))
        # sanity: clipping engaged on step 0 (norm > 1) — guards the test
        g0_norm = np.sqrt(
            sum(float((np.asarray(g) ** 2).sum()) for g in grads_per_step[0].values())
        )
        assert g0_norm > 1.0, g0_norm
        for path, ours in flat_ours:
            ref = flat_ref[path]
            np.testing.assert_allclose(
                np.asarray(ours), np.asarray(ref), atol=1e-6,
                err_msg=jax.tree_util.keystr(path),
            )

    def test_unclipped_regime_parity(self, rng):
        """Same chain with grads below the clip threshold (clip is identity):
        isolates AdamW+schedule semantics from the clipping path."""
        steps_per_epoch = 3
        cfg = make_cfg(steps_per_epoch_milestones=(1,), gamma=0.75)
        tmodel = TinyNet()
        opt = torch.optim.AdamW(
            tmodel.parameters(), lr=cfg.train.lr,
            weight_decay=cfg.train.weight_decay, betas=(0.9, 0.999), eps=1e-8,
        )
        sched = torch.optim.lr_scheduler.MultiStepLR(
            opt, milestones=[1], gamma=0.75
        )
        params = convert_torch_state_dict(tmodel.state_dict())["params"]
        tx = make_optimizer(cfg, steps_per_epoch=steps_per_epoch)
        opt_state = tx.init(params)

        for s in range(5):
            grads = {
                name: rng.normal(size=tuple(p.shape)).astype(np.float32) * 1e-3
                for name, p in tmodel.named_parameters()
            }
            opt.zero_grad()
            for name, p in tmodel.named_parameters():
                p.grad = torch.from_numpy(grads[name].copy())
            torch.nn.utils.clip_grad_norm_(tmodel.parameters(), cfg.train.grad_clip)
            opt.step()
            if (s + 1) % steps_per_epoch == 0:
                sched.step()
            g_flax = convert_torch_state_dict(
                {k: torch.from_numpy(v) for k, v in grads.items()}
            )["params"]
            updates, opt_state = tx.update(g_flax, opt_state, params)
            params = optax.apply_updates(params, updates)

        final_torch = convert_torch_state_dict(tmodel.state_dict())["params"]
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-6
            ),
            params, final_torch,
        )
