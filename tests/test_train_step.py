"""Train-step tests on the 8-virtual-device CPU mesh: the full DP shard_map
step compiles, runs, reduces losses, and updates params; loss decreases when
overfitting a single tiny batch."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from handmvnet_tpu.config import Config
from handmvnet_tpu.data.synthetic import synthetic_batch
from handmvnet_tpu.models import HandMvNet
from handmvnet_tpu.parallel import (
    create_train_state,
    make_lr_schedule,
    make_mesh,
    make_optimizer,
    make_train_step,
)
from handmvnet_tpu.parallel.mesh import data_sharding


def tiny_cfg():
    """2 views at 64^2 (the model keeps its image/8 heatmap contract) to keep
    CPU compile times test-friendly."""
    import dataclasses

    cfg = Config.from_yaml("configs/release/HO3D_HandMvNet.yaml")
    cfg = cfg.replace(model=dataclasses.replace(cfg.model, selected_views=(0, 1)))
    return cfg.replace(
        data=dataclasses.replace(cfg.data, image_size=64, heatmap_size=8)
    )


def tiny_model(cfg):
    return HandMvNet(cfg=cfg.model, image_size=64, heatmap_size=8)


class TestLRSchedule:
    def test_multistep(self):
        cfg = Config.from_yaml("configs/release/HO3D_HandMvNet.yaml")
        sched = make_lr_schedule(cfg, steps_per_epoch=10)
        # milestones 15/30/45/60 epochs, gamma 0.5, base 1e-4
        assert np.isclose(sched(0), 1e-4)
        assert np.isclose(sched(149), 1e-4)
        assert np.isclose(sched(151), 5e-5)
        assert np.isclose(sched(301), 2.5e-5)
        assert np.isclose(sched(601), 6.25e-6)


@pytest.mark.slow
class TestTrainStep:
    def test_dp_step_runs_and_reduces(self):
        cfg = tiny_cfg()
        model = tiny_model(cfg)
        mesh = make_mesh()  # all 8 virtual devices
        n = mesh.devices.size
        batch = synthetic_batch(batch_size=n, num_views=2, image_size=64, heatmap_size=8, seed=3)
        tx = make_optimizer(cfg, steps_per_epoch=10)
        state = create_train_state(model, cfg, jax.random.PRNGKey(0), batch, tx=tx)
        step = make_train_step(model, cfg, tx, mesh, accum_steps=1)
        sharding = data_sharding(mesh)
        dbatch = {k: jax.device_put(v, sharding) for k, v in batch.items()}

        # snapshot before stepping: the step donates the state buffers
        before = np.asarray(state.params["joints_decoder"]["joints_gcn1"]["weight"])
        state2, losses = step(state, dbatch, jax.random.PRNGKey(1))
        assert np.isfinite(float(losses["loss"]))
        assert int(state2.step) == 1
        after = np.asarray(state2.params["joints_decoder"]["joints_gcn1"]["weight"])
        assert np.abs(after - before).sum() > 0

    def test_grad_accumulation_matches_big_batch(self):
        """accum=2 over batch 2N approximates accum=1 over the same batch.
        NOT exact: BatchNorm in train mode normalizes per microbatch (batch
        1) vs the full batch (2) — identical to torch's accumulate_grad
        semantics — so outputs/losses differ by O(batch-stat noise). The
        tolerances below still catch gross bugs (e.g. unscaled grad sums)."""
        cfg = tiny_cfg()
        model = tiny_model(cfg)
        mesh = make_mesh(num_devices=1)
        batch = synthetic_batch(batch_size=2, num_views=2, image_size=64, heatmap_size=8, seed=4)
        tx = make_optimizer(cfg, steps_per_epoch=10)
        state = create_train_state(model, cfg, jax.random.PRNGKey(0), batch, tx=tx)

        step1 = make_train_step(model, cfg, tx, mesh, accum_steps=1)
        step2 = make_train_step(model, cfg, tx, mesh, accum_steps=2)
        s1, l1 = step1(state, batch, jax.random.PRNGKey(7))
        # recreate state (step1 donated it)
        state = create_train_state(model, cfg, jax.random.PRNGKey(0), batch, tx=tx)
        s2, l2 = step2(state, batch, jax.random.PRNGKey(7))
        np.testing.assert_allclose(
            float(l1["joints_3d_loss"]), float(l2["joints_3d_loss"]), rtol=0.05
        )
        # BN batch stats differ (per-microbatch vs full batch) so params are
        # close but not identical; compare a BN-free param tensor
        a = s1.params["joints_decoder"]["joints_gcn1"]["weight"]
        b = s2.params["joints_decoder"]["joints_gcn1"]["weight"]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3)

    def test_graft_dryrun(self):
        import __graft_entry__ as ge

        ge.dryrun_multichip(4)

    def test_overfit_single_batch(self):
        """Gradients flow end-to-end: 15 AdamW steps on one tiny batch must
        cut the loss substantially (catches dead branches / detached paths)."""
        import optax

        from handmvnet_tpu.parallel.train_step import TrainState, create_train_state

        cfg = tiny_cfg()
        import dataclasses
        cfg = cfg.replace(train=dataclasses.replace(cfg.train, lr=3e-4))
        model = tiny_model(cfg)
        mesh = make_mesh(num_devices=1)
        batch = synthetic_batch(batch_size=2, num_views=2, image_size=64,
                                heatmap_size=8, seed=11)
        tx = make_optimizer(cfg, steps_per_epoch=1000)
        state = create_train_state(model, cfg, jax.random.PRNGKey(0), batch, tx=tx)
        step = make_train_step(model, cfg, tx, mesh, accum_steps=1)

        losses0 = None
        for i in range(15):
            state, losses = step(state, batch, jax.random.PRNGKey(100))
            if losses0 is None:
                losses0 = float(losses["loss"])
        final = float(losses["loss"])
        assert np.isfinite(final)
        assert final < 0.7 * losses0, (losses0, final)

    def test_bf16_compute_dtype(self):
        """compute_dtype=bfloat16 trains: bf16 activations, fp32 losses."""
        import dataclasses

        cfg = tiny_cfg()
        cfg = cfg.replace(train=dataclasses.replace(cfg.train, compute_dtype="bfloat16"))
        model = tiny_model(cfg)
        mesh = make_mesh(num_devices=1)
        batch = synthetic_batch(batch_size=2, num_views=2, image_size=64,
                                heatmap_size=8, seed=12)
        tx = make_optimizer(cfg, steps_per_epoch=10)
        state = create_train_state(model, cfg, jax.random.PRNGKey(0), batch, tx=tx)
        step = make_train_step(model, cfg, tx, mesh, accum_steps=1)
        state, losses = step(state, batch, jax.random.PRNGKey(3))
        assert np.isfinite(float(losses["loss"]))
        # fp32 master params and fp32 BN running stats survive the bf16
        # compute cast (true mixed precision, round 2)
        assert state.params["joints_decoder"]["joints_gcn1"]["weight"].dtype == jnp.float32
        assert all(
            leaf.dtype == jnp.float32 for leaf in jax.tree.leaves(state.batch_stats)
        )

    def test_bf16_overfit_single_batch(self):
        """The mixed-precision path (params cast to bf16 for fwd/bwd, fp32
        masters in the optimizer) must still optimize: 15 steps on one tiny
        batch cut the loss substantially."""
        import dataclasses

        cfg = tiny_cfg()
        cfg = cfg.replace(train=dataclasses.replace(
            cfg.train, lr=3e-4, compute_dtype="bfloat16"))
        model = tiny_model(cfg)
        mesh = make_mesh(num_devices=1)
        batch = synthetic_batch(batch_size=2, num_views=2, image_size=64,
                                heatmap_size=8, seed=13)
        tx = make_optimizer(cfg, steps_per_epoch=1000)
        state = create_train_state(model, cfg, jax.random.PRNGKey(0), batch, tx=tx)
        step = make_train_step(model, cfg, tx, mesh, accum_steps=1)
        losses0 = None
        for _ in range(15):
            state, losses = step(state, batch, jax.random.PRNGKey(100))
            if losses0 is None:
                losses0 = float(losses["loss"])
        final = float(losses["loss"])
        assert np.isfinite(final)
        assert final < 0.7 * losses0, (losses0, final)

    def test_seed_determinism(self):
        """Same seed -> bitwise-identical first step (the reference pins
        seed 42 + deterministic='warn'; XLA gives us exact determinism)."""
        cfg = tiny_cfg()
        model = tiny_model(cfg)
        mesh = make_mesh(num_devices=1)
        batch = synthetic_batch(batch_size=2, num_views=2, image_size=64,
                                heatmap_size=8, seed=21)
        tx = make_optimizer(cfg, steps_per_epoch=10)
        step = make_train_step(model, cfg, tx, mesh, accum_steps=1)

        results = []
        for _ in range(2):
            state = create_train_state(model, cfg, jax.random.PRNGKey(5), batch, tx=tx)
            state, losses = step(state, batch, jax.random.PRNGKey(9))
            results.append((
                float(losses["loss"]),
                np.asarray(state.params["joints_decoder"]["joints_gcn1"]["weight"]),
            ))
        assert results[0][0] == results[1][0]
        np.testing.assert_array_equal(results[0][1], results[1][1])
