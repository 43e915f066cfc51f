"""Absolute-root branch (root_relative=False): the capability the reference
specifies but ships shape-broken/unreachable (handmvnet.py:236-249;
SURVEY.md §2.4). Our implementation fixes the plumbing as documented."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from handmvnet_tpu.config import Config
from handmvnet_tpu.data.synthetic import synthetic_batch
from handmvnet_tpu.models import HandMvNet


def test_root_branch_forward_and_grad():
    cfg = Config.from_yaml("configs/release/HO3D_HandMvNet.yaml")
    cfg = cfg.replace(model=dataclasses.replace(cfg.model, selected_views=(0, 1)))
    model = HandMvNet(cfg=cfg.model, image_size=64, heatmap_size=8, root_relative=False)
    batch = synthetic_batch(batch_size=2, num_views=2, image_size=64, heatmap_size=8)
    variables = model.init(
        jax.random.PRNGKey(0), batch["rgb"], batch["bboxes"], batch["intrinsic"]
    )
    assert "root_late_fusion" in variables["params"]
    assert "root_decoder" in variables["params"]
    out = model.apply(variables, batch["rgb"], batch["bboxes"], batch["intrinsic"])
    assert out["root_joint"].shape == (2, 1, 3)
    assert np.isfinite(np.asarray(out["root_joint"])).all()

    def loss(params):
        o = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            batch["rgb"], batch["bboxes"], batch["intrinsic"],
        )
        return jnp.sum(o["root_joint"] ** 2) + jnp.sum(o["joints_cam"] ** 2)

    grads = jax.grad(loss)(variables["params"])
    gsum = sum(float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads["root_decoder"]))
    assert np.isfinite(gsum) and gsum > 0
