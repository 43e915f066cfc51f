"""Backward-pass parity against the reference's own HandMvNet class.

Forward parity (test_reference_e2e_oracle), loss-assembly parity (same),
and optimizer parity (test_optimizer_parity) are each proven separately;
the remaining unproven link in "a training step matches torch" is the
GRADIENT of the total loss through the full model. This closes it: the
reference class (train mode, dropout silenced on both sides) and our flax
model take identical float64 weights + batch, and d(total loss)/d(params)
must agree per-leaf to ~1e-9, along with the train-mode BatchNorm
running-stat updates.

Float64 is the point, not a convenience: in fp32 BOTH frameworks' own
roundoff is amplified ~1e5x through the 50-layer train-mode BN backward
(measured: per-leaf gradients differ ~2% in fp32 but 1e-12 in f64, bare
backbone probe), so only the f64 comparison distinguishes "identical
semantics" from "different math". Runs in a subprocess because
jax_enable_x64 must be set process-wide and the suite runs fp32.

Oracle: /root/reference/src/models/handmvnet.py via the lightning stub
(training_step wiring :443-466, _calculate_loss :279-351)."""

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]


def _run_impl(config: str, image_size: int, timeout: float = 1500) -> dict:
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        [str(REPO), str(REPO / "tests"), env.get("PYTHONPATH", "")]
    )
    proc = subprocess.run(
        [sys.executable, __file__, "--impl", config, str(image_size)],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=timeout,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    return json.loads(proc.stdout.strip().splitlines()[-1])


@pytest.mark.slow
def test_full_model_gradient_parity_f64():
    result = _run_impl("configs/release/HO3D_HandMvNet.yaml", 256)

    assert result["loss_rel_diff"] < 1e-7, result  # term-summation roundoff wiggles ~1e-8
    # every parameter's gradient, full model, f64: identical math. The
    # floor (~3e-7 measured) is set by f32-rounded CONSTANTS shared with
    # the reference only at f32 precision (Chebyshev basis, sinusoidal PE),
    # not by any computational difference.
    assert result["n_checked"] > 100, result
    assert result["worst_rel"] < 5e-6, result
    assert result["worst_cos"] > 1 - 1e-9, result
    # dead branches must be dead on both sides
    assert result["n_dead_mismatched"] == 0, result
    # train-mode BN running-stat updates (incl. torch's unbiased
    # running-var rule, layers.TorchBatchNorm)
    assert result["stats_worst_rel"] < 1e-9, result


@pytest.mark.slow
def test_hrnet_gradient_parity_f64():
    """The same full-model f64 gradient proof for the SECOND backbone
    family: HRNet-w40 wo_cam (pos2d+sin encodings, no reprojection terms,
    mask_invisible_joints=false) at 128^2 (the gradient semantics are
    resolution-independent; 128^2 keeps the 1-core f64 runtime sane —
    the image/heatmap=8 ratio the quirks depend on is preserved)."""
    result = _run_impl(
        "configs/release/HO3D_HandMvNet_HR_wo_cam.yaml", 128, timeout=2400
    )
    assert result["loss_rel_diff"] < 1e-7, result
    assert result["n_checked"] > 100, result
    assert result["worst_rel"] < 5e-6, result
    assert result["worst_cos"] > 1 - 1e-9, result
    assert result["n_dead_mismatched"] == 0, result
    assert result["stats_worst_rel"] < 1e-9, result


def _impl(config_path: str, image_size: int) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    import dataclasses

    import numpy as np
    import torch
    import jax.numpy as jnp

    from handmvnet_tpu.checkpoint import convert_torch_state_dict
    from handmvnet_tpu.config import Config, LossWeights
    from handmvnet_tpu.losses import handmvnet_loss
    from handmvnet_tpu.models import HandMvNet

    from reference_oracle import import_reference_handmvnet
    from test_reference_e2e_oracle import (
        build_reference_model,
        make_cam_params,
        ref_cfg_from_yaml,
    )

    import_reference_handmvnet()

    # the reference's ChebConv builds its Chebyshev basis with a hardcoded
    # float32 dtype (reference layers.py:414-417), which breaks .double();
    # patch the SAME recurrence dtype-faithfully so the f64 run is exact
    from models import layers as ref_layers

    def cheb_polynomial_dtype_faithful(self, laplacian):
        laplacian = laplacian.to(torch.float64)
        n = laplacian.size(0)
        m = torch.zeros([self.K, n, n], dtype=laplacian.dtype)
        m[0] = torch.eye(n, dtype=laplacian.dtype)
        if self.K >= 2:
            m[1] = laplacian
        for k in range(2, self.K):
            m[k] = 2 * torch.mm(laplacian, m[k - 1]) - m[k - 2]
        return m

    ref_layers.ChebConv.cheb_polynomial = cheb_polynomial_dtype_faithful

    rng = np.random.default_rng(42)
    hm_size = image_size // 8  # the quirks' fixed image/heatmap ratio

    ref_cfg = ref_cfg_from_yaml(config_path)
    for sec in ("model", "data"):
        ref_cfg[sec]["selected_views"] = [0, 1]
        ref_cfg[sec]["num_views"] = 2
    ref_cfg["data"]["image_size"] = image_size
    ref_cfg["data"]["heatmap_size"] = hm_size
    mask_invisible = bool(ref_cfg["train"]["mask_invisible_joints"])
    tmodel = build_reference_model(ref_cfg).double()
    # convert BEFORE the torch forward: train-mode BN mutates running stats
    converted = convert_torch_state_dict(tmodel.state_dict())

    tmodel.train()
    for m in tmodel.modules():
        # dropout is the only stochastic node; silence it on both sides so
        # gradients are comparable (ours: HandMvNet(dropout=0.0))
        if isinstance(m, torch.nn.Dropout):
            m.eval()

    b, v = 1, 2
    x = rng.normal(size=(b, v, 3, image_size, image_size)) * 0.5
    bbox = np.stack(
        [np.array([80.0, 60.0, 280.0, 260.0]) + 5 * i for i in range(v)]
    )[None]
    intr32, extr32 = make_cam_params(rng, b, v)
    intr, extr = intr32.astype(np.float64), extr32.astype(np.float64)
    labels = {
        "joints_crop_img": rng.uniform(0, image_size, size=(b, v, 21, 2)),
        "joints_cam": rng.normal(size=(b, 21, 3)) * 0.05,
        "heatmap": rng.normal(size=(b, v, 21, hm_size, hm_size)),
        "root_joint": rng.normal(size=(b, 1, 3)) * 0.1 + np.array([0, 0, 0.6]),
        "root_idx": np.zeros((b,), dtype=np.int64),
        "bboxes": bbox,
        "joints_img_mask": rng.uniform(size=(b, v, 21)) > 0.7,
    }

    # ---- torch: forward (train mode) -> total loss -> backward
    cam_params = {"intrinsic": torch.from_numpy(intr),
                  "extrinsic": torch.from_numpy(extr)}
    t_labels = {k: torch.from_numpy(np.asarray(v_)) for k, v_ in labels.items()}
    out_t = tmodel(torch.from_numpy(x), torch.from_numpy(bbox), cam_params)
    total_t = tmodel._calculate_loss(out_t, t_labels, cam_params, mode="train")
    total_t.backward()
    tgrads = {
        name: p.grad.detach().clone()
        for name, p in tmodel.named_parameters()
        if p.grad is not None
    }
    ref_grads = convert_torch_state_dict(tgrads)["params"]
    ref_stats_after = convert_torch_state_dict(tmodel.state_dict())["batch_stats"]

    # ---- ours: same weights/batch in f64, jax.grad of the same total loss
    cfg = Config.from_yaml(config_path)
    cfg = cfg.replace(model=dataclasses.replace(cfg.model, selected_views=(0, 1)))
    model = HandMvNet(cfg=cfg.model, image_size=image_size,
                      heatmap_size=hm_size, dropout=0.0)
    params = jax.tree.map(lambda a: jnp.asarray(a, jnp.float64), converted["params"])
    batch_stats = jax.tree.map(
        lambda a: jnp.asarray(a, jnp.float64), converted["batch_stats"]
    )
    x_nhwc = jnp.asarray(np.transpose(x, (0, 1, 3, 4, 2)))
    labels_j = {k: jnp.asarray(np.asarray(v_)) for k, v_ in labels.items()}
    w = ref_cfg["train"]["loss_weights"]
    weights = LossWeights(heatmap=w["heatmap"], joints_2d=w["joints_2d"],
                          joints_3d=w["joints_3d"], g2d=w.get("g2d"),
                          p2d=w.get("p2d"))

    def loss_fn(params):
        out, mut = model.apply(
            {"params": params, "batch_stats": batch_stats},
            x_nhwc, jnp.asarray(bbox), jnp.asarray(intr),
            train=True, mutable=["batch_stats"],
        )
        terms = handmvnet_loss(
            out, labels_j, weights,
            mask_invisible_joints=mask_invisible, root_relative=True,
            intrinsics=jnp.asarray(intr), extrinsics=jnp.asarray(extr),
            root_idx=0, image_size=float(image_size),
        )
        return terms["loss"], mut

    (total_j, mut), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)

    result = {
        "loss_rel_diff": abs(float(total_j) - float(total_t))
        / abs(float(total_t)),
    }

    flat_ours = dict(jax.tree_util.tree_leaves_with_path(grads))
    flat_ref = dict(jax.tree_util.tree_leaves_with_path(ref_grads))
    assert flat_ours.keys() == flat_ref.keys()
    worst_rel, worst_cos, checked, dead_bad = 0.0, 1.0, 0, 0
    per_leaf = []
    for path, g_ours in flat_ours.items():
        g_ref = np.asarray(flat_ref[path], np.float64)
        g_ours = np.asarray(g_ours, np.float64)
        denom = np.linalg.norm(g_ref)
        if denom < 1e-9:  # analytically-dead branch: a conv bias feeding a
            # train-mode BN has exactly-zero gradient (BN removes constant
            # shifts); both sides compute only f64 cancellation roundoff
            dead_bad += int(np.linalg.norm(g_ours) > 1e-9)
            continue
        rel = float(np.linalg.norm(g_ours - g_ref) / denom)
        cos = float(
            (g_ours * g_ref).sum()
            / (np.linalg.norm(g_ours) * denom + 1e-300)
        )
        checked += 1
        per_leaf.append((rel, jax.tree_util.keystr(path)))
        worst_rel = max(worst_rel, rel)
        worst_cos = min(worst_cos, cos)
    per_leaf.sort()
    result.update(n_checked=checked, worst_rel=worst_rel, worst_cos=worst_cos,
                  n_dead_mismatched=dead_bad,
                  median_rel=per_leaf[len(per_leaf) // 2][0],
                  worst_leaves=[
                      [f"{r:.3e}", k] for r, k in per_leaf[-8:]
                  ])

    flat_so = dict(jax.tree_util.tree_leaves_with_path(mut["batch_stats"]))
    flat_sr = dict(jax.tree_util.tree_leaves_with_path(ref_stats_after))
    assert flat_so.keys() == flat_sr.keys()
    sworst = 0.0
    for path, s_ours in flat_so.items():
        s_ref = np.asarray(flat_sr[path], np.float64)
        s_ours = np.asarray(s_ours, np.float64)
        sworst = max(
            sworst,
            float(np.abs(s_ours - s_ref).max() / (np.abs(s_ref).max() + 1e-12)),
        )
    result["stats_worst_rel"] = sworst

    print(json.dumps(result))


if __name__ == "__main__":
    if "--impl" in sys.argv:
        i = sys.argv.index("--impl")
        _impl(sys.argv[i + 1], int(sys.argv[i + 2]))
