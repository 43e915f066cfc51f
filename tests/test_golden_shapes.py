"""Golden full-resolution shape specs from the reference's __main__ smoke
blocks (resnet.py:398-403, hrnet.py:514-518, hourglass.py:302-306,
handmvnet.py:110-115/162-196) — the reference's informal unit tests, made
real."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from handmvnet_tpu.models.backbones.resnet import ResNetBackbone
from handmvnet_tpu.models.backbones.hrnet import HRNetBackbone


@pytest.mark.slow
class TestGoldenShapes:
    def test_resnet34_early4_at_256(self):
        m = ResNetBackbone(version="34", early_return=4)
        x = jnp.ones((2, 256, 256, 3))
        v = jax.jit(m.init)(jax.random.PRNGKey(0), x)
        out = m.apply(v, x)
        # reference resnet.py:398-403 (NCHW there; NHWC here)
        assert out["res_layer1"].shape == (2, 64, 64, 64)
        assert out["res_layer2"].shape == (2, 32, 32, 128)
        assert out["res_layer3"].shape == (2, 16, 16, 256)
        assert out["res_layer4"].shape == (2, 8, 8, 512)
        assert out["res_layer4_mean"].shape == (2, 512)

    def test_resnet50_paper_at_256(self):
        m = ResNetBackbone(version="50_paper", early_return=3)
        x = jnp.ones((1, 256, 256, 3))
        v = jax.jit(m.init)(jax.random.PRNGKey(0), x)
        out = m.apply(v, x)
        # reference handmvnet.py:179: single [b*v, 1024, 32, 32] map
        assert out.shape == (1, 32, 32, 1024)

    def test_hrnet_w40_at_256(self):
        m = HRNetBackbone(width="w40")
        x = jnp.ones((1, 256, 256, 3))
        v = jax.jit(m.init)(jax.random.PRNGKey(0), x)
        outs = m.apply(v, x)
        # reference hrnet.py:514-518
        shapes = [(1, 64, 64, 40), (1, 32, 32, 80), (1, 16, 16, 160), (1, 8, 8, 320)]
        assert [tuple(o.shape) for o in outs] == shapes

    def test_full_model_output_contract_at_256(self):
        """reference handmvnet.py:254-266 output dict shapes (5 views)."""
        from handmvnet_tpu.config import Config
        from handmvnet_tpu.models import HandMvNet
        from handmvnet_tpu.data.synthetic import synthetic_batch
        from bench import _random_variables

        cfg = Config.from_yaml("configs/release/HO3D_HandMvNet.yaml")
        model = HandMvNet(cfg=cfg.model)
        batch = synthetic_batch(batch_size=2, num_views=5, with_heatmaps=False)
        variables = _random_variables(
            model, 0, batch["rgb"], batch["bboxes"], batch["intrinsic"]
        )
        out = jax.jit(model.apply)(
            variables, batch["rgb"], batch["bboxes"], batch["intrinsic"]
        )
        assert out["joints_crop_img"].shape == (2, 5, 21, 2)
        assert out["joints_cam"].shape == (2, 21, 3)
        assert out["heatmap"].shape == (2, 5, 21, 32, 32)
        # 2D coords are in 256-crop pixels (x8 rescale from the 32^2 heatmap)
        coords = np.asarray(out["joints_crop_img"])
        assert coords.min() >= 0.0 and coords.max() <= 256.0


def test_hrnet_packed_fuse_matches_unpacked_w64():
    """w64 widths exercise different block-diagonal packing shapes."""
    import jax
    import jax.numpy as jnp

    from handmvnet_tpu.models.backbones.hrnet import HRNetBackbone

    rng = jax.random.PRNGKey(1)
    x = jax.random.normal(rng, (1, 64, 64, 3), jnp.float32) * 0.3
    v = HRNetBackbone(width="w64", packed=False).init(rng, x, False)
    a = HRNetBackbone(width="w64", packed=False).apply(v, x, False)
    b = HRNetBackbone(width="w64", packed=True).apply(v, x, False)
    for ai, bi in zip(a, b):
        rel = float(jnp.max(jnp.abs(ai - bi))) / float(jnp.max(jnp.abs(ai)))
        assert rel < 1e-4


def test_hrnet_packed_fuse_matches_unpacked():
    """The eval-time packed fuse lattice (HRModule.packed: shared-source
    kernel concat + BN folding + block-diagonal deeper levels) is exact
    math — outputs must match the reference-style unpacked path to fp32
    noise, from the SAME param tree."""
    import jax
    import jax.numpy as jnp

    from handmvnet_tpu.models.backbones.hrnet import HRNetBackbone

    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 64, 64, 3), jnp.float32) * 0.3
    unpacked = HRNetBackbone(width="w40", packed=False)
    packed = HRNetBackbone(width="w40", packed=True)
    v = unpacked.init(rng, x, False)
    assert jax.tree.structure(v) == jax.tree.structure(packed.init(rng, x, False))

    a = unpacked.apply(v, x, False)
    b = packed.apply(v, x, False)
    for ai, bi in zip(a, b):
        rel = float(jnp.max(jnp.abs(ai - bi))) / float(jnp.max(jnp.abs(ai)))
        assert rel < 1e-4


def test_hrnet_branch_grouped_matches_plain():
    """The eval-time grouped branch-conv packing (HRModule._branch_grouped:
    batch folded into channels, one feature_group_count=B conv per original
    conv, BN folded) is exact math from the SAME param tree — outputs must
    match the plain path to fp32 noise. Whether it is FASTER is measured
    on-chip (scripts/probe_branch_packing.py); this pins that turning it on
    can never change results."""
    import jax
    import jax.numpy as jnp

    from handmvnet_tpu.models.backbones.hrnet import HRNetBackbone

    rng = jax.random.PRNGKey(2)
    x = jax.random.normal(rng, (3, 64, 64, 3), jnp.float32) * 0.3
    plain = HRNetBackbone(width="w40", branch_grouped=False)
    grouped = HRNetBackbone(width="w40", branch_grouped=True)
    v = plain.init(rng, x, False)
    assert jax.tree.structure(v) == jax.tree.structure(grouped.init(rng, x, False))

    a = plain.apply(v, x, False)
    b = grouped.apply(v, x, False)
    for i, (ai, bi) in enumerate(zip(a, b)):
        rel = float(jnp.max(jnp.abs(ai - bi))) / float(jnp.max(jnp.abs(ai)))
        assert rel < 1e-4, f"branch {i}: rel={rel}"
    # training path must be untouched by the flag (grouped is eval-only)
    t_a, m_a = plain.apply(v, x, True, mutable=["batch_stats"])
    t_b, m_b = grouped.apply(v, x, True, mutable=["batch_stats"])
    for ai, bi in zip(t_a, t_b):
        assert float(jnp.max(jnp.abs(ai - bi))) == 0.0


def test_resnet_stem_s2d_matches_plain_conv():
    """The space-to-depth stem (resnet.SpaceToDepthStem) is an exact
    algebraic rewrite of the 7x7/stride-2 conv — same products, same zero
    padding, reindexed onto a half-res 12-channel grid for MXU lane fill.
    Outputs must match the plain conv to float-reassociation noise at even
    spatial sizes, and odd sizes must take the exact fallback. Whether it
    is faster is measured on-chip (STEM_S2D_PROBE.json: 1.10x e2e)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from handmvnet_tpu.models.backbones.resnet import SpaceToDepthStem

    rng = jax.random.PRNGKey(5)
    k = jax.random.normal(rng, (7, 7, 3, 64), jnp.float32) * 0.05
    mod = SpaceToDepthStem(features=64)
    for h, w in ((64, 64), (32, 48), (33, 48)):  # last: odd -> fallback
        x = jax.random.normal(jax.random.fold_in(rng, h), (2, h, w, 3),
                              jnp.float32)
        ref = lax.conv_general_dilated(
            x, k, (2, 2), ((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        out = mod.apply({"params": {"kernel": k}}, x)
        assert out.shape == ref.shape
        rel = float(jnp.max(jnp.abs(out - ref))) / float(jnp.max(jnp.abs(ref)))
        assert rel < 1e-6, f"{h}x{w}: rel={rel}"


def test_resnet_stem_s2d_param_tree_unchanged():
    """Flipping resnet_stem_s2d must not change the param tree (the same
    conv1/kernel [7,7,3,64] path), so checkpoints convert identically —
    including at the 8-image stem batch where the gate actually engages
    the rewrite (other row counts statically take the plain conv, where it
    measured faster — STEM_S2D_PROBE.json)."""
    import jax
    import jax.numpy as jnp

    from handmvnet_tpu.models.backbones.resnet import ResNetBackbone

    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((8, 64, 64, 3), jnp.float32)  # 8 rows -> gate engages
    v_on = ResNetBackbone(version="50_paper", stem_s2d=True).init(rng, x, False)
    v_off = ResNetBackbone(version="50_paper", stem_s2d=False).init(rng, x, False)
    assert jax.tree.structure(v_on) == jax.tree.structure(v_off)
    a = v_on["params"]["conv1"]["kernel"]
    b = v_off["params"]["conv1"]["kernel"]
    assert a.shape == b.shape == (7, 7, 3, 64)
    # identical init from the same key: the rewrite shares the initializer
    assert float(jnp.max(jnp.abs(a - b))) == 0.0
    # and the gated-path output equals the plain path to reassociation noise
    xr = jax.random.normal(rng, (8, 64, 64, 3), jnp.float32)
    y_on = ResNetBackbone(version="50_paper", stem_s2d=True).apply(
        v_on, xr, False)
    y_off = ResNetBackbone(version="50_paper", stem_s2d=False).apply(
        v_on, xr, False)
    rel = float(jnp.max(jnp.abs(y_on - y_off))) / float(jnp.max(jnp.abs(y_off)))
    assert rel < 1e-5, rel


def test_resnet_stem_s2d_gate_is_eval_only():
    """The s2d gate must not engage under train=True even at the 8-row
    shape: every probe behind STEM_S2D_ROWS was eval-time, and an eval-only
    gate guarantees a training run computes the stem through one lowering
    at every microbatch shape (ADVICE r4: no reassociation noise when a
    microbatch happens to hit 8 stem rows)."""
    import jax
    import jax.numpy as jnp

    from handmvnet_tpu.models.backbones.resnet import ResNetBackbone

    rng = jax.random.PRNGKey(2)
    xr = jax.random.normal(rng, (8, 64, 64, 3), jnp.float32)
    v = ResNetBackbone(version="50_paper", stem_s2d=False).init(rng, xr, True)
    y_on, _ = ResNetBackbone(version="50_paper", stem_s2d=True).apply(
        v, xr, True, mutable=["batch_stats"])
    y_off, _ = ResNetBackbone(version="50_paper", stem_s2d=False).apply(
        v, xr, True, mutable=["batch_stats"])
    # bitwise: under train the flag selects the SAME program
    assert float(jnp.max(jnp.abs(y_on - y_off))) == 0.0
