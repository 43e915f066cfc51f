"""Int8 serving-time PTQ (ops/quant.py + model.backbone_int8).

Unlike the stem/packing rewrites this path is NOT exact math — it is an
opt-in serving accelerator (v5e rates int8 at 2x bf16 on the MXU; the
on-chip speed disposition lives in INT8_PROBE.json). These tests bound the
quantization error per conv and end-to-end, and pin the contract that makes
it safe to flip on: identical param trees (checkpoint-interchangeable) and
an untouched train path.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from handmvnet_tpu.ops.quant import Q8Conv, q8_conv, quantize_sym


def _rel_err(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    return float(np.max(np.abs(a - b))) / max(float(np.max(np.abs(b))), 1e-12)


def test_quantize_sym_roundtrip_per_tensor():
    x = jax.random.normal(jax.random.PRNGKey(0), (64, 64), jnp.float32)
    q, s = quantize_sym(x, axis=None)
    assert q.dtype == jnp.int8 and s.shape == ()
    deq = np.asarray(q, np.float32) * float(s)
    # symmetric absmax int8: max error is half a step = amax/254
    step = float(jnp.max(jnp.abs(x))) / 127.0
    assert float(np.max(np.abs(deq - np.asarray(x)))) <= 0.5 * step + 1e-7


def test_quantize_sym_per_channel_scales():
    # one channel 100x larger: per-channel scales must keep the small
    # channels accurate (the point of per-output-channel weight quant)
    k = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 8, 4), jnp.float32)
    k = k.at[..., 0].mul(100.0)
    q, s = quantize_sym(k, axis=(0, 1, 2))
    assert s.shape == (1, 1, 1, 4)
    deq = np.asarray(q, np.float32) * np.asarray(s)
    for c in range(4):
        step = float(jnp.max(jnp.abs(k[..., c]))) / 127.0
        err = float(np.max(np.abs(deq[..., c] - np.asarray(k)[..., c])))
        assert err <= 0.5 * step + 1e-7


@pytest.mark.parametrize("ksize,stride", [(1, 1), (3, 1), (3, 2)])
def test_q8_conv_close_to_f32_conv(ksize, stride):
    rng = jax.random.PRNGKey(2)
    x = jax.random.normal(rng, (2, 16, 16, 32), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(rng, 1), (ksize, ksize, 32, 24),
                          jnp.float32) * 0.1
    pad = (ksize - 1) // 2
    ref = lax.conv_general_dilated(
        x, k, window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    out = q8_conv(x, k, strides=(stride, stride), padding=((pad, pad), (pad, pad)))
    assert out.shape == ref.shape
    # int8 x int8 with per-channel weight scales on gaussian data: a couple
    # of percent relative error is the expected PTQ regime
    assert _rel_err(out, ref) < 0.03


def test_q8conv_param_tree_matches_nn_conv():
    """Q8Conv must be checkpoint-interchangeable with the plain conv: same
    param path ("kernel"), shape and dtype."""
    from handmvnet_tpu.models.layers import conv

    x = jnp.zeros((1, 8, 8, 16), jnp.float32)
    vq = Q8Conv(features=8, kernel=3, name="c").init(jax.random.PRNGKey(0), x)
    vp = conv(8, 3, name="c").init(jax.random.PRNGKey(0), x)
    jq = jax.tree.map(lambda a: (a.shape, a.dtype), vq)
    jp = jax.tree.map(lambda a: (a.shape, a.dtype), vp)
    assert jq == jp


def test_backbone_int8_same_tree_and_bounded_error():
    from handmvnet_tpu.models.backbones.resnet import ResNetBackbone

    x = jax.random.normal(jax.random.PRNGKey(3), (2, 64, 64, 3), jnp.float32)
    plain = ResNetBackbone(version="50_paper", int8_eval=False)
    quant = ResNetBackbone(version="50_paper", int8_eval=True)
    v = plain.init(jax.random.PRNGKey(0), x, False)
    # identical trees: the quantized backbone loads any existing checkpoint
    vq = quant.init(jax.random.PRNGKey(0), x, False)
    assert jax.tree.map(lambda a: (a.shape, str(a.dtype)), v) == \
        jax.tree.map(lambda a: (a.shape, str(a.dtype)), vq)
    ref = plain.apply(v, x, False)
    out = quant.apply(v, x, False)
    assert out.shape == ref.shape
    # random-weight 50-block stack: errors compound; bound loosely and also
    # require it is not garbage (correlated with the reference activations)
    a = np.asarray(ref, np.float32).ravel()
    b = np.asarray(out, np.float32).ravel()
    corr = float(np.corrcoef(a, b)[0, 1])
    assert corr > 0.98, f"int8 backbone decorrelated: corr={corr}"


def test_backbone_int8_train_path_untouched():
    """train=True must run the plain convs bit-for-bit even with the flag
    on (PTQ is serving-only; training through fake-quant is out of scope)."""
    from handmvnet_tpu.models.backbones.resnet import ResNetBackbone

    x = jax.random.normal(jax.random.PRNGKey(4), (2, 32, 32, 3), jnp.float32)
    plain = ResNetBackbone(version="18", early_return=4, int8_eval=False)
    quant = ResNetBackbone(version="18", early_return=4, int8_eval=True)
    v = plain.init(jax.random.PRNGKey(0), x, True)
    ref, mref = plain.apply(v, x, True, mutable=["batch_stats"])
    out, mout = quant.apply(v, x, True, mutable=["batch_stats"])
    for ka, kb in zip(jax.tree.leaves(ref), jax.tree.leaves(out)):
        np.testing.assert_array_equal(np.asarray(ka), np.asarray(kb))
    for ka, kb in zip(jax.tree.leaves(mref), jax.tree.leaves(mout)):
        np.testing.assert_array_equal(np.asarray(ka), np.asarray(kb))


def test_model_flag_threads_and_output_close():
    """model.backbone_int8 reaches the backbone through HandMvNet: same
    param tree, eval outputs close to the exact model, joints finite."""
    from handmvnet_tpu.config import ModelConfig
    from handmvnet_tpu.models import HandMvNet

    cfg = ModelConfig(selected_views=(0, 1), backbone="resnet",
                      backbone_type="50_paper", backbone_channels=(1024,),
                      pos_enc=("pos2d", "sin"))
    b, v, s = 1, 2, 64
    rng = jax.random.PRNGKey(5)
    x = jax.random.normal(rng, (b, v, s, s, 3), jnp.float32)
    bbox = jnp.tile(jnp.asarray([0.0, 0.0, 64.0, 64.0]), (b, v, 1))
    m_plain = HandMvNet(cfg=cfg, image_size=s, heatmap_size=s // 8)
    m_q = HandMvNet(cfg=dataclasses.replace(cfg, backbone_int8=True),
                    image_size=s, heatmap_size=s // 8)
    variables = m_plain.init(jax.random.PRNGKey(0), x, bbox, None, train=False)
    ref = m_plain.apply(variables, x, bbox, None, train=False)
    out = m_q.apply(variables, x, bbox, None, train=False)
    assert out["joints_cam"].shape == ref["joints_cam"].shape
    assert bool(jnp.all(jnp.isfinite(out["joints_cam"])))
    # heatmap-space joint coords: soft-argmax over a quantized backbone on
    # random weights — stay within a few pixels of the exact path
    d = np.abs(np.asarray(out["joints_crop_img"], np.float32)
               - np.asarray(ref["joints_crop_img"], np.float32))
    assert float(np.median(d)) < 4.0, f"median crop-px delta {float(np.median(d))}"
