"""Exactness of every space-to-depth stem production mode
(models/backbones/resnet.STEM_S2D_MODE + ops/pallas/stem.py).

All modes compute the identical 7x7/stride-2 stem conv from the same
[7,7,3,F] checkpoint parameter; which one is FASTER is measured on chip
(STEM_S2D_FUSE_PROBE.json). Here: every mode must match the plain conv to
f32 accumulation-order noise.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import handmvnet_tpu.models.backbones.resnet as resnet_mod
from handmvnet_tpu.models.backbones.resnet import SpaceToDepthStem
from handmvnet_tpu.ops.pallas.stem import (
    stem_s2d_fused,
    stem_s2d_reference,
)


@pytest.fixture
def stem_case():
    rng = jax.random.PRNGKey(3)
    k = jax.random.normal(rng, (7, 7, 3, 64), jnp.float32) * 0.05
    x = jax.random.normal(jax.random.fold_in(rng, 1), (2, 64, 64, 3),
                          jnp.float32)
    ref = stem_s2d_reference(x, k)
    return x, k, ref


@pytest.mark.parametrize("mode", ["transpose", "rowsplit", "identity_conv"])
def test_s2d_modes_match_plain_conv(stem_case, mode, monkeypatch):
    x, k, ref = stem_case
    monkeypatch.setattr(resnet_mod, "STEM_S2D_MODE", mode)
    out = SpaceToDepthStem(features=64).apply({"params": {"kernel": k}}, x)
    assert out.shape == ref.shape
    rel = float(jnp.max(jnp.abs(out - ref))) / float(jnp.max(jnp.abs(ref)))
    assert rel < 1e-6, f"{mode}: rel={rel}"


@pytest.mark.parametrize("shape", [(2, 64, 64, 3), (1, 256, 256, 3),
                                   (8, 64, 96, 3)])
def test_pallas_fused_stem_matches_plain_conv(shape):
    rng = jax.random.PRNGKey(7)
    k = jax.random.normal(rng, (7, 7, 3, 64), jnp.float32) * 0.05
    x = jax.random.normal(jax.random.fold_in(rng, shape[1]), shape,
                          jnp.float32)
    ref = stem_s2d_reference(x, k)
    out = stem_s2d_fused(x, k, interpret=True)  # CPU: interpreter mode
    assert out.shape == ref.shape
    rel = float(jnp.max(jnp.abs(out - ref))) / float(jnp.max(jnp.abs(ref)))
    assert rel < 1e-6, f"pallas fused: rel={rel}"


def test_pallas_fused_stem_bf16(stem_case):
    """bf16 inputs (the serving dtype): f32 accumulation inside, output in
    bf16 — compare against the conv run the same way."""
    x, k, _ = stem_case
    xb = x.astype(jnp.bfloat16)
    ref = stem_s2d_reference(xb, k)
    out = stem_s2d_fused(xb, k, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=0.05, atol=0.05)  # bf16 rounding of both paths


def test_resnet_mode_dispatch_is_patchable(stem_case, monkeypatch):
    """The backbone reads STEM_S2D_MODE at trace time (probes patch it);
    an unknown mode must not silently change numerics — it falls into the
    'transpose' else-branch."""
    x, k, ref = stem_case
    monkeypatch.setattr(resnet_mod, "STEM_S2D_MODE", "transpose")
    base = SpaceToDepthStem(features=64).apply({"params": {"kernel": k}}, x)
    rel = float(jnp.max(jnp.abs(base - ref))) / float(jnp.max(jnp.abs(ref)))
    assert rel < 1e-6
