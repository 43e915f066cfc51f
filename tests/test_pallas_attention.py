"""Pallas fused attention: interpret-mode parity vs the jnp reference on CPU
(the real-TPU run is exercised by bench.py / the driver's compile check)."""

import numpy as np
import jax.numpy as jnp

from handmvnet_tpu.ops.pallas.attention import (
    _attention_jnp,
    fused_attention,
)


class TestFusedAttention:
    def test_interpret_matches_jnp_selfattn(self, rng):
        b, h, n, d = 2, 8, 105, 128  # 5 views x 21 joints
        q = rng.normal(size=(b, h, n, d)).astype(np.float32)
        k = rng.normal(size=(b, h, n, d)).astype(np.float32)
        v = rng.normal(size=(b, h, n, d)).astype(np.float32)
        scale = d ** -0.5
        oracle = np.asarray(_attention_jnp(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), scale))
        ours = np.asarray(
            fused_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), scale, interpret=True)
        )
        np.testing.assert_allclose(ours, oracle, atol=2e-5)

    def test_interpret_matches_jnp_crossattn(self, rng):
        # cross block: 21 queries over 21*(V-1) keys (unequal, non-multiple-of-8)
        b, h, d = 1, 8, 128
        q = rng.normal(size=(b, h, 21, d)).astype(np.float32)
        k = rng.normal(size=(b, h, 147, d)).astype(np.float32)
        v = rng.normal(size=(b, h, 147, d)).astype(np.float32)
        scale = d ** -0.5
        oracle = np.asarray(_attention_jnp(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), scale))
        ours = np.asarray(
            fused_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), scale, interpret=True)
        )
        np.testing.assert_allclose(ours, oracle, atol=2e-5)

    def test_custom_vjp_backward_math(self, rng):
        """The hand-written backward (used when the Pallas forward is active)
        must match autodiff through the jnp reference."""
        import jax

        from handmvnet_tpu.ops.pallas.attention import _pallas_attention_bwd

        b, h, n, d = 1, 2, 12, 16
        q = rng.normal(size=(b, h, n, d)).astype(np.float32)
        k = rng.normal(size=(b, h, n, d)).astype(np.float32)
        v = rng.normal(size=(b, h, n, d)).astype(np.float32)
        g = rng.normal(size=(b, h, n, d)).astype(np.float32)
        scale = d ** -0.5

        def loss(q, k, v):
            return jnp.sum(_attention_jnp(q, k, v, scale) * g)

        dq_ref, dk_ref, dv_ref = jax.grad(loss, argnums=(0, 1, 2))(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)
        )
        dq, dk, dv = _pallas_attention_bwd(
            scale, (jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)), jnp.asarray(g)
        )
        np.testing.assert_allclose(np.asarray(dq), np.asarray(dq_ref), atol=1e-4)
        np.testing.assert_allclose(np.asarray(dk), np.asarray(dk_ref), atol=1e-4)
        np.testing.assert_allclose(np.asarray(dv), np.asarray(dv_ref), atol=1e-4)
