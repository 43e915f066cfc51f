"""Fused QKV attention Pallas TPU kernel for the cross-view fusion stack.

The fusion transformer attends over 21*V <= 168 tokens (SURVEY.md §5.7):
the whole QK^T -> softmax -> V chain for one (batch, head) fits comfortably
in VMEM (168x128 fp32 tiles), so the kernel is a single-block fuse — no
flash-attention tiling needed, just one MXU matmul, a row softmax on the
VPU, and a second matmul, with none of the intermediates touching HBM.

Grid: (B*H,). Tokens are padded to the fp32 sublane multiple (8) with an
additive -inf key mask so padded keys get zero attention weight; padded
query rows are sliced away on return.

Numerics match the jnp path (softmax over the unpadded keys); the jnp
reference implementation is used automatically off-TPU and under
interpret-mode tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _attention_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, n_keys: int):
    q = q_ref[0]  # [Nq, D]
    k = k_ref[0]  # [Nk, D]
    v = v_ref[0]
    logits = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # [Nq, Nk]
    key_ids = jax.lax.broadcasted_iota(jnp.int32, logits.shape, dimension=1)
    logits = jnp.where(key_ids < n_keys, logits, -jnp.inf)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o_ref[0] = jnp.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def _fused_attention_pallas(
    q: jax.Array, k: jax.Array, v: jax.Array, scale: float, interpret: bool = False
) -> jax.Array:
    """q: [B, H, Nq, D]; k, v: [B, H, Nk, D] -> [B, H, Nq, D]."""
    b, h, nq, d = q.shape
    nk = k.shape[2]
    sub = 16 if q.dtype == jnp.bfloat16 else 8
    nq_p, nk_p = _round_up(nq, sub), _round_up(nk, sub)
    d_p = _round_up(d, 128)

    def pad(x, n_p):
        return jnp.pad(
            x.reshape(b * h, x.shape[2], d),
            ((0, 0), (0, n_p - x.shape[2]), (0, d_p - d)),
        )

    qf, kf, vf = pad(q, nq_p), pad(k, nk_p), pad(v, nk_p)

    out = pl.pallas_call(
        functools.partial(_attention_kernel, scale=scale, n_keys=nk),
        grid=(b * h,),
        in_specs=[
            pl.BlockSpec((1, nq_p, d_p), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk_p, d_p), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk_p, d_p), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, nq_p, d_p), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, nq_p, d_p), q.dtype),
        interpret=interpret,
    )(qf, kf, vf)
    return out[:, :nq, :d].reshape(b, h, nq, d)


def _attention_jnp(q: jax.Array, k: jax.Array, v: jax.Array, scale: float) -> jax.Array:
    logits = jnp.einsum("bhid,bhjd->bhij", q, k) * scale
    attn = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhij,bhjd->bhid", attn, v)


# pallas_call has no automatic differentiation; the backward pass recomputes
# the (tiny) attention matrix in jnp — cheap at <=168 tokens and keeps the
# Pallas forward on the inference hot path.
@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _pallas_attention_ad(q, k, v, scale):
    return _fused_attention_pallas(q, k, v, scale)


def _pallas_attention_fwd(q, k, v, scale):
    return _fused_attention_pallas(q, k, v, scale), (q, k, v)


def _pallas_attention_bwd(scale, res, g):
    q, k, v = res
    logits = jnp.einsum("bhid,bhjd->bhij", q, k) * scale
    p = jax.nn.softmax(logits, axis=-1)
    dv = jnp.einsum("bhij,bhid->bhjd", p, g)
    dp = jnp.einsum("bhid,bhjd->bhij", g, v)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("bhij,bhjd->bhid", ds, k) * scale
    dk = jnp.einsum("bhij,bhid->bhjd", ds, q) * scale
    return dq, dk, dv


_pallas_attention_ad.defvjp(_pallas_attention_fwd, _pallas_attention_bwd)


def fused_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: float,
    use_pallas: bool | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Multi-head attention core: [B, H, N, D] layout.

    use_pallas=None auto-selects: the Pallas kernel on TPU backends, the jnp
    einsum chain elsewhere (identical numerics; see tests).
    """
    if interpret:
        return _fused_attention_pallas(q, k, v, scale, interpret=True)
    if use_pallas is None:
        # Default OFF on measured evidence (scripts/bench_pallas_attention.py,
        # TPU v5e, re-measured with trustworthy read barriers): the kernel
        # compiles fine (the round-1 Mosaic hang is gone), but end-to-end at
        # the 8-view protocol it is noise-equal-or-worse (device_fps 605 ON
        # vs ~626 OFF bf16) — pallas_call pads 168->176 tokens and breaks
        # producer/consumer fusion with the surrounding projections.
        # (Kernel-only comparisons are unresolvable through the relayed
        # harness: per-call dispatch dwarfs ~10 us of device work.)
        # Opt in with use_pallas=True for longer sequences where tiling
        # would matter.
        use_pallas = False
    if use_pallas:
        return _pallas_attention_ad(q, k, v, scale)
    return _attention_jnp(q, k, v, scale)
