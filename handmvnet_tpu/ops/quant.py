"""Int8 post-training quantization for serving-time convolutions.

The v5e MXU rates int8 at 2x the bf16 matmul throughput (394 TOPS vs 197
TFLOP/s), and the flagship forward is ~84% backbone convs — so an int8
serving path is the one remaining order-unity perf lever after round 4's
stem rewrite. This module is the mechanism; whether it ships default-off or
on is decided by the on-chip measurement (scripts/probe_int8.py ->
INT8_PROBE.json), following the BRANCH_PACKING_PROBE.json precedent:
implemented + parity-bounded + measured, gated on evidence.

Scheme (standard PTQ for CNN serving):
  * weights: symmetric per-output-channel absmax scales, computed from the
    f32 params inside the jitted forward (loop-invariant: XLA hoists the
    quantization out of scanned serving loops, and per-call it is ~1e-3 of
    the conv's FLOPs),
  * activations: symmetric per-tensor DYNAMIC absmax scale (computed on
    device per call — no calibration pass or stored ranges; the reduction
    fuses into the previous op's epilogue),
  * conv accumulates in int32 (preferred_element_type), dequantizes with
    s_x * s_w[c] back to the compute dtype; bias (when present) adds after
    dequant in f32.

Accuracy: this CHANGES model math (unlike the exact stem/packing rewrites) —
it exists strictly behind the opt-in ``model.backbone_int8`` flag, default
OFF, and never touches the train path; the parity suite runs with it off.
tests/test_quant.py bounds the per-conv and whole-model error.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import lax


def quantize_sym(x: jax.Array, axis: tuple[int, ...] | None) -> tuple[jax.Array, jax.Array]:
    """Symmetric absmax int8 quantization.

    axis: reduction axes for the absmax (None = all axes -> per-tensor
    scale). Returns (int8 values, f32 scale) with scale shaped for
    broadcasting against x (reduced axes kept as size 1).
    """
    xf = x.astype(jnp.float32)
    if axis is None:
        amax = jnp.max(jnp.abs(xf))
    else:
        amax = jnp.max(jnp.abs(xf), axis=axis, keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return q, scale


def q8_conv(
    x: jax.Array,
    kernel: jax.Array,
    *,
    strides: tuple[int, int] = (1, 1),
    padding: Any = "SAME",
) -> jax.Array:
    """NHWC conv computed on the int8 MXU path: dynamic per-tensor activation
    scale, per-output-channel weight scale, int32 accumulation, dequant to
    x.dtype."""
    xq, sx = quantize_sym(x, axis=None)
    kq, sw = quantize_sym(kernel, axis=(0, 1, 2))  # [1,1,1,Cout]
    y = lax.conv_general_dilated(
        xq, kq,
        window_strides=strides,
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    deq = (sx * sw).reshape(1, 1, 1, -1)  # f32 [1,1,1,Cout]
    return (y.astype(jnp.float32) * deq).astype(x.dtype)


class Q8Conv(nn.Module):
    """Drop-in int8 serving variant of ``layers.conv``: same param name
    ("kernel", [kh,kw,cin,cout], f32) and torch-style symmetric padding, so
    the module is checkpoint-interchangeable with nn.Conv under the same
    name — only the arithmetic differs (quantized, per q8_conv)."""

    features: int
    kernel: int
    stride: int = 1
    padding: int | None = None
    use_bias: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        pad = (self.kernel - 1) // 2 if self.padding is None else self.padding
        k = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.kernel, self.kernel, x.shape[-1], self.features),
            jnp.float32,
        )
        y = q8_conv(x, k, strides=(self.stride, self.stride),
                    padding=((pad, pad), (pad, pad)))
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,),
                           jnp.float32)
            y = (y.astype(jnp.float32) + b).astype(x.dtype)
        return y


def conv_q8(features: int, kernel: int, stride: int = 1,
            padding: int | None = None, use_bias: bool = False,
            name: str | None = None, dtype=None) -> Q8Conv:
    """Factory mirroring ``layers.conv``'s signature (dtype accepted and
    ignored: the int8 path fixes its own compute dtypes)."""
    return Q8Conv(features=features, kernel=kernel, stride=stride,
                  padding=padding, use_bias=use_bias, name=name)
