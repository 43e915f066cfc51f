"""Fused space-to-depth stem conv — one Pallas TPU kernel.

The exact s2d rewrite of the ResNet 7x7/s2 stem (resnet.SpaceToDepthStem,
STEM_S2D_PROBE.json) materializes the 2x2 shuffle as XLA copy kernels:
TRACE_ANALYSIS_S2D.json attributes ~90 us/frame (~6.5% of the flagship) to
copy.860/861 — the [8,256,256,3] -> [8,128,128,12] interleave is a
sub-lane-granularity relayout TPUs do badly as a standalone copy. This
kernel never materializes that layout in HBM: it reads the two H-phase row
planes (an XLA row-granular slice + FREE trailing-dim reshape — no lane
shuffle), builds the 4x4x12-tap im2col patch matrix in VMEM, and feeds one
[rows*128, 192] x [192, 64] MXU matmul per row tile.

Derivation (same algebra as SpaceToDepthStem): with output position (p, q),
tap (u, v) of the 7x7/s2 conv reindexed as u = 2(a-2)+r+1, v = 2(b-2)+s+1,
the products are x[2(p+a-2)+r, 2(q+b-2)+s, c] * w2[a, b, (r,s,c), f].
Viewing the r-phase row plane as V_r[p', q', (s,c)] = x[2p'+r, 2q'+s, c]
(a FREE reshape of x[:, r::2] since (s, c) are trailing-contiguous), the
patch matrix is P[p, q, (a,r,b,s,c)] = V_r[p+a-2, q+b-2, (s,c)] — built
from shifted VMEM slices only, no per-element shuffles.

Reference being accelerated: the reference's conv1 (torchvision ResNet
stem, reference src/models/backbones/resnet.py:157) — exact math, same
[7,7,3,64] checkpoint parameter.

STATUS (round 5, STEM_S2D_FUSE_PROBE.json): NOT production-eligible on the
current toolchain. The kernel is exact (tests/test_stem_modes.py, interpret
mode incl. bf16/odd widths), but Mosaic's compiler subprocess crashes on
its essential construct — a trailing-dim split to a non-lane-aligned minor
dim (minimal repro: reshape [128,768] -> [128,128,6] crashes; the
lane-aligned [128,768] -> [128,6,128] compiles). The im2col needs the
(s,c)-minor view of q-major phase rows (csc=6 trailing), so no tile/layout
tweak routes around it. Revisit when Mosaic gains sublane-granular
relayouts.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# output rows computed per inner step: P tile = [P_TILE*Wout, 192] in VMEM
P_TILE = 16


def _stem_kernel(xe_ref, xo_ref, w_ref, o_ref, *, hout: int, wout: int,
                 cin: int):
    """xe/xo: [1, Hout, Wout*2*cin] row-phase planes; w: [16*2*2*cin_pad, F]
    (col order (a, r, b, s, c)); o: [1, Hout, Wout*F]."""
    csc = 2 * cin  # channels of one phase plane's (s, c) trailing dim
    f = w_ref.shape[1]

    # whole-image phase planes as [Hout, Wout, 2*cin] values; pad H by the
    # conv's (2, 1) and W by (2, 1) so shifted slices implement the taps
    def padded(plane_ref):
        v = plane_ref[0].reshape(hout, wout, csc)
        return jnp.pad(v, ((2, 1), (2, 1), (0, 0)))

    ve = padded(xe_ref)  # r = 0
    vo = padded(xo_ref)  # r = 1

    # statically unrolled over row tiles: Mosaic TC has no dynamic_slice on
    # VMEM values (probed on the real chip, STEM_S2D_FUSE_PROBE.json), and
    # with static p0 every tap shift is a plain static slice
    for t in range(hout // P_TILE):
        p0 = t * P_TILE
        # P [P_TILE, Wout, 192]: concat over (a, r, b) of [P_TILE, Wout, csc]
        blocks = []
        for a in range(4):
            for v in (ve, vo):
                va = v[p0 + a:p0 + a + P_TILE, :wout + 3, :]
                for b in range(4):
                    blocks.append(va[:, b:b + wout, :])
        patches = jnp.concatenate(blocks, axis=-1)  # [P_TILE, Wout, 32*csc]
        out = jax.lax.dot_general(
            patches.reshape(P_TILE * wout, 32 * csc),
            w_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)
        o_ref[0, p0:p0 + P_TILE, :] = out.reshape(P_TILE, wout * f)


def _reorder_weights(kernel: jax.Array) -> jax.Array:
    """[7,7,3,F] torch-layout stem kernel -> [192, F] im2col weights in the
    kernel's (a, r, b, s, c) column order (same tap algebra as
    SpaceToDepthStem: pad taps 7->8, u' = 2a+r, v' = 2b+s)."""
    f = kernel.shape[-1]
    w2 = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))
    w2 = w2.reshape(4, 2, 4, 2, 3, f)            # (a, r, b, s, c, f)
    w2 = w2.transpose(0, 1, 2, 3, 4, 5)          # already (a, r, b, s, c)
    return w2.reshape(192, f)


@functools.partial(jax.jit, static_argnames=("interpret",))
def stem_s2d_fused(x: jax.Array, kernel: jax.Array,
                   interpret: bool = False) -> jax.Array:
    """Exact 7x7/stride-2 stem conv, fused s2d im2col kernel.

    x: [N, H, W, 3] (H, W even); kernel: [7, 7, 3, F] (the checkpoint's
    conv1 parameter, torch tap layout). Returns [N, H/2, W/2, F], matching
    ``lax.conv_general_dilated(x, kernel, (2,2), ((3,3),(3,3)))`` to f32
    accumulation-order noise.
    """
    n, h, w, cin = x.shape
    assert cin == 3 and h % 2 == 0 and w % 2 == 0, x.shape
    hout, wout, f = h // 2, w // 2, kernel.shape[-1]
    assert hout % P_TILE == 0, (hout, P_TILE)

    # H-phase planes: row-granular slice + trailing-dim merge (both free of
    # lane shuffles in XLA)
    xe = x[:, 0::2].reshape(n, hout, wout * 2 * cin)
    xo = x[:, 1::2].reshape(n, hout, wout * 2 * cin)
    wk = _reorder_weights(kernel.astype(x.dtype))

    out = pl.pallas_call(
        functools.partial(_stem_kernel, hout=hout, wout=wout, cin=cin),
        out_shape=jax.ShapeDtypeStruct((n, hout, wout * f), x.dtype),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, hout, wout * 2 * cin), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hout, wout * 2 * cin), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((192, f), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hout, wout * f), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=14 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * hout * wout * f * 147,
            bytes_accessed=x.size * x.dtype.itemsize * 2
            + n * hout * wout * f * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xe, xo, wk)
    return out.reshape(n, hout, wout, f)


def stem_s2d_reference(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """The plain 7x7/s2 conv (oracle for tests)."""
    return jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), (2, 2), ((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
