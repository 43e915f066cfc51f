"""Bilinear point-feature sampling (the reference's F.grid_sample path).

The reference samples per-joint feature vectors with
F.grid_sample(feat, grid, align_corners=True) where the grid is built as
coord/(size-1)*2-1 (src/models/nets.py:46-53). With align_corners=True that
normalization round-trips exactly to raw pixel coordinates, so this op takes
pixel-space points directly. padding_mode='zeros' (the torch default) means
any of the four bilinear corner taps that fall outside the map contribute
zero -- which matters because HandMvNet deliberately feeds 32x32-space
coordinates to every pyramid level, including 16x16/8x8 maps
(src/models/handmvnet.py:182-185); that quirk is replicated, not fixed.

TPU note: 21 points/view is tiny. The implementation is four
take_along_axis gathers over feat reshaped to [B, H*W, C] (one per bilinear
corner tap), vectorized over the batch*views dim — measured inside the
~0.07 ms fusion+heads budget (ROADMAP 5b), so the alternative one-hot
matmul formulation (which would put the gather on the MXU) was not needed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_points_bilinear(feat: jax.Array, points: jax.Array) -> jax.Array:
    """Sample feature vectors at fractional pixel locations.

    Args:
      feat: [B, H, W, C] feature maps (NHWC).
      points: [B, N, 2] (x, y) pixel coordinates in feat's own pixel units.

    Returns:
      [B, N, C] bilinearly interpolated features, zero contribution from
      out-of-bounds taps (torch grid_sample padding_mode='zeros',
      align_corners=True semantics).
    """
    b, h, w, c = feat.shape
    x = points[..., 0]
    y = points[..., 1]

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    x1 = x0 + 1.0
    y1 = y0 + 1.0

    wx1 = x - x0  # weight for x1 tap
    wy1 = y - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    def tap(xi, yi, wgt):
        inb = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
        xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        flat_idx = yi_c * w + xi_c  # [B, N]
        vals = jnp.take_along_axis(
            feat.reshape(b, h * w, c), flat_idx[..., None], axis=1
        )
        return vals * (wgt * inb.astype(feat.dtype))[..., None]

    out = (
        tap(x0, y0, wx0 * wy0)
        + tap(x1, y0, wx1 * wy0)
        + tap(x0, y1, wx0 * wy1)
        + tap(x1, y1, wx1 * wy1)
    )
    return out
