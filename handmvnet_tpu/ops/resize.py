"""Antialiased bilinear resize as matmuls, plus the fused crop+resize+normalize
image-preprocessing op.

The reference preprocesses on CPU per-sample with torchvision
transforms.Resize(antialias=True) (src/datasets/ho3d.py:35-45), i.e. the
PIL-style triangle filter. Antialiased resize is the classic parity killer,
so it's replicated exactly — but expressed TPU-natively: a separable resize is
two small matmuls (out = W_y @ img @ W_x^T), which XLA puts on the MXU, and the
integer crop of a dynamic bbox folds into the weight matrices (full-image
columns outside the box get zero weight). That turns the reference's
crop_and_pad_image + Resize + Normalize chain (src/datasets/ho3d.py:136-153)
into one jittable, batchable device op with static shapes.

Weight construction mirrors torch's upsample_bilinear2d_aa:
  scale   = in / out
  support = max(scale, 1)
  center  = (i + 0.5) * scale
  taps j in [trunc(center - support + 0.5), trunc(center + support + 0.5))
  w_j     = max(0, 1 - |(j - center + 0.5) / max(scale, 1)|), row-normalized.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def _resize_weights_np(in_size: int, out_size: int) -> np.ndarray:
    """Static [out_size, in_size] antialias triangle-filter weight matrix."""
    scale = in_size / out_size
    support = max(scale, 1.0)
    inv = 1.0 / support
    i = np.arange(out_size, dtype=np.float64)[:, None]
    j = np.arange(in_size, dtype=np.float64)[None, :]
    center = (i + 0.5) * scale
    lo = np.maximum(np.trunc(center - support + 0.5), 0.0)
    hi = np.minimum(np.trunc(center + support + 0.5), float(in_size))
    w = np.maximum(0.0, 1.0 - np.abs((j - center + 0.5) * inv))
    w = np.where((j >= lo) & (j < hi), w, 0.0)
    w /= np.maximum(w.sum(axis=1, keepdims=True), 1e-12)
    return w.astype(np.float32)


def resize_bilinear_antialias(
    img: jax.Array, out_hw: tuple[int, int], channels: bool | None = None
) -> jax.Array:
    """Resize [..., H, W] (or [..., H, W, C]) maps with PIL/torch antialias
    bilinear semantics. Sizes are static; weights are baked constants.

    channels: pass explicitly when the layout is known. The default
    heuristic (trailing dim <= 4 with a larger dim at -3 means NHWC) is
    ambiguous for channel-less stacks whose W <= 4 — those MUST pass
    channels=False or the wrong two axes get resized."""
    if channels is None:
        channels = img.ndim >= 3 and img.shape[-1] <= 4 and img.shape[-3] > 4
    has_channels = channels
    if has_channels:
        h, w = img.shape[-3], img.shape[-2]
    else:
        h, w = img.shape[-2], img.shape[-1]
    wy = jnp.asarray(_resize_weights_np(h, out_hw[0]))
    wx = jnp.asarray(_resize_weights_np(w, out_hw[1]))
    if has_channels:
        return jnp.einsum("oh,...hwc,pw->...opc", wy, img, wx)
    return jnp.einsum("oh,...hw,pw->...op", wy, img, wx)


def _crop_resize_weights(
    lo_px: jax.Array, hi_px: jax.Array, in_size: int, out_size: int
) -> jax.Array:
    """[out_size, in_size] weights resampling full-image pixels [lo_px, hi_px)
    to out_size, with the same filter as _resize_weights_np. Crop bounds are
    dynamic (traced); shapes stay static. Pixels outside [0, in_size) act as
    zero padding, matching the reference's crop_and_pad_image
    (src/datasets/utils.py:40-77)."""
    lo = lo_px.astype(jnp.float32)
    crop = (hi_px - lo_px).astype(jnp.float32)
    scale = crop / out_size
    support = jnp.maximum(scale, 1.0)
    inv = 1.0 / support
    i = jnp.arange(out_size, dtype=jnp.float32)[:, None]
    j = jnp.arange(in_size, dtype=jnp.float32)[None, :]
    center = (i + 0.5) * scale  # in crop coords
    jc = j - lo  # full-image pixel -> crop coords
    tap_lo = jnp.trunc(center - support + 0.5)
    tap_hi = jnp.trunc(center + support + 0.5)
    w = jnp.maximum(0.0, 1.0 - jnp.abs((jc - center + 0.5) * inv))
    # taps are positioned in crop space; those landing outside the image are
    # zero-padding (still counted in normalization via the crop-space sum)
    in_window = (jc >= jnp.maximum(tap_lo, 0.0)) & (jc < jnp.minimum(tap_hi, crop))
    w = jnp.where(in_window, w, 0.0)
    # normalization uses the *full* window sum (including taps on zero padding)
    jall = jnp.arange(-in_size, 2 * in_size, dtype=jnp.float32)[None, :]
    wfull = jnp.maximum(0.0, 1.0 - jnp.abs((jall - center + 0.5) * inv))
    wfull = jnp.where((jall >= jnp.maximum(tap_lo, 0.0)) & (jall < jnp.minimum(tap_hi, crop)), wfull, 0.0)
    denom = jnp.maximum(wfull.sum(axis=1, keepdims=True), 1e-12)
    return w / denom


def crop_resize_normalize(
    image: jax.Array,
    box: jax.Array,
    out_size: int,
    normalize: bool = True,
) -> jax.Array:
    """Fused crop(int bbox, zero-pad) + antialias resize + ImageNet normalize.

    Args:
      image: [H, W, 3] uint8 or float in [0, 255].
      box: [4] int xyxy (may exceed image bounds; outside is zero padding).
      out_size: square output size (e.g. 256).

    Returns:
      [out_size, out_size, 3] float32, normalized like the reference's
      ToTensor+Normalize (src/datasets/ho3d.py:35-40) when normalize=True.
    """
    h, w = image.shape[0], image.shape[1]
    img = image.astype(jnp.float32) / 255.0
    wy = _crop_resize_weights(box[1], box[3], h, out_size)
    wx = _crop_resize_weights(box[0], box[2], w, out_size)
    out = jnp.einsum("oh,hwc,pw->opc", wy, img, wx)
    if normalize:
        mean = jnp.asarray(IMAGENET_MEAN, dtype=jnp.float32)
        std = jnp.asarray(IMAGENET_STD, dtype=jnp.float32)
        out = (out - mean) / std
    return out
