"""Jitted on-device preprocessing: the reference's per-sample CPU transform
chain (crop_and_pad -> augment -> resize(antialias) -> normalize, plus the
21xV Gaussian heatmap rasterization; src/datasets/ho3d.py:131-166) as ONE
batched XLA program operating on raw decoded frames.

The host side only decodes JPEGs and stacks numpy arrays; everything
bandwidth-heavy runs on device:
  * crop+resize+normalize: two antialias weight matmuls per view (MXU)
  * black-image rule for fully-invisible views (ho3d.py:138-141)
  * photometric augmentation via jax.random (train only)
  * heatmaps: fused gaussian-render+downscale (no 256^2 intermediate)
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from handmvnet_tpu.data.augment import augment_batch
from handmvnet_tpu.ops.heatmap import render_gaussian_heatmaps_resized
from handmvnet_tpu.ops.resize import IMAGENET_MEAN, IMAGENET_STD, crop_resize_normalize


@partial(jax.jit, static_argnames=("image_size", "heatmap_size", "augment", "box_scale_denom"))
def preprocess_views(
    full_rgb: jax.Array,
    bboxes: jax.Array,
    joints_crop: jax.Array,
    any_visible: jax.Array,
    rng: jax.Array | None = None,
    *,
    image_size: int = 256,
    heatmap_size: int = 32,
    augment: bool = False,
    box_scale_denom: int = 1,
):
    """Args:
      full_rgb: [B, V, H, W, 3] uint8 raw frames.
      bboxes: [B, V, 4] int xyxy (pre-clamped like the reference's bboxes).
      joints_crop: [B, V, J, 2] crop-space 2D joints (for heatmaps).
      any_visible: [B, V] bool — False triggers the black-image rule.
      rng: augmentation PRNG key (required when augment=True).
      box_scale_denom: decode-side downscale factor of the incoming frames
        AND bboxes (DataConfig.decode_scale_denom); restores source-res
        crop sides for the augmentation-size convention.

    Returns:
      rgb [B, V, S, S, 3] float32 normalized, heatmaps [B, V, J, h, h].
    """
    b, v = full_rgb.shape[0], full_rgb.shape[1]
    flat_rgb = full_rgb.reshape((b * v,) + full_rgb.shape[2:])
    flat_box = bboxes.reshape(b * v, 4)

    crops = jax.vmap(
        lambda img, box: crop_resize_normalize(img, box, image_size, normalize=False)
    )(flat_rgb, flat_box)  # [B*V, S, S, 3] in [0, 1]

    if augment:
        assert rng is not None
        # crop-space scaling: the reference augments the un-resized crop
        # (ho3d.py:145-148), so blur/occlusion sizes are relative to the
        # SOURCE-resolution bbox side, not the raster. With decode-side
        # downscaling the incoming boxes are in 1/denom frame coords —
        # multiply back so the augmentation distribution is unchanged.
        sides = jnp.maximum(
            (flat_box[:, 2] - flat_box[:, 0]).astype(jnp.float32)
            * float(box_scale_denom),
            1.0,
        )
        crops = augment_batch(crops, rng, crop_scales=image_size / sides)

    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)
    # black-image rule: fully-invisible views become normalized zeros
    vis = any_visible.reshape(b * v, 1, 1, 1).astype(jnp.float32)
    crops = crops * vis
    rgb = (crops - mean) / std

    heatmaps = render_gaussian_heatmaps_resized(
        joints_crop.reshape(b * v, -1, 2), image_size, heatmap_size
    )
    return (
        rgb.reshape(b, v, image_size, image_size, 3),
        heatmaps.reshape(b, v, -1, heatmap_size, heatmap_size),
    )
