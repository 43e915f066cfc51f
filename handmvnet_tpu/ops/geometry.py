"""Bounding-box / crop coordinate transforms and FoV positional encodings.

Semantics mirror the reference exactly (they are used both in data prep and
inside the model/loss, so parity matters):
  * img<->crop transforms: src/datasets/utils.py:124-162
  * center/scale -> xyxy box with int truncation: src/datasets/utils.py:199-221
  * bbox clamp to image: src/datasets/utils.py:30-33
  * square bbox from 2D points: src/datasets/utils.py:5-27
  * principal-point centering + atan FoV: src/models/utils.py:134-171

All functions are jnp-based and work on any leading batch dims.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def joints_img_to_crop(pts: jax.Array, boxes: jax.Array, image_size: float = 256.0) -> jax.Array:
    """Full-image pixel coords -> crop-image pixel coords.

    pts: [..., N, 2]; boxes: [..., 4] xyxy. Returns [..., N, 2].
    """
    x1y1 = boxes[..., None, 0:2]
    wh = boxes[..., None, 2:4] - x1y1
    return (pts - x1y1) * (image_size / wh)


def joints_crop_to_img(pts: jax.Array, boxes: jax.Array, image_size: float = 256.0) -> jax.Array:
    """Crop-image pixel coords -> full-image pixel coords (inverse of above)."""
    x1y1 = boxes[..., None, 0:2]
    wh = boxes[..., None, 2:4] - x1y1
    return pts * (wh / image_size) + x1y1


def center_scale_to_box(center: jax.Array, scale: jax.Array) -> jax.Array:
    """(center, side-length) -> integer xyxy box, truncated toward zero like
    numpy .astype(int). center: [..., 2], scale: [...]. Returns [..., 4] int32."""
    half = scale * 0.5
    xmin = center[..., 0] - half
    ymin = center[..., 1] - half
    xmax = xmin + scale
    ymax = ymin + scale
    return jnp.stack([xmin, ymin, xmax, ymax], axis=-1).astype(jnp.int32)


def clamp_box(box: jax.Array, image_hw: tuple[int, int]) -> jax.Array:
    """Clamp xyxy box to [0, W] x [0, H]. box: [..., 4]."""
    h, w = image_hw
    return jnp.stack(
        [
            jnp.maximum(box[..., 0], 0),
            jnp.maximum(box[..., 1], 0),
            jnp.minimum(box[..., 2], w),
            jnp.minimum(box[..., 3], h),
        ],
        axis=-1,
    )


def points_to_square_box(points2d: jax.Array, margin: float = 0.0) -> jax.Array:
    """Tight box around 2D points, symmetrically padded to square.

    points2d: [N, 2] -> [4] int32 xyxy. Mirrors the int truncations and the
    odd-pixel-goes-to-min-side rule of the reference (src/datasets/utils.py:5-27).
    """
    x_min = jnp.min(points2d[:, 0]).astype(jnp.int32)
    y_min = jnp.min(points2d[:, 1]).astype(jnp.int32)
    x_max = jnp.max(points2d[:, 0]).astype(jnp.int32)
    y_max = jnp.max(points2d[:, 1]).astype(jnp.int32)
    w = x_max - x_min
    h = y_max - y_min
    diff = jnp.abs(h - w)
    pad = diff // 2
    extra = diff % 2  # odd difference: one extra pixel on the min side
    x_min = jnp.where(h > w, x_min - pad - extra, x_min)
    x_max = jnp.where(h > w, x_max + pad, x_max)
    y_min = jnp.where(w > h, y_min - pad - extra, y_min)
    y_max = jnp.where(w > h, y_max + pad, y_max)
    m = jnp.int32(margin)
    return jnp.stack([x_min - m, y_min - m, x_max + m, y_max + m])


def box_corner_points(boxes: jax.Array) -> jax.Array:
    """xyxy box -> 5 points: 4 corners + center, in the reference's order
    (x1,y1), (x1,y2), (x2,y1), (x2,y2), center (src/models/handmvnet.py:208-214).

    boxes: [..., 4] -> [..., 5, 2].
    """
    x1, y1, x2, y2 = (boxes[..., i] for i in range(4))
    pts = jnp.stack(
        [x1, y1, x1, y2, x2, y1, x2, y2, (x1 + x2) * 0.5, (y1 + y2) * 0.5], axis=-1
    )
    return pts.reshape(*boxes.shape[:-1], 5, 2)


def centered_coordinates(points: jax.Array, px: jax.Array, py: jax.Array) -> jax.Array:
    """Shift points to be relative to the principal point.

    points: [..., N, 2]; px, py: [...] principal point. Returns [..., N, 2].
    """
    return jnp.stack(
        [points[..., 0] - px[..., None], points[..., 1] - py[..., None]], axis=-1
    )


def fov_angles(centered: jax.Array, fx: jax.Array, fy: jax.Array) -> jax.Array:
    """Per-point field-of-view angles atan(x/fx), atan(y/fy).

    centered: [..., N, 2]; fx, fy: [...]. Returns [..., N, 2] radians.
    """
    return jnp.stack(
        [
            jnp.arctan(centered[..., 0] / fx[..., None]),
            jnp.arctan(centered[..., 1] / fy[..., None]),
        ],
        axis=-1,
    )


def mask_joints(joints: jax.Array, invisible_mask: jax.Array) -> jax.Array:
    """Zero out joints flagged invisible. invisible_mask: [..., J] bool
    (True = invisible); joints: [..., J, D]. reference: src/models/utils.py:123-131."""
    keep = jnp.logical_not(invisible_mask).astype(joints.dtype)
    return joints * keep[..., None]
