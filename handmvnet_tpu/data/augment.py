"""On-device photometric augmentation (training only).

The reference augments per sample on CPU with PIL/cv2 round-trips
(src/datasets/augment.py:132-152): ColorJitter(brightness .2, saturation .1,
hue .005) -> random blur (box/median/gaussian k in {3,5,7}, p=.4) ->
RandomAdjustSharpness(2, p=.3) -> RandomPosterize(6 bits, p=.3) -> random
square occlusion patch 8-64 px (p=.3).

Here the same distribution of perturbations is applied with jax.random on
the cropped/resized float images, batched over B*V on device. Augmentation
is a stochastic regularizer — parity is distributional, not bitwise; the
one intentional deviation (median blur -> box blur, since a 256^2 median
filter is hostile to TPU vectorization) is noted inline.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_RGB_TO_GRAY = (0.299, 0.587, 0.114)


def _adjust_brightness(img, factor):
    return img * factor


def _adjust_saturation(img, factor):
    gray = jnp.einsum("...c,c->...", img, jnp.asarray(_RGB_TO_GRAY, img.dtype))[..., None]
    return gray + (img - gray) * factor


def _adjust_hue(img, delta):
    """Approximate hue rotation via YIQ chroma rotation (delta in turns)."""
    theta = delta * 2.0 * jnp.pi
    cos_h, sin_h = jnp.cos(theta), jnp.sin(theta)
    # RGB->YIQ
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    i = 0.596 * r - 0.274 * g - 0.322 * b
    q = 0.211 * r - 0.523 * g + 0.312 * b
    i2 = i * cos_h - q * sin_h
    q2 = i * sin_h + q * cos_h
    r2 = y + 0.956 * i2 + 0.621 * q2
    g2 = y - 0.272 * i2 - 0.647 * q2
    b2 = y - 1.106 * i2 + 1.703 * q2
    return jnp.stack([r2, g2, b2], axis=-1)


def _blur_fixed(img, k: int):
    """Separable box blur, kernel size k, edge-replicate padding (cv2-like)."""
    pad = k // 2
    x = jnp.pad(img, ((pad, pad), (0, 0), (0, 0)), mode="edge")
    x = sum(x[i : i + img.shape[0]] for i in range(k)) / k
    x = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)), mode="edge")
    x = sum(x[:, i : i + img.shape[1]] for i in range(k)) / k
    return x


def _gaussian_blur_fixed(img, k: int, sigma: float):
    half = k // 2
    xs = jnp.arange(-half, half + 1, dtype=img.dtype)
    g = jnp.exp(-(xs**2) / (2 * sigma * sigma))
    g = g / g.sum()
    pad = half
    x = jnp.pad(img, ((pad, pad), (0, 0), (0, 0)), mode="edge")
    x = sum(g[i] * x[i : i + img.shape[0]] for i in range(k))
    x = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)), mode="edge")
    x = sum(g[i] * x[:, i : i + img.shape[1]] for i in range(k))
    return x


def _sharpness(img, factor):
    """torchvision adjust_sharpness: blend with a fixed 3x3 smoothing kernel."""
    kernel = jnp.asarray([[1.0, 1.0, 1.0], [1.0, 5.0, 1.0], [1.0, 1.0, 1.0]], img.dtype) / 13.0
    pad = 1
    x = jnp.pad(img, ((pad, pad), (pad, pad), (0, 0)), mode="edge")
    smooth = sum(
        kernel[i, j] * x[i : i + img.shape[0], j : j + img.shape[1]]
        for i in range(3)
        for j in range(3)
    )
    return smooth + (img - smooth) * factor


def _posterize(img, bits: int = 6):
    """Keep top `bits` bits of each 8-bit channel (img in [0,1])."""
    levels = 2**bits
    q = jnp.floor(img * 255.0).astype(jnp.int32)
    q = (q >> (8 - bits)) << (8 - bits)
    return q.astype(img.dtype) / 255.0


def _occlude(img, rng):
    """Random 8-64 px square zero patch (reference augment.py:102-129)."""
    h, w = img.shape[0], img.shape[1]
    k_size, k_x, k_y = jax.random.split(rng, 3)
    size = jax.random.randint(k_size, (), 8, 65)
    x0 = jax.random.randint(k_x, (), 0, w - 8)
    y0 = jax.random.randint(k_y, (), 0, h - 8)
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    inside = (xs >= x0) & (xs < x0 + size) & (ys >= y0) & (ys < y0 + size)
    return jnp.where(inside[..., None], 0.0, img)


def augment_image(img: jax.Array, rng: jax.Array) -> jax.Array:
    """Full augmentation chain for one [H, W, 3] float image in [0, 1]."""
    keys = jax.random.split(rng, 10)

    # ColorJitter: brightness U[0.8,1.2], saturation U[0.9,1.1], hue U[-.005,.005]
    img = _adjust_brightness(img, jax.random.uniform(keys[0], (), minval=0.8, maxval=1.2))
    img = _adjust_saturation(img, jax.random.uniform(keys[1], (), minval=0.9, maxval=1.1))
    img = _adjust_hue(img, jax.random.uniform(keys[2], (), minval=-0.005, maxval=0.005))
    img = jnp.clip(img, 0.0, 1.0)

    # random blur p=.4: kind in {box, median->box, gaussian}, k in {3,5,7}
    def apply_blur(img):
        kind = jax.random.randint(keys[4], (), 0, 3)
        k_idx = jax.random.randint(keys[5], (), 0, 3)
        branches = []
        for k in (3, 5, 7):
            branches.append(partial(_blur_fixed, k=k))
        box = jax.lax.switch(k_idx, branches, img)
        branches_g = []
        for k in (3, 5, 7):
            branches_g.append(partial(_gaussian_blur_fixed, k=k, sigma=0.8))
        gauss = jax.lax.switch(k_idx, branches_g, img)
        return jnp.where(kind < 2, box, gauss)

    img = jnp.where(jax.random.uniform(keys[3]) < 0.4, apply_blur(img), img)

    # sharpness 2x, p=.3
    img = jnp.where(jax.random.uniform(keys[6]) < 0.3, _sharpness(img, 2.0), img)
    img = jnp.clip(img, 0.0, 1.0)

    # posterize to 6 bits, p=.3
    img = jnp.where(jax.random.uniform(keys[7]) < 0.3, _posterize(img, 6), img)

    # occlusion patch, p=.3
    img = jnp.where(jax.random.uniform(keys[8]) < 0.3, _occlude(img, keys[9]), img)
    return img


def augment_batch(images: jax.Array, rng: jax.Array) -> jax.Array:
    """images: [N, H, W, 3] in [0,1]; independent augmentation per image."""
    rngs = jax.random.split(rng, images.shape[0])
    return jax.vmap(augment_image)(images, rngs)


def jitter_square_boxes(
    boxes: jax.Array,
    rng: jax.Array,
    max_shift: float = 10.0,
    max_scale: float = 0.1,
) -> jax.Array:
    """Randomly shift and scale square xyxy boxes, keeping them square —
    the reference's dormant bbox-jitter augmentation
    (src/datasets/augment.py:10-73). boxes: [..., 4]."""
    k_shift, k_scale = jax.random.split(rng)
    center = (boxes[..., 0:2] + boxes[..., 2:4]) * 0.5
    side = boxes[..., 2] - boxes[..., 0]
    shift = jax.random.uniform(
        k_shift, center.shape, minval=-max_shift, maxval=max_shift
    )
    scale = 1.0 + jax.random.uniform(
        k_scale, side.shape, minval=-max_scale, maxval=max_scale
    )
    center = center + shift
    half = side * scale * 0.5
    return jnp.concatenate(
        [center - half[..., None], center + half[..., None]], axis=-1
    )
