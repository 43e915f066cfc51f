"""On-device photometric augmentation (training only).

The reference augments per sample on CPU with PIL/cv2 round-trips
(src/datasets/augment.py:132-152): ColorJitter(brightness .2, saturation .1,
hue .005) -> random blur (box/median/gaussian k in {3,5,7}, p=.4) ->
RandomAdjustSharpness(2, p=.3) -> RandomPosterize(6 bits, p=.3) -> random
square occlusion patch 8-64 px (p=.3).

Here the same distribution of perturbations is applied with jax.random on
the cropped/resized float images, batched over B*V on device. The reference
augments the crop at its NATIVE resolution before resizing; since this
pipeline fuses crop+resize, the spatially-sized ops (blur widths, occlusion
patches) are specified in crop pixels and scaled by raster/crop
magnification (`crop_scale`), reproducing the reference's spatial statistics
without materializing native-size crops. Augmentation is a stochastic
regularizer — parity is distributional, not bitwise; the one intentional
deviation (median blur -> box blur, since a 256^2 median filter is hostile
to TPU vectorization) is noted inline.
"""

from __future__ import annotations

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


def _box_blur_axis(x: jax.Array, w: jax.Array, axis: int) -> jax.Array:
    """Box mean along one axis with a TRACED integer width (windows shrink
    at the borders). cumsum + two gathers instead of a static kernel, so the
    width can depend on the crop scale inside jit."""
    n = x.shape[axis]
    csum = jnp.cumsum(x, axis=axis)
    idx = jnp.arange(n)
    hi = jnp.clip(idx + w // 2, 0, n - 1)
    lo = idx - (w - 1) // 2 - 1
    shape = [1] * x.ndim
    shape[axis] = n
    hi_v = jnp.take(csum, hi, axis=axis)
    lo_v = jnp.where(
        (lo >= 0).reshape(shape), jnp.take(csum, jnp.clip(lo, 0, n - 1), axis=axis), 0.0
    )
    count = (hi - jnp.maximum(lo, -1)).astype(x.dtype).reshape(shape)
    return (hi_v - lo_v) / count


def _box_blur_dynamic(img: jax.Array, w: jax.Array) -> jax.Array:
    """Separable box blur with traced width w >= 1."""
    w = jnp.maximum(w, 1)
    return _box_blur_axis(_box_blur_axis(img, w, 0), w, 1)


_GAUSS_RADIUS = 15  # static tap radius: covers k=7 at crop scales up to ~4x


def _gaussian_blur_dynamic(img: jax.Array, sigma: jax.Array, support: jax.Array):
    """Separable gaussian with TRACED sigma, truncated at +-support pixels
    (cv2.GaussianBlur truncates at the kernel extent); static tap count."""
    xs = jnp.arange(-_GAUSS_RADIUS, _GAUSS_RADIUS + 1, dtype=img.dtype)
    g = jnp.exp(-(xs**2) / (2.0 * sigma * sigma)) * (jnp.abs(xs) <= support)
    g = g / g.sum()
    k = 2 * _GAUSS_RADIUS + 1
    pad = _GAUSS_RADIUS
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


def _occlude(img, rng, crop_scale):
    """Random square zero patch, 8-64 px IN CROP SPACE with grid-aligned
    placement (reference augment.py:102-129 runs before the 256^2 resize, so
    the patch size is relative to the bbox side; crop_scale = raster/crop
    magnification maps it onto the resized image)."""
    h, w = img.shape[0], img.shape[1]
    k_size, k_r, k_c = jax.random.split(rng, 3)
    size_crop = jax.random.randint(k_size, (), 8, 65).astype(jnp.float32)
    size = size_crop * crop_scale  # raster-space patch side
    # grid-aligned cell choice, as the reference does on the crop
    rows = jnp.maximum((h / crop_scale / size_crop).astype(jnp.int32), 1)
    cols = jnp.maximum((w / crop_scale / size_crop).astype(jnp.int32), 1)
    r = jax.random.randint(k_r, (), 0, rows).astype(jnp.float32)
    c = jax.random.randint(k_c, (), 0, cols).astype(jnp.float32)
    y0, x0 = r * size, c * size
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    inside = (xs >= x0) & (xs < x0 + size) & (ys >= y0) & (ys < y0 + size)
    return jnp.where(inside[..., None], 0.0, img)


def augment_image(img: jax.Array, rng: jax.Array, crop_scale=1.0) -> jax.Array:
    """Full augmentation chain for one [H, W, 3] float image in [0, 1].

    crop_scale = raster_size / bbox_side: the reference augments the
    un-resized crop (ho3d.py:145-148), so the spatially-sized perturbations
    (blur kernels, occlusion patches) are defined in CROP pixels and scaled
    by this factor onto the resized raster. Pointwise ops (color jitter,
    sharpness's fixed 3x3 aside, posterize) are scale-free.
    """
    keys = jax.random.split(rng, 12)
    crop_scale = jnp.asarray(crop_scale, jnp.float32)

    # ColorJitter: brightness U[0.8,1.2], saturation U[0.9,1.1], hue U[-.005,.005]
    img = _adjust_brightness(img, jax.random.uniform(keys[0], (), minval=0.8, maxval=1.2))
    img = _adjust_saturation(img, jax.random.uniform(keys[1], (), minval=0.9, maxval=1.1))
    img = _adjust_hue(img, jax.random.uniform(keys[2], (), minval=-0.005, maxval=0.005))
    img = jnp.clip(img, 0.0, 1.0)

    # random blur p=.4 (reference augment.py:76-100): kind in
    # {box, median->box (documented deviation), gaussian}, k in {3,5,7}
    # CROP pixels; gaussian sigma in {1,2,3} crop pixels truncated at the
    # kernel extent like cv2
    def apply_blur(img):
        kind = jax.random.randint(keys[4], (), 0, 3)
        k_val = jnp.asarray([3, 5, 7], jnp.float32)[jax.random.randint(keys[5], (), 0, 3)]
        w_eff = jnp.round(k_val * crop_scale).astype(jnp.int32)
        box = _box_blur_dynamic(img, w_eff)
        sigma = (
            jnp.asarray([1.0, 2.0, 3.0])[jax.random.randint(keys[10], (), 0, 3)]
            * crop_scale
        )
        gauss = _gaussian_blur_dynamic(img, sigma, (k_val * crop_scale) / 2.0)
        return jnp.where(kind < 2, box, gauss)

    img = jnp.where(jax.random.uniform(keys[3]) < 0.4, apply_blur(img), img)

    # sharpness 2x, p=.3
    img = jnp.where(jax.random.uniform(keys[6]) < 0.3, _sharpness(img, 2.0), img)
    img = jnp.clip(img, 0.0, 1.0)

    # posterize to 6 bits, p=.3
    img = jnp.where(jax.random.uniform(keys[7]) < 0.3, _posterize(img, 6), img)

    # occlusion patch, p=.3
    img = jnp.where(
        jax.random.uniform(keys[8]) < 0.3, _occlude(img, keys[9], crop_scale), img
    )
    return img


def augment_batch(
    images: jax.Array, rng: jax.Array, crop_scales: jax.Array | None = None
) -> jax.Array:
    """images: [N, H, W, 3] in [0,1]; independent augmentation per image.
    crop_scales: [N] raster/crop magnification factors (1.0 = augment at
    raster scale)."""
    rngs = jax.random.split(rng, images.shape[0])
    if crop_scales is None:
        crop_scales = jnp.ones((images.shape[0],), jnp.float32)
    return jax.vmap(augment_image)(images, rngs, crop_scales)


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
