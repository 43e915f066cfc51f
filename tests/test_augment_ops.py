"""Unit tests for the device-side augmentation primitives: exact-formula
oracles (posterize vs PIL, brightness/saturation algebra, occlusion geometry,
blur mass conservation), plus the bbox jitter invariants."""

import numpy as np
from PIL import Image, ImageOps
import jax
import jax.numpy as jnp

from handmvnet_tpu.data.augment import (
    _adjust_brightness,
    _adjust_saturation,
    _blur_fixed,
    _gaussian_blur_fixed,
    _occlude,
    _posterize,
    _sharpness,
    jitter_square_boxes,
)


def rand_img(rng, h=32, w=32):
    return rng.uniform(size=(h, w, 3)).astype(np.float32)


class TestPhotometric:
    def test_brightness(self, rng):
        img = rand_img(rng)
        out = np.asarray(_adjust_brightness(jnp.asarray(img), 1.2))
        np.testing.assert_allclose(out, img * 1.2, atol=1e-6)

    def test_saturation_extremes(self, rng):
        img = rand_img(rng)
        # factor 0 -> grayscale (ITU-R 601 luma)
        gray = np.asarray(_adjust_saturation(jnp.asarray(img), 0.0))
        luma = img @ np.array([0.299, 0.587, 0.114], dtype=np.float32)
        np.testing.assert_allclose(gray[..., 0], luma, atol=1e-5)
        np.testing.assert_allclose(gray[..., 0], gray[..., 1], atol=1e-6)
        # factor 1 -> identity
        same = np.asarray(_adjust_saturation(jnp.asarray(img), 1.0))
        np.testing.assert_allclose(same, img, atol=1e-6)

    def test_posterize_matches_pil(self, rng):
        img8 = (rng.uniform(size=(16, 16, 3)) * 255).astype(np.uint8)
        oracle = np.asarray(ImageOps.posterize(Image.fromarray(img8), 6))
        ours = np.asarray(_posterize(jnp.asarray(img8.astype(np.float32) / 255.0), 6))
        np.testing.assert_allclose(ours * 255.0, oracle.astype(np.float32), atol=0.51)

    def test_sharpness_identity_at_one(self, rng):
        img = rand_img(rng)
        out = np.asarray(_sharpness(jnp.asarray(img), 1.0))
        np.testing.assert_allclose(out, img, atol=1e-6)


class TestBlur:
    def test_box_blur_preserves_constant(self):
        img = jnp.full((16, 16, 3), 0.4)
        for k in (3, 5, 7):
            out = np.asarray(_blur_fixed(img, k))
            np.testing.assert_allclose(out, 0.4, atol=1e-6)

    def test_gaussian_blur_preserves_constant(self):
        img = jnp.full((16, 16, 3), 0.7)
        out = np.asarray(_gaussian_blur_fixed(img, 5, 0.8))
        np.testing.assert_allclose(out, 0.7, atol=1e-6)

    def test_box_blur_interior_matches_mean(self, rng):
        img = rand_img(rng)
        out = np.asarray(_blur_fixed(jnp.asarray(img), 3))
        expect = np.mean([img[4 + dy, 7 + dx] for dy in (-1, 0, 1) for dx in (-1, 0, 1)], axis=0)
        np.testing.assert_allclose(out[4, 7], expect, atol=1e-5)


class TestOcclusion:
    def test_zeroes_one_square(self):
        img = jnp.ones((64, 64, 3))
        out = np.asarray(_occlude(img, jax.random.PRNGKey(0)))
        zeroed = (out == 0).all(axis=-1)
        n = zeroed.sum()
        assert n > 0
        ys, xs = np.where(zeroed)
        h = ys.max() - ys.min() + 1
        w = xs.max() - xs.min() + 1
        assert n == h * w  # contiguous rectangle
        assert 8 <= max(h, w) <= 64


class TestBoxJitter:
    def test_stays_square_and_bounded(self, rng):
        boxes = jnp.asarray(
            np.stack([np.array([100.0, 120.0, 300.0, 320.0]) + i for i in range(6)])
        )
        out = np.asarray(jitter_square_boxes(boxes, jax.random.PRNGKey(1),
                                             max_shift=10.0, max_scale=0.1))
        w = out[:, 2] - out[:, 0]
        h = out[:, 3] - out[:, 1]
        np.testing.assert_allclose(w, h, atol=1e-4)
        assert (np.abs(w - 200.0) <= 20.0 + 1e-4).all()
        centers = (out[:, :2] + out[:, 2:]) / 2
        orig_centers = np.asarray((boxes[:, :2] + boxes[:, 2:]) / 2)
        assert (np.abs(centers - orig_centers) <= 10.0 + 1e-4).all()
