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
    _box_blur_dynamic,
    _gaussian_blur_dynamic,
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
            out = np.asarray(_box_blur_dynamic(img, jnp.asarray(k)))
            np.testing.assert_allclose(out, 0.4, atol=1e-6)

    def test_gaussian_blur_preserves_constant(self):
        img = jnp.full((16, 16, 3), 0.7)
        out = np.asarray(
            _gaussian_blur_dynamic(img, jnp.asarray(0.8), jnp.asarray(2.0))
        )
        np.testing.assert_allclose(out, 0.7, atol=1e-6)

    def test_box_blur_interior_matches_mean(self, rng):
        img = rand_img(rng)
        out = np.asarray(_box_blur_dynamic(jnp.asarray(img), jnp.asarray(3)))
        expect = np.mean([img[4 + dy, 7 + dx] for dy in (-1, 0, 1) for dx in (-1, 0, 1)], axis=0)
        np.testing.assert_allclose(out[4, 7], expect, atol=1e-5)

    def test_box_blur_dynamic_width_is_traced(self):
        """One jitted program serves every width (no retrace per kernel)."""
        img = jnp.asarray(np.random.default_rng(0).uniform(size=(32, 32, 3)), jnp.float32)
        f = jax.jit(_box_blur_dynamic)
        outs = [np.asarray(f(img, jnp.asarray(w))) for w in (1, 3, 10, 21)]
        # w=1 identity up to cumsum fp32 roundoff
        assert np.allclose(outs[0], np.asarray(img), atol=1e-5)
        # wider kernel -> smoother (lower variance)
        assert np.var(outs[3]) < np.var(outs[1]) < np.var(outs[0])


class TestOcclusion:
    def test_zeroes_one_square(self):
        img = jnp.ones((64, 64, 3))
        out = np.asarray(_occlude(img, jax.random.PRNGKey(0), jnp.asarray(1.0)))
        zeroed = (out == 0).all(axis=-1)
        n = zeroed.sum()
        assert n > 0
        ys, xs = np.where(zeroed)
        h = ys.max() - ys.min() + 1
        w = xs.max() - xs.min() + 1
        assert n == h * w  # contiguous rectangle
        assert 8 <= max(h, w) <= 64

    def test_occlusion_area_matches_reference_distribution(self):
        """The reference occludes the un-resized crop (augment.py:102-129):
        patch side s~U{8..64} on a crop of side D covers (s/D)^2 of the hand.
        With crop_scale=256/D our raster patch must cover the same fraction."""
        D = 128.0  # crop side
        scale = 256.0 / D
        img = jnp.ones((256, 256, 3))
        fracs = []
        for i in range(200):
            out = np.asarray(_occlude(img, jax.random.PRNGKey(i), jnp.asarray(scale)))
            fracs.append(((out == 0).all(axis=-1)).mean())
        # reference expectation: E[(s/D)^2], s ~ U{8..64}
        s = np.arange(8, 65, dtype=np.float64)
        expect = np.mean((s / D) ** 2)
        got = np.mean(fracs)
        assert abs(got - expect) / expect < 0.15, (got, expect)
        # and the largest patch must exceed anything a raster-space 8-64 px
        # patch could produce at this magnification
        assert np.max(fracs) > (64.0 / 256.0) ** 2 * 1.5

    def test_blur_energy_matches_crop_space_reference(self):
        """Box blur k on the native crop then 2x upscale ~= our dynamic box
        blur of width 2k on the upscaled raster (same spatial statistics)."""
        import cv2

        rng = np.random.default_rng(3)
        crop = rng.uniform(size=(128, 128, 3)).astype(np.float32)
        ref = cv2.resize(cv2.blur(crop, (5, 5)), (256, 256),
                         interpolation=cv2.INTER_LINEAR)
        up = cv2.resize(crop, (256, 256), interpolation=cv2.INTER_LINEAR)
        ours = np.asarray(_box_blur_dynamic(jnp.asarray(up), jnp.asarray(10)))
        # compare away from borders (different edge conventions)
        a, b = ref[16:-16, 16:-16], ours[16:-16, 16:-16]
        corr = np.corrcoef(a.ravel(), b.ravel())[0, 1]
        assert corr > 0.95, corr
        assert abs(a.std() - b.std()) / a.std() < 0.15


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
