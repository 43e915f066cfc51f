"""Native C++ tar/JPEG loader vs the pure-Python reader: same samples, same
decoded pixels (both use libjpeg underneath, so decode is bit-identical)."""

import subprocess
from pathlib import Path

import numpy as np
import pytest

from handmvnet_tpu.data.synthetic import write_synthetic_ho3d_shards
from handmvnet_tpu.data.webdataset import iter_tar_samples

NATIVE_DIR = Path(__file__).resolve().parents[1] / "native"


@pytest.fixture(scope="module")
def built_lib():
    if not (NATIVE_DIR / "libtario.so").exists():
        subprocess.run(["make", "-C", str(NATIVE_DIR)], check=True)
    from handmvnet_tpu.data import native_loader

    assert native_loader.native_available()
    return native_loader


@pytest.fixture(scope="module")
def shards(tmp_path_factory):
    d = tmp_path_factory.mktemp("native_shards")
    return write_synthetic_ho3d_shards(d, num_shards=2, samples_per_shard=3)


class TestNativeLoader:
    def test_matches_python_reader(self, built_lib, shards):
        loader = built_lib.NativeShardLoader(shards, num_views=5, n_threads=2)
        native = {key: (imgs, labels) for key, imgs, labels in loader}
        loader.close()

        count = 0
        for shard in shards:
            for sample in iter_tar_samples(shard):
                count += 1
                key = sample["__key__"]
                assert key in native
                imgs, labels = native[key]
                assert imgs.shape == (5, 480, 640, 3)
                # identical libjpeg decode
                np.testing.assert_array_equal(imgs[0], sample["image_0.jpg"])
                np.testing.assert_array_equal(imgs[4], sample["image_4.jpg"])
                np.testing.assert_allclose(
                    np.asarray(labels["joints_2d"]),
                    np.asarray(sample["label.pyd"]["joints_2d"]),
                )
        assert len(native) == count == 6

    def test_throughput_nonzero(self, built_lib, shards):
        import time

        t0 = time.perf_counter()
        loader = built_lib.NativeShardLoader(shards, num_views=5, n_threads=4)
        n = sum(1 for _ in loader)
        loader.close()
        dt = time.perf_counter() - t0
        assert n == 6
        assert dt < 30.0


class TestNativeSampleSplit:
    def test_oversubscribed_readers_partition_samples(self, built_lib, shards, tmp_path):
        """3 dataset readers over 2 shards on the NATIVE path must partition
        the samples exactly (key-hash ownership; emission order from the C++
        pool is nondeterministic so ordinals can't be used)."""
        import dataclasses

        from handmvnet_tpu.config import Config
        from handmvnet_tpu.data.ho3d import HO3DDataset

        class TinyHO3D(HO3DDataset):
            train_pattern = "HO3D_mv_train-{000000..000001}.tar"
            test_pattern = "HO3D_mv_train-{000000..000001}.tar"
            split_sizes = {"train": 6, "train+val": 6, "val": 6, "test": 6}

        cfg = Config.from_yaml("configs/release/HO3D_HandMvNet.yaml")
        cfg = cfg.replace(
            data=dataclasses.replace(
                cfg.data, dataset_dir=str(Path(shards[0]).parent)
            )
        )
        parts = []
        for i in range(3):
            ds = TinyHO3D(cfg.data, "test", split_index=i, split_count=3,
                          use_native=True)
            parts.append({s["mv_sample_id"] for s in ds})
        full = {s["mv_sample_id"] for s in
                TinyHO3D(cfg.data, "test", use_native=True)}
        assert set().union(*parts) == full
        assert sum(len(p) for p in parts) == len(full)  # no duplicates


class TestMalformedShards:
    def test_duplicate_view_entry_does_not_emit_stale_pixels(
        self, built_lib, shards, tmp_path
    ):
        """A sample whose tar carries image_0 twice but no image_1 must be
        DROPPED — before the per-view fill tracking, the decode counter
        reached num_views and the sample was emitted with the previous
        sample's pixels in the missing view."""
        import io
        import tarfile

        src = shards[0]
        bad = tmp_path / "bad.tar"
        with tarfile.open(src) as tin, tarfile.open(bad, "w") as tout:
            target = None
            for m in tin.getmembers():
                data = tin.extractfile(m).read()
                base = m.name.rsplit("/", 1)[-1]
                key = base.split(".")[0]
                if target is None and base.endswith("image_1.jpg"):
                    target = key
                if key == target and base.endswith("image_1.jpg"):
                    # replace image_1 with a second copy of image_0
                    m.name = m.name.replace("image_1.jpg", "image_0.jpg")
                tout.addfile(m, io.BytesIO(data))
        assert target is not None

        loader = built_lib.NativeShardLoader([str(bad)], num_views=5, n_threads=1)
        keys = [key for key, _, _ in loader]
        loader.close()
        assert target not in keys  # incomplete sample dropped
        assert len(keys) == 2  # the other samples still come through


@pytest.fixture(scope="module")
def smooth_shards(tmp_path_factory):
    # consistent-geometry frames (dark background + drawn skeleton) are
    # JPEG-friendly; the default noise shards aren't meaningful for a
    # downscale-fidelity comparison (JPEG already destroys the noise)
    d = tmp_path_factory.mktemp("native_shards_smooth")
    return write_synthetic_ho3d_shards(
        d, num_shards=2, samples_per_shard=3, consistent_geometry=True
    )


class TestScaledDecode:
    def test_half_decode_matches_area_downscale(self, built_lib, smooth_shards):
        """scale_denom=2 must emit 240x320 frames whose content matches an
        INTER_AREA downscale of the full decode (libjpeg's DCT-domain scaling
        is a DCT box filter — distribution-close, not bit-equal)."""
        import cv2

        shards = smooth_shards
        full = built_lib.NativeShardLoader(shards, num_views=5, n_threads=2)
        full_imgs = {key: imgs for key, imgs, _ in full}
        full.close()

        half = built_lib.NativeShardLoader(
            shards, num_views=5, n_threads=2, scale_denom=2
        )
        count = 0
        for key, imgs, _labels in half:
            assert imgs.shape == (5, 240, 320, 3), imgs.shape
            ref = np.stack([
                cv2.resize(im, (320, 240), interpolation=cv2.INTER_AREA)
                for im in full_imgs[key]
            ])
            diff = np.abs(imgs.astype(np.int16) - ref.astype(np.int16))
            assert diff.mean() < 6.0, diff.mean()  # intensity levels
            count += 1
        half.close()
        assert count == len(full_imgs)

    def test_dataset_end_to_end_halved(self, built_lib, shards, tmp_path):
        """decode_scale_denom=2 through HO3DDataset: native and python
        readers both emit half-res frames; labels stay in source coords."""
        from handmvnet_tpu.config import DataConfig
        from handmvnet_tpu.data.ho3d import HO3DDataset

        cfg = DataConfig(
            name="ho3d", dataset_dir=str(Path(shards[0]).parent),
            num_workers=0, augment=False, decode_scale_denom=2,
            selected_views=(0, 1, 2, 3, 4),
        )

        class TinyHO3D(HO3DDataset):
            train_pattern = "HO3D_mv_train-{000000..000001}.tar"
            test_pattern = train_pattern
            split_sizes = {"train": 6, "train+val": 6, "val": 6, "test": 6}

        for use_native in (True, False):
            ds = TinyHO3D(cfg, "test", use_native=use_native)
            sample = next(iter(ds))
            assert sample["full_rgb"].shape[1:] == (240, 320, 3), (
                use_native, sample["full_rgb"].shape)
            # labels untouched: bboxes still span source (480x640) coords
            assert sample["bboxes"].max() > 320
