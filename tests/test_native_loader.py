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
