"""Decode-once cache (data/cache.py + data.cache_decoded): the first pass
persists decoded frames + labels; later epochs serve bit-identical samples
from the mmap store without touching libjpeg, with a full-epoch shuffle for
training and automatic invalidation when the shards change."""

import os
import time

import numpy as np
import pytest

from handmvnet_tpu.config import DataConfig
from handmvnet_tpu.data.ho3d import HO3DDataset
from handmvnet_tpu.data.loader import BatchLoader
from handmvnet_tpu.data.synthetic import write_synthetic_ho3d_shards


@pytest.fixture(scope="module")
def shard_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("ho3d_cache")
    write_synthetic_ho3d_shards(d, num_shards=3, samples_per_shard=4, split="train")
    write_synthetic_ho3d_shards(d, num_shards=3, samples_per_shard=4, split="test")
    return d


class TinyHO3D(HO3DDataset):
    train_pattern = "HO3D_mv_train-{000000..000002}.tar"
    test_pattern = "HO3D_mv_test-{000000..000002}.tar"
    split_sizes = {"train": 4, "train+val": 12, "val": 8, "test": 12}


def _by_id(ds):
    return {s["mv_sample_id"].rsplit("/", 1)[-1]: s for s in ds}


class TestDecodeCache:
    def test_cached_matches_direct_bitwise(self, shard_dir, tmp_path):
        base = DataConfig(dataset_dir=str(shard_dir), add_val_to_train=False)
        cached_cfg = DataConfig(
            dataset_dir=str(shard_dir), add_val_to_train=False,
            cache_decoded=True, cache_dir=str(tmp_path / "cache"),
        )
        direct = _by_id(TinyHO3D(base, "test"))
        cached = _by_id(TinyHO3D(cached_cfg, "test"))
        assert set(direct) == set(cached) and len(direct) == 12
        for key, ref in direct.items():
            got = cached[key]
            assert set(got) == set(ref)
            np.testing.assert_array_equal(got["full_rgb"], ref["full_rgb"])
            for field in ("intrinsic", "joints_cam", "joints_crop_img",
                          "joints_img_mask", "bboxes", "vertices"):
                np.testing.assert_array_equal(got[field], ref[field])

    def test_second_epoch_serves_without_tars(self, shard_dir, tmp_path):
        """After the build pass, the tars can disappear entirely — the cache
        is the steady state (identity was snapshotted at construction)."""
        import shutil

        work = tmp_path / "data"
        shutil.copytree(shard_dir, work)
        cfg = DataConfig(
            dataset_dir=str(work), add_val_to_train=False,
            cache_decoded=True, cache_dir=str(tmp_path / "cache"),
        )
        ds = TinyHO3D(cfg, "test")
        first = sorted(s["mv_sample_id"] for s in ds)
        for tar in work.glob("*.tar"):
            tar.unlink()
        second = sorted(s["mv_sample_id"] for s in ds)
        assert first == second and len(first) == 12

    def test_train_epochs_shuffle_but_same_multiset(self, shard_dir, tmp_path):
        cfg = DataConfig(
            dataset_dir=str(shard_dir), add_val_to_train=True,
            cache_decoded=True, cache_dir=str(tmp_path / "cache"),
        )
        ds = TinyHO3D(cfg, "train")
        e0 = [s["mv_sample_id"] for s in ds]
        e1 = [s["mv_sample_id"] for s in ds]
        assert sorted(e0) == sorted(e1) and len(e0) == 12
        assert e0 != e1  # full-epoch shuffle advances per epoch

    def test_invalidated_by_shard_change(self, shard_dir, tmp_path):
        import shutil

        work = tmp_path / "data"
        shutil.copytree(shard_dir, work)
        cfg = DataConfig(
            dataset_dir=str(work), add_val_to_train=False,
            cache_decoded=True, cache_dir=str(tmp_path / "cache"),
        )
        c1 = TinyHO3D(cfg, "test")._cache()
        tar = sorted(work.glob("HO3D_mv_test-*.tar"))[0]
        os.utime(tar, (time.time() + 100, time.time() + 100))
        c2 = TinyHO3D(cfg, "test")._cache()
        assert c1.dir != c2.dir  # mtime is part of the identity

    def test_incomplete_build_is_rebuilt(self, shard_dir, tmp_path):
        cfg = DataConfig(
            dataset_dir=str(shard_dir), add_val_to_train=False,
            cache_decoded=True, cache_dir=str(tmp_path / "cache"),
        )
        ds = TinyHO3D(cfg, "test")
        cache = ds._cache()
        # simulate a crash mid-build: frames written, no meta.json
        cache.dir.mkdir(parents=True)
        (cache.dir / "frames.u8").write_bytes(b"garbage")
        assert not cache.complete
        samples = list(ds)
        assert len(samples) == 12
        assert ds._cache().complete

    def test_through_batchloader(self, shard_dir, tmp_path):
        cfg = DataConfig(
            dataset_dir=str(shard_dir), batch_size=4, add_val_to_train=False,
            cache_decoded=True, cache_dir=str(tmp_path / "cache"),
        )
        ds = TinyHO3D(cfg, "test")
        loader = BatchLoader(ds, batch_size=4, steps_per_epoch=3)
        batches = list(loader)
        assert len(batches) == 3
        assert batches[0]["full_rgb"].shape == (4, 5, 480, 640, 3)
        assert batches[0]["joints_cam"].shape == (4, 21, 3)

    def test_multiprocess_partition_disjoint(self, shard_dir, tmp_path):
        cfg = DataConfig(
            dataset_dir=str(shard_dir), add_val_to_train=False,
            cache_decoded=True, cache_dir=str(tmp_path / "cache"),
        )
        parts = [
            {s["mv_sample_id"] for s in
             TinyHO3D(cfg, "test", split_index=i, split_count=2)}
            for i in range(2)
        ]
        assert parts[0] and parts[1]
        assert not parts[0] & parts[1]
        assert len(parts[0] | parts[1]) == 12
