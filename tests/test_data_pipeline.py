"""Data pipeline tests: tar format round-trip, shard split rules, label
parsing parity with the reference preprocessor semantics, on-device
preprocessing vs the reference CPU chain."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from handmvnet_tpu.config import DataConfig
from handmvnet_tpu.data.ho3d import HO3DDataset, parse_multiview_labels
from handmvnet_tpu.data.loader import BatchLoader, collate
from handmvnet_tpu.data.pipeline import preprocess_views
from handmvnet_tpu.data.synthetic import write_synthetic_ho3d_shards
from handmvnet_tpu.data.webdataset import (
    ShardDataset,
    brace_expand,
    iter_tar_samples,
)


@pytest.fixture(scope="module")
def shard_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("ho3d")
    write_synthetic_ho3d_shards(d, num_shards=3, samples_per_shard=4, split="train")
    write_synthetic_ho3d_shards(d, num_shards=3, samples_per_shard=4, split="test")
    # rename test shards to the reference's test range (000000..000002 exists)
    return d


class TestBraceExpand:
    def test_reference_patterns(self):
        urls = brace_expand("data/HO3D_mv_train-{000000..000008}.tar")
        assert len(urls) == 9
        assert urls[0].endswith("train-000000.tar")
        assert urls[-1].endswith("train-000008.tar")
        assert brace_expand("plain.tar") == ["plain.tar"]


class TestTarRoundTrip:
    def test_sample_schema(self, shard_dir):
        shard = sorted(shard_dir.glob("HO3D_mv_train-*.tar"))[0]
        samples = list(iter_tar_samples(shard))
        assert len(samples) == 4
        s = samples[0]
        assert {"label.pyd", "image_0.jpg", "image_4.jpg"} <= set(s.keys())
        assert s["image_0.jpg"].shape == (480, 640, 3)
        assert s["image_0.jpg"].dtype == np.uint8
        assert s["label.pyd"]["joints_2d"][0].shape == (21, 2)

    def test_shard_dataset_split(self, shard_dir):
        urls = sorted(str(p) for p in shard_dir.glob("HO3D_mv_train-*.tar"))
        full = list(ShardDataset(urls))
        assert len(full) == 12
        part0 = list(ShardDataset(urls, split_index=0, split_count=3))
        part1 = list(ShardDataset(urls, split_index=1, split_count=3))
        assert len(part0) == len(part1) == 4
        keys0 = {s["__key__"] for s in part0}
        keys1 = {s["__key__"] for s in part1}
        assert not keys0 & keys1

    def test_more_processes_than_shards_partitions_samples(self, shard_dir):
        """3 'processes' over 2 shards must PARTITION the samples (the old
        fallback gave every process all shards, double-counting eval data)."""
        urls = sorted(str(p) for p in shard_dir.glob("HO3D_mv_train-*.tar"))[:2]
        full = [s["__key__"] for s in ShardDataset(urls)]
        parts = [
            [s["__key__"] for s in ShardDataset(urls, split_index=i, split_count=3)]
            for i in range(3)
        ]
        union = [k for p in parts for k in p]
        assert sorted(union) == sorted(full)  # exact cover, no duplicates
        sizes = sorted(len(p) for p in parts)
        assert sizes[-1] - sizes[0] <= 1  # balanced within one sample

    def test_sample_split_aggregate_metric_matches_single_process(self, shard_dir):
        """Count-weighted mean over the per-process partitions equals the
        single-process value (the multi-host eval aggregation contract)."""
        urls = sorted(str(p) for p in shard_dir.glob("HO3D_mv_train-*.tar"))[:2]

        def score(s):  # any per-sample scalar stands in for MPJPE
            return float(np.mean(s["label.pyd"]["joints_2d"]))

        single = np.mean([score(s) for s in ShardDataset(urls)])
        per_proc = [
            [score(s) for s in ShardDataset(urls, split_index=i, split_count=3)]
            for i in range(3)
        ]
        weighted = sum(sum(p) for p in per_proc) / sum(len(p) for p in per_proc)
        np.testing.assert_allclose(weighted, single, rtol=1e-6)

    def test_resample_mode_tolerates_oversubscription(self, shard_dir):
        """Training (resample=True) keeps the all-shards fallback: stochastic
        with-replacement reads are fine for oversubscribed readers."""
        urls = sorted(str(p) for p in shard_dir.glob("HO3D_mv_train-*.tar"))[:2]
        ds = ShardDataset(urls, split_index=2, split_count=3, resample=True)
        assert len(list(ds)) > 0

    def test_shuffle_buffer_preserves_multiset(self, shard_dir):
        urls = sorted(str(p) for p in shard_dir.glob("HO3D_mv_train-*.tar"))
        plain = [s["__key__"] for s in ShardDataset(urls)]
        shuffled = [s["__key__"] for s in ShardDataset(urls, shuffle_buffer=5)]
        assert sorted(plain) == sorted(shuffled)
        assert plain != shuffled  # overwhelmingly likely with 12 samples


class TestLabelParsing:
    def test_matches_reference_semantics(self, shard_dir):
        shard = sorted(shard_dir.glob("HO3D_mv_train-*.tar"))[0]
        raw = next(iter_tar_samples(shard))
        labels = raw["label.pyd"]
        out = parse_multiview_labels(labels, root_idx=0, input_res=(480, 640))

        # intrinsics vector layout
        K = np.asarray(labels["cam_intr"][1])
        np.testing.assert_allclose(out["intrinsic"][1], [K[0, 0], K[1, 1], K[0, 2], K[1, 2]])

        # bbox: center/scale -> int xyxy (truncation), clamped variant in bounds
        c = np.asarray(labels["bbox_center"][0])
        s = labels["bbox_scale"][0]
        assert out["bboxes"][0][0] == int(c[0] - s / 2)
        cb = out["cropped_bboxes"]
        assert (cb[:, 0] >= 0).all() and (cb[:, 2] <= 640).all()
        assert (cb[:, 1] >= 0).all() and (cb[:, 3] <= 480).all()

        # mm scaling + root-relative
        j3d = np.asarray(labels["joints_3d"]) * 1000.0
        np.testing.assert_allclose(out["joints_cam"], j3d[0] - j3d[0, 0:1], atol=1e-3)
        np.testing.assert_allclose(out["root_joint"], j3d[0, 0:1], atol=1e-3)

        # crop-space joints formula (reference utils.py:124-143)
        b0 = out["bboxes"][0]
        expect = (np.asarray(labels["joints_2d"][0]) - b0[:2]) * (
            256.0 / (b0[2:4] - b0[0:2])
        )
        np.testing.assert_allclose(out["joints_crop_img"][0], expect, atol=1e-3)

    def test_view_selection(self, shard_dir):
        shard = sorted(shard_dir.glob("HO3D_mv_train-*.tar"))[0]
        raw = next(iter_tar_samples(shard))
        out = parse_multiview_labels(raw["label.pyd"], 0, (480, 640), selected_views=(0, 2))
        assert out["intrinsic"].shape == (2, 4)
        assert out["joints_crop_img"].shape == (2, 21, 2)


class TestHO3DDataset:
    def test_split_rules(self, shard_dir):
        cfg = DataConfig(dataset_dir=str(shard_dir), add_val_to_train=False)
        # patch the pattern to the 3 shards we wrote
        class DS(HO3DDataset):
            train_pattern = "HO3D_mv_train-{000000..000002}.tar"
            test_pattern = "HO3D_mv_test-{000000..000002}.tar"

        train = DS(cfg, "train")
        val = DS(cfg, "val")
        test = DS(cfg, "test")
        assert len(train.dataset.urls) == 1  # shards[1:-1]
        assert len(val.dataset.urls) == 2  # [first, last]
        assert len(test.dataset.urls) == 3

        cfg2 = DataConfig(dataset_dir=str(shard_dir), add_val_to_train=True)
        assert len(DS(cfg2, "train").dataset.urls) == 3
        assert DS(cfg2, "train").num_samples() == 9087

    def test_iterates_full_samples(self, shard_dir):
        cfg = DataConfig(dataset_dir=str(shard_dir), add_val_to_train=True)

        class DS(HO3DDataset):
            train_pattern = "HO3D_mv_train-{000000..000002}.tar"
            test_pattern = "HO3D_mv_test-{000000..000002}.tar"

        ds = DS(cfg, "test")
        sample = next(iter(ds))
        assert sample["full_rgb"].shape == (5, 480, 640, 3)
        assert sample["joints_cam"].shape == (21, 3)
        assert sample["vertices"].shape == (778, 3)


class TestDevicePreprocess:
    def test_matches_reference_cpu_chain(self, shard_dir):
        """device preprocess == crop_and_pad + antialias resize + normalize
        (already proven op-level in test_ops; here end-to-end on a real
        decoded sample) and heatmaps match the render+resize chain."""
        import torch
        import torch.nn.functional as F

        cfg = DataConfig(dataset_dir=str(shard_dir))

        class DS(HO3DDataset):
            train_pattern = "HO3D_mv_train-{000000..000002}.tar"
            test_pattern = "HO3D_mv_test-{000000..000002}.tar"

        sample = next(iter(DS(cfg, "test")))
        batch = collate([sample])
        rgb, hm = preprocess_views(
            jnp.asarray(batch["full_rgb"]),
            jnp.asarray(batch["bboxes"]),
            jnp.asarray(batch["joints_crop_img"]),
            jnp.asarray(~np.all(batch["joints_img_mask"], axis=-1)),
        )
        assert rgb.shape == (1, 5, 256, 256, 3)
        assert hm.shape == (1, 5, 21, 32, 32)

        # oracle for view 0
        img = batch["full_rgb"][0, 0]
        x1, y1, x2, y2 = batch["bboxes"][0, 0].astype(int)
        canvas = np.zeros((y2 - y1, x2 - x1, 3), dtype=np.uint8)
        sx, sy = max(0, x1), max(0, y1)
        ex, ey = min(640, x2), min(480, y2)
        canvas[sy - y1:ey - y1, sx - x1:ex - x1] = img[sy:ey, sx:ex]
        t = torch.from_numpy(canvas.transpose(2, 0, 1)).float() / 255.0
        t = F.interpolate(t[None], size=(256, 256), mode="bilinear", antialias=True)[0]
        mean = torch.tensor([0.485, 0.456, 0.406])[:, None, None]
        std = torch.tensor([0.229, 0.224, 0.225])[:, None, None]
        oracle = ((t - mean) / std).numpy().transpose(1, 2, 0)
        np.testing.assert_allclose(np.asarray(rgb[0, 0]), oracle, atol=2e-4)

    def test_black_image_rule(self, shard_dir):
        cfg = DataConfig(dataset_dir=str(shard_dir))

        class DS(HO3DDataset):
            train_pattern = "HO3D_mv_train-{000000..000002}.tar"
            test_pattern = "HO3D_mv_test-{000000..000002}.tar"

        sample = next(iter(DS(cfg, "test")))
        batch = collate([sample])
        visible = np.ones((1, 5), dtype=bool)
        visible[0, 2] = False  # view 2 fully invisible
        rgb, _ = preprocess_views(
            jnp.asarray(batch["full_rgb"]),
            jnp.asarray(batch["bboxes"]),
            jnp.asarray(batch["joints_crop_img"]),
            jnp.asarray(visible),
        )
        # black image -> constant normalized value (0 - mean) / std
        expect = (0.0 - np.array([0.485, 0.456, 0.406])) / np.array([0.229, 0.224, 0.225])
        got = np.asarray(rgb[0, 2])
        np.testing.assert_allclose(got, np.broadcast_to(expect, got.shape), atol=1e-5)

    def test_augmentation_changes_images_deterministically(self, shard_dir):
        cfg = DataConfig(dataset_dir=str(shard_dir))

        class DS(HO3DDataset):
            train_pattern = "HO3D_mv_train-{000000..000002}.tar"
            test_pattern = "HO3D_mv_test-{000000..000002}.tar"

        sample = next(iter(DS(cfg, "test")))
        batch = collate([sample])
        args = (
            jnp.asarray(batch["full_rgb"]),
            jnp.asarray(batch["bboxes"]),
            jnp.asarray(batch["joints_crop_img"]),
            jnp.asarray(~np.all(batch["joints_img_mask"], axis=-1)),
        )
        rgb_a, _ = preprocess_views(*args, jax.random.PRNGKey(0), augment=True)
        rgb_a2, _ = preprocess_views(*args, jax.random.PRNGKey(0), augment=True)
        rgb_b, _ = preprocess_views(*args, jax.random.PRNGKey(1), augment=True)
        rgb_plain, _ = preprocess_views(*args)
        np.testing.assert_array_equal(np.asarray(rgb_a), np.asarray(rgb_a2))
        assert np.abs(np.asarray(rgb_a) - np.asarray(rgb_b)).max() > 1e-4
        assert np.abs(np.asarray(rgb_a) - np.asarray(rgb_plain)).max() > 1e-4
        assert np.isfinite(np.asarray(rgb_a)).all()


class TestBatchLoader:
    def test_epoch_length_and_shapes(self, shard_dir):
        cfg = DataConfig(dataset_dir=str(shard_dir), batch_size=2)

        class DS(HO3DDataset):
            train_pattern = "HO3D_mv_train-{000000..000002}.tar"
            test_pattern = "HO3D_mv_test-{000000..000002}.tar"

        ds = DS(cfg, "test")
        loader = BatchLoader(ds, batch_size=2, steps_per_epoch=3)
        batches = list(loader)
        assert len(batches) == 3
        assert batches[0]["full_rgb"].shape == (2, 5, 480, 640, 3)
        assert batches[0]["joints_cam"].shape == (2, 21, 3)


class TestBatchLoaderLifecycle:
    def _loader(self, shard_dir, device_prepare=None, steps=3):
        cfg = DataConfig(dataset_dir=str(shard_dir), batch_size=2)

        class DS(HO3DDataset):
            train_pattern = "HO3D_mv_train-{000000..000002}.tar"
            test_pattern = "HO3D_mv_test-{000000..000002}.tar"

        return BatchLoader(DS(cfg, "test"), batch_size=2, steps_per_epoch=steps,
                           device_prepare=device_prepare)

    def test_early_exit_then_reiterate(self, shard_dir):
        """Taking one batch and abandoning the epoch (the vis-loader usage)
        must wind the producer down so a later full iteration works instead
        of racing a thread still holding the sample generator."""
        loader = self._loader(shard_dir)
        first = next(iter(loader))  # generator closed mid-epoch on return
        assert first["joints_cam"].shape == (2, 21, 3)
        for _ in range(2):
            batches = list(loader)
            assert len(batches) == 3

    def test_dead_after_pipeline_error(self, shard_dir):
        """A device_prepare failure must surface in the consumer AND mark
        the loader dead — re-iterating a loader whose producer's position is
        undefined would yield silently wrong epochs."""
        import pytest

        def boom(batch):
            raise ValueError("prepare exploded")

        loader = self._loader(shard_dir, device_prepare=boom)
        with pytest.raises(ValueError, match="prepare exploded"):
            list(loader)
        with pytest.raises(RuntimeError, match="dead"):
            next(iter(loader))


class TestDevicePrefetch:
    def test_prefetch_stage_yields_identical_batches(self, shard_dir):
        """The double-buffered device-prefetch stage must be a pure
        pipelining change: same batches, same order, same count as the
        inline device_prepare path."""
        import jax.numpy as jnp

        from handmvnet_tpu.data.loader import BatchLoader
        from handmvnet_tpu.data.webdataset import ShardDataset

        urls = sorted(str(p) for p in shard_dir.glob("HO3D_mv_train*.tar"))

        def parse(s):
            return {"joints_cam": np.full((21, 3), float(int(s["__key__"])), np.float32)}

        def prepare(batch):
            return {"x": jnp.asarray(batch["joints_cam"])[:, 0, 0] * 2}

        def run(device_prefetch):
            loader = BatchLoader(
                ShardDataset(urls, preprocess=parse), batch_size=2,
                steps_per_epoch=3, device_prepare=prepare,
                device_prefetch=device_prefetch,
            )
            return [b["x"].tolist() for b in loader]

        out = run(False)
        assert out == run(True)
        assert len(out) == 3


class TestDecodeScaleDenom:
    def test_prepare_path_crops_match_full_res(self, tmp_path):
        """decode_scale_denom=2 end to end (dataset -> BatchLoader ->
        make_device_prepare): crops cut the SAME region from the half-res
        frames (close to the full-res crops on smooth content), GT heatmaps
        are bit-identical (labels untouched), and the model-facing bboxes
        stay in source coordinates."""
        import dataclasses

        import handmvnet_tpu.train as train_mod
        from handmvnet_tpu.config import Config
        from handmvnet_tpu.data.ho3d import HO3DDataset
        from handmvnet_tpu.data.loader import BatchLoader
        from handmvnet_tpu.data.synthetic import write_synthetic_ho3d_shards

        write_synthetic_ho3d_shards(
            tmp_path, num_shards=2, samples_per_shard=2, num_views=2,
            split="train", consistent_geometry=True,
        )

        class TinyHO3D(HO3DDataset):
            train_pattern = "HO3D_mv_train-{000000..000001}.tar"
            test_pattern = train_pattern
            split_sizes = {"train": 4, "train+val": 4, "val": 4, "test": 4}

        def batch_for(denom: int):
            cfg = Config.from_dict({
                "data": {"name": "ho3d", "batch_size": 2,
                         "dataset_dir": str(tmp_path), "augment": False,
                         "decode_scale_denom": denom},
                "model": {"selected_views": [0, 1],
                          "backbone_pretrained": False},
                "train": {},
            })
            ds = TinyHO3D(cfg.data, "test", use_native=False)
            loader = BatchLoader(
                ds, batch_size=2, steps_per_epoch=1,
                device_prepare=train_mod.make_device_prepare(cfg, False),
                device_prefetch=False,
            )
            return next(iter(loader))

        full = batch_for(1)
        half = batch_for(2)
        import numpy as np

        assert half["rgb"].shape == full["rgb"].shape  # both 256^2 crops
        diff = np.abs(np.asarray(half["rgb"]) - np.asarray(full["rgb"]))
        # normalized units (1 intensity level ~ 0.018). Halving resolution
        # blurs the drawn skeleton edges (~0.14 measured); a mis-cropped
        # region (the failure this guards) measures ~1.0+
        assert diff.mean() < 0.3, diff.mean()
        np.testing.assert_array_equal(
            np.asarray(half["heatmap"]), np.asarray(full["heatmap"])
        )
        np.testing.assert_array_equal(
            np.asarray(half["bboxes"]), np.asarray(full["bboxes"])
        )
