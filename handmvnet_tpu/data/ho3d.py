"""HO3D-MV dataset: shard layout, label parsing, and data module.

Replicates the reference's HO3D pipeline (src/datasets/ho3d.py):
  * shard URLs ``HO3D_mv_train-{000000..00008}.tar`` / test ``-{000000..00002}``
    with the split rules train=shards[1:-1] (or all with add_val_to_train),
    val=[first, last], test=all (ho3d.py:221-249)
  * label.pyd schema parsing: intrinsics [fx,fy,cx,cy], center/scale -> int
    xyxy bbox -> clamp to 480x640, joints/verts scaled to millimeters,
    per-view root-relative (root_idx=0), visibility -> invisibility mask
    (ho3d.py:93-129)
  * epoch sizes: train 7718 (9087 w/ val), val 1369, test 2706 (ho3d.py:275-280)

The host stage stops at raw decoded frames + labels; image preprocessing and
heatmap rendering run on device (data/pipeline.py).
"""

from __future__ import annotations

import os
from typing import Iterator

import numpy as np

from handmvnet_tpu.config import DataConfig
from handmvnet_tpu.data.webdataset import ShardDataset, brace_expand

HO3D_INPUT_RES = (480, 640)  # (h, w), reference ho3d.py:26


def parse_multiview_labels(
    labels: dict,
    root_idx: int,
    input_res: tuple[int, int],
    selected_views: tuple[int, ...] | None = None,
) -> dict:
    """label.pyd dict -> flat numpy sample fields (all views).

    Mirrors reference ho3d.py:96-129 numerically (mm scale, int bbox
    truncation, clamping)."""
    extr = np.asarray(labels["cam_extr"], dtype=np.float32)  # (v, 4, 4)
    intr_mat = np.asarray(labels["cam_intr"], dtype=np.float32)  # (v, 3, 3)
    intr = np.stack(
        [intr_mat[:, 0, 0], intr_mat[:, 1, 1], intr_mat[:, 0, 2], intr_mat[:, 1, 2]],
        axis=1,
    )

    center = np.asarray(labels["bbox_center"], dtype=np.float64)
    scale = np.asarray(labels["bbox_scale"], dtype=np.float64)
    half = scale * 0.5
    xmin = center[:, 0] - half
    ymin = center[:, 1] - half
    boxes = np.stack([xmin, ymin, xmin + scale, ymin + scale], axis=1).astype(int)
    h, w = input_res
    clamped = np.stack(
        [
            np.maximum(boxes[:, 0], 0),
            np.maximum(boxes[:, 1], 0),
            np.minimum(boxes[:, 2], w),
            np.minimum(boxes[:, 3], h),
        ],
        axis=1,
    )

    joints_img = np.asarray(labels["joints_2d"], dtype=np.float32)  # (v, 21, 2)
    # img -> crop coords (reference utils.py:124-143)
    wh = (boxes[:, 2:4] - boxes[:, 0:2]).astype(np.float32)
    joints_crop = (joints_img - boxes[:, None, 0:2]) * (256.0 / wh[:, None, :])

    joints_3d = np.asarray(labels["joints_3d"], dtype=np.float32) * 1000.0  # mm
    verts_3d = np.asarray(labels["verts_3d"], dtype=np.float32) * 1000.0
    roots = joints_3d[:, 0:1, :]
    all_joints_cam = joints_3d - roots
    all_vertices = verts_3d - roots

    vis = np.asarray(labels["joints_vis"])  # (v, 21), 1 = visible
    invisible = vis == 0

    mano_pose = np.asarray(labels["mano_pose"], dtype=np.float32)
    mano_shape = np.asarray(labels["mano_shape"], dtype=np.float32)

    sample = {
        "intrinsic": intr.astype(np.float32),
        "intrinsic_mat": intr_mat,
        "extrinsic": extr,
        "bboxes": boxes.astype(np.float32),
        "cropped_bboxes": clamped.astype(np.float32),
        "joints_img": joints_img,
        "joints_crop_img": joints_crop.astype(np.float32),
        "joints_cam": all_joints_cam[root_idx],
        "root_joint": roots[root_idx],
        "vertices": all_vertices[root_idx],
        "all_joints_cam": all_joints_cam,
        "all_root_joints": roots,
        "joints_img_mask": invisible,
        "mano_pose": mano_pose[root_idx],
        "mano_shape": mano_shape[root_idx],
        "root_idx": np.int32(root_idx),
    }
    if selected_views is not None:
        sv = np.asarray(selected_views)
        for key in (
            "intrinsic", "intrinsic_mat", "extrinsic", "bboxes", "cropped_bboxes",
            "joints_img", "joints_crop_img", "all_joints_cam", "all_root_joints",
            "joints_img_mask",
        ):
            sample[key] = sample[key][sv]
    return sample


class MultiviewTarDataset:
    """Raw-sample iterator over the reference tar format for one split."""

    name = "ho3d"
    total_views = 5
    root_idx = 0
    input_res = HO3D_INPUT_RES
    train_pattern = "HO3D_mv_train-{000000..00008}.tar"
    test_pattern = "HO3D_mv_test-{000000..00002}.tar"
    # hardcoded epoch sizes (reference ho3d.py:275-280)
    split_sizes = {"train": 7718, "train+val": 9087, "val": 1369, "test": 2706}

    def __init__(
        self,
        cfg: DataConfig,
        split: str,
        split_index: int = 0,
        split_count: int = 1,
        use_native: bool | None = None,
    ):
        assert split in ("train", "val", "test")
        self.cfg = cfg
        self.split = split
        urls = self._split_urls(split)
        self.dataset = ShardDataset(
            urls,
            preprocess=self._parse,
            shuffle_shards=split == "train",
            resample=split == "train",
            shuffle_buffer=500 if split == "train" else 0,
            split_index=split_index,
            split_count=split_count,
        )
        if use_native is None:
            from handmvnet_tpu.data.native_loader import native_available

            use_native = native_available()
        self.use_native = use_native
        if cfg.decode_scale_denom > 1 and not use_native:
            # the python reader's downscale needs opencv; fail fast here
            # instead of mid-epoch inside the producer thread (the lazy
            # import in _parse would only surface at the first sample)
            try:
                import cv2  # noqa: F401
            except ImportError as e:
                raise RuntimeError(
                    "data.decode_scale_denom > 1 with the pure-python reader "
                    "requires opencv (cv2) for the downscaled decode; build "
                    "the native loader (`make -C native`) or install "
                    "opencv-python, or set decode_scale_denom: 1"
                ) from e
        # mirror ShardDataset's split semantics: more readers than shards ->
        # sample-ordinal split over ALL shards (never duplicate data)
        self._native_sample_split = split_count > max(len(urls), 1)
        self._native_split = (split_index, split_count)
        self._native_urls = (
            urls if self._native_sample_split else urls[split_index::split_count]
        )

    def _split_urls(self, split: str) -> list[str]:
        train_urls = brace_expand(os.path.join(self.cfg.dataset_dir, self.train_pattern))
        test_urls = brace_expand(os.path.join(self.cfg.dataset_dir, self.test_pattern))
        if split == "test":
            return test_urls
        if self.cfg.add_val_to_train:
            return train_urls if split == "train" else [train_urls[0], train_urls[-1]]
        return train_urls[1:-1] if split == "train" else [train_urls[0], train_urls[-1]]

    def num_samples(self) -> int:
        # class defaults, correctable per run (DataConfig.split_size_overrides;
        # emitted by scripts/validate_dataset.py when real tars disagree with
        # the hardcoded counts — they size every epoch and the LR milestones)
        sizes = dict(self.split_sizes)
        if self.cfg.split_size_overrides:
            sizes.update(self.cfg.split_size_overrides)
        if self.split == "train" and self.cfg.add_val_to_train:
            return sizes["train+val"]
        return sizes[self.split]

    def _parse(self, raw: dict) -> dict:
        views = self.cfg.selected_views
        sample = parse_multiview_labels(
            raw["label.pyd"], self.root_idx, self.input_res, views
        )
        imgs = [raw[f"image_{i}.jpg"] for i in views]
        d = self.cfg.decode_scale_denom
        if d > 1:
            # python-reader counterpart of the native loader's DCT-domain
            # downscaled decode (INTER_AREA approximates the DCT box filter;
            # not bit-equal to libjpeg scaling, distribution-close)
            import cv2

            hw = (-(-self.input_res[0] // d), -(-self.input_res[1] // d))
            imgs = [
                cv2.resize(im, (hw[1], hw[0]), interpolation=cv2.INTER_AREA)
                for im in imgs
            ]
        sample["full_rgb"] = np.stack(imgs).astype(np.uint8)
        sample["mv_sample_id"] = os.path.join(raw["__url__"], raw["__key__"])
        return sample

    def __iter__(self) -> Iterator[dict]:
        if self.cfg.cache_decoded:
            return self._iter_cached()
        if self.use_native:
            return self._iter_native()
        return iter(self.dataset)

    # ------------------------------------------------------ decode cache --
    def _cache(self):
        # identity snapshotted once per dataset instance (first use): the
        # shard stat()s happen while the tars are guaranteed present; later
        # epochs serve purely from the cache store
        cached = getattr(self, "_cache_obj", None)
        if cached is not None:
            return cached
        from handmvnet_tpu.data.cache import DecodedCache

        def stat(u: str):
            st = os.stat(u)
            return [os.path.basename(u), st.st_size, int(st.st_mtime)]

        urls = self._split_urls(self.split)
        identity = {
            "name": self.name,
            "split": self.split,
            "views": list(self.cfg.selected_views),
            "denom": self.cfg.decode_scale_denom,
            "split_slice": list(self._native_split),
            "input_res": list(self.input_res),
            "shards": [stat(u) for u in urls],
            # at denom 1 the native and python readers are bit-identical
            # (tested) and may share a cache; at denom > 1 libjpeg's DCT
            # downscale and cv2 INTER_AREA differ, so a reader flip (e.g.
            # libtario.so disappearing) must invalidate rather than serve
            # the other reader's pixels
            "reader": (
                "any" if self.cfg.decode_scale_denom == 1
                else ("native" if self.use_native else "python")
            ),
        }
        root = self.cfg.cache_dir or os.path.join(
            self.cfg.dataset_dir, "decoded_cache"
        )
        self._cache_obj = DecodedCache(root, identity)
        return self._cache_obj

    def _iter_cached(self) -> Iterator[dict]:
        """Decode-once path (cfg.cache_decoded): first call on a cold cache
        pays ONE deterministic decode pass over this process's partition;
        every later epoch streams mmap'd frames from the page cache with a
        full-epoch shuffle for training (strictly stronger than the
        streaming readers' 500-sample reservoir)."""
        cache = self._cache()
        if not cache.complete:
            cache.build(self._decode_once())
        epoch = getattr(self, "_cache_epoch", 0)
        self._cache_epoch = epoch + 1
        return cache.iter_samples(
            shuffle=self.split == "train", seed=42, epoch=epoch
        )

    def _decode_once(self) -> Iterator[dict]:
        """One deterministic decode+parse pass over this process's samples
        (no shard shuffle, no reservoir — the cache reader owns shuffling).
        Note: for resampled training streams the cache partition is the
        NON-resampled one (each sample exactly once), which is what a
        random-access store wants."""
        if self.use_native:
            return self._iter_native(shuffle=False)
        return iter(ShardDataset(
            self._split_urls(self.split),
            preprocess=self._parse,
            shuffle_shards=False,
            resample=False,
            shuffle_buffer=0,
            split_index=self._native_split[0],
            split_count=self._native_split[1],
        ))

    def _iter_native(self, shuffle: bool = True) -> Iterator[dict]:
        """C++ thread-pool path: tar parse + libjpeg decode in native/tario.cc
        (bit-identical pixels to the python reader; see tests), with the same
        reservoir shuffle for training."""
        from handmvnet_tpu.data.native_loader import NativeShardLoader

        import zlib

        urls = list(self._native_urls)
        # stable split salt: python's hash() is randomized per process
        # (PYTHONHASHSEED), which silently broke run-to-run reproducibility
        # of the native shard/reservoir shuffle
        rng = np.random.default_rng(42 + zlib.crc32(self.split.encode()) % 10000)
        if shuffle and self.split == "train" and not self._native_sample_split:
            # sample-split mode needs an identical shard order on every
            # process for the ordinal partition to be exact
            rng.shuffle(urls)
        split_index, split_count = self._native_split
        # decode only the view range actually used (e.g. 4 of 5 HO3D views)
        needed_views = max(self.cfg.selected_views) + 1
        # pool sized to the machine: workers pull whole shards (tario.cc
        # worker_loop), so threads beyond len(urls) would idle; beyond
        # cpu_count they would thrash. Floor of 2 keeps read/decode
        # overlapped even on one core.
        import os as _os

        n_threads = max(2, min(_os.cpu_count() or 4, len(urls)))
        loader = NativeShardLoader(
            urls, num_views=needed_views, image_hw=self.input_res,
            n_threads=n_threads,
            scale_denom=self.cfg.decode_scale_denom,
        )
        try:
            buffer: list[dict] = []
            buf_size = 500 if (shuffle and self.split == "train") else 0
            for _key, imgs, labels in loader:
                if self._native_sample_split:
                    # the C++ pool emits samples in thread-completion order,
                    # so ordinal splitting is unsound here; a stable per-key
                    # rule still partitions exactly (same key -> same owner).
                    # Numeric keys (the reference writes zero-padded sample
                    # indices) split round-robin — a pure hash can starve a
                    # process outright at small sample counts, which desyncs
                    # multi-process SPMD.
                    import zlib

                    base = _key.rsplit("/", 1)[-1]
                    owner = (
                        int(base) if base.isdigit() else zlib.crc32(_key.encode())
                    ) % split_count
                    if owner != split_index:
                        continue
                views = self.cfg.selected_views
                sample = parse_multiview_labels(
                    labels, self.root_idx, self.input_res, views
                )
                sample["full_rgb"] = imgs[list(views)]
                sample["mv_sample_id"] = _key
                if buf_size > 1:
                    buffer.append(sample)
                    if len(buffer) >= buf_size:
                        idx = int(rng.integers(len(buffer)))
                        buffer[idx], buffer[-1] = buffer[-1], buffer[idx]
                        yield buffer.pop()
                else:
                    yield sample
            while buffer:
                idx = int(rng.integers(len(buffer)))
                buffer[idx], buffer[-1] = buffer[-1], buffer[idx]
                yield buffer.pop()
        finally:
            loader.close()
            n_dropped = loader.dropped_samples()
            if n_dropped:
                import sys

                print(
                    f"[tario] {self.name}/{self.split}: {n_dropped} samples "
                    "dropped (incomplete groups, malformed JPEGs, or frames "
                    f"not exactly {self.input_res} at the source)",
                    file=sys.stderr,
                )


class HO3DDataset(MultiviewTarDataset):
    pass
