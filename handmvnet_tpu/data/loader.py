"""Batched device-feeding loader.

Replaces the reference's wds.WebLoader + worker processes + pin_memory
(reference ho3d.py:285-311) with: host threads that decode/collate numpy
batches -> a bounded prefetch queue -> on-device jitted preprocessing
(data/pipeline.py) overlapped with the train step. Multi-host: shard the
tar list by jax.process_index() (split_index/split_count on the dataset).

``with_epoch`` semantics (fixed steps per epoch over a resampled stream,
ho3d.py:290) are preserved via steps_per_epoch.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator

import numpy as np

_COLLATE_KEYS = (
    "full_rgb", "intrinsic", "extrinsic", "bboxes", "cropped_bboxes",
    "joints_img", "joints_crop_img", "joints_cam", "root_joint", "vertices",
    "all_joints_cam", "all_root_joints", "joints_img_mask",
    "mano_pose", "mano_shape",
)


def collate(samples: list[dict]) -> dict:
    batch = {}
    for key in _COLLATE_KEYS:
        if key in samples[0]:
            batch[key] = np.stack([s[key] for s in samples])
    batch["root_idx"] = np.asarray([s.get("root_idx", 0) for s in samples])
    batch["mv_sample_id"] = [s.get("mv_sample_id", "") for s in samples]
    return batch


class BatchLoader:
    """Iterates fixed-size collated batches with background prefetch.

    Args:
      dataset: iterable of parsed samples (e.g. HO3DDataset).
      batch_size: per-host batch size.
      steps_per_epoch: batches per epoch (reference with_epoch semantics).
      device_prepare: optional callable(batch) -> batch run on the consumer
        thread (the jitted on-device preprocess).
      shuffle_batches: post-batch shuffle window (reference .shuffle(2*bs)
        shuffles the sample stream again after batching; approximated by
        buffered batch shuffling).
    """

    def __init__(
        self,
        dataset: Iterable[dict],
        batch_size: int,
        steps_per_epoch: int,
        device_prepare: Callable[[dict], dict] | None = None,
        prefetch: int = 2,
        seed: int = 42,
        device_prefetch: bool = True,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.steps_per_epoch = steps_per_epoch
        self.device_prepare = device_prepare
        self.prefetch = prefetch
        self.seed = seed
        self.device_prefetch = device_prefetch
        self._iter: Iterator[dict] | None = None
        self._failed = False
        # single-consumer guard: two concurrently-driven epoch iterators
        # would race on the shared self._iter generator ("generator already
        # executing"); released in the inner generator's finally
        self._iterating = threading.Lock()

    def _sample_stream(self) -> Iterator[dict]:
        while True:  # resample forever; epoch length is steps_per_epoch
            count = 0
            for sample in self.dataset:
                count += 1
                yield sample
            if count == 0:
                raise RuntimeError(
                    "dataset yielded zero samples in a full pass — check shard "
                    "paths/patterns and the view count of the tar samples"
                )

    def __iter__(self) -> Iterator[dict]:
        # NON-generator __iter__: the dead-loader check and the
        # single-consumer guard must run at iter() time, not be deferred to
        # the first next() like a generator function's body would be
        # (creating an iterator on a dead loader would otherwise appear to
        # succeed)
        if self._failed:
            raise RuntimeError(
                "BatchLoader is dead after a previous pipeline error — "
                "create a fresh BatchLoader"
            )
        if not self._iterating.acquire(blocking=False):
            raise RuntimeError(
                "BatchLoader is single-consumer: a previous epoch iterator "
                "is still active (exhaust or close() it first)"
            )
        try:
            if self._iter is None:
                self._iter = self._sample_stream()
            return _EpochIterator(self)
        except BaseException:
            self._iterating.release()
            raise

    def __len__(self) -> int:
        return self.steps_per_epoch


class _EpochIterator:
    """One epoch over a BatchLoader: owns the producer/preparer threads.

    A real class (not a generator) so the pipeline starts at iter() time and
    cleanup — thread wind-down + releasing the loader's single-consumer
    lock — is deterministic via close()/__del__ even if the iterator is
    abandoned before the first next()."""

    def __init__(self, loader: "BatchLoader"):
        self.loader = loader
        self._closed = False
        q: queue.Queue = queue.Queue(maxsize=loader.prefetch)
        self._stop = stop = object()
        # set when the consumer stops early (exception surfaced or close()
        # mid-stream); producer/preparer poll it so they never stay blocked
        # on a full queue holding loader._iter
        self._cancelled = cancelled = threading.Event()

        def cancellable_put(dst: queue.Queue, item) -> bool:
            while not cancelled.is_set():
                try:
                    dst.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                for _ in range(loader.steps_per_epoch):
                    if cancelled.is_set():
                        return
                    samples = [
                        next(loader._iter) for _ in range(loader.batch_size)
                    ]
                    if not cancellable_put(q, collate(samples)):
                        return
            except StopIteration:
                pass
            except BaseException as e:  # pragma: no cover - re-raised below
                # surface data-pipeline failures in the consumer: a dead
                # producer thread must not read as a clean empty epoch (in
                # multi-process SPMD that desyncs the collective programs)
                cancellable_put(q, e)
            finally:
                cancellable_put(q, stop)

        producer_thread = threading.Thread(target=producer, daemon=True)
        producer_thread.start()
        self._threads = [producer_thread]
        self._queues = [q]

        out_q = q
        self._inline_prepare = loader.device_prepare
        if loader.device_prepare is not None and loader.device_prefetch:
            # second pipeline stage (double buffering): the H2D upload + the
            # jitted on-device preprocess for batch N+1 are dispatched while
            # the caller's step for batch N runs — the consumer thread never
            # pays the (transport-bound) dispatch latency on its own clock
            self._inline_prepare = None
            out_q = queue.Queue(maxsize=loader.prefetch)
            src = q

            def preparer():
                try:
                    while not cancelled.is_set():
                        try:
                            item = src.get(timeout=0.1)
                        except queue.Empty:
                            continue
                        if item is stop or isinstance(item, BaseException):
                            cancellable_put(out_q, item)
                            if item is stop:
                                return
                            continue
                        if not cancellable_put(
                            out_q, loader.device_prepare(item)
                        ):
                            return
                except BaseException as e:  # pragma: no cover - re-raised below
                    cancellable_put(out_q, e)
                    cancellable_put(out_q, stop)

            preparer_thread = threading.Thread(target=preparer, daemon=True)
            preparer_thread.start()
            self._threads.append(preparer_thread)
            self._queues.append(out_q)
        self._out_q = out_q

    def __iter__(self) -> Iterator[dict]:
        return self

    def __next__(self) -> dict:
        if self._closed:
            raise StopIteration
        try:
            item = self._out_q.get()
            if item is self._stop:
                self.close()
                raise StopIteration
            if isinstance(item, BaseException):
                self.loader._failed = True
                self.close()
                raise item
            if self._inline_prepare is not None:
                item = self._inline_prepare(item)
            return item
        except StopIteration:
            raise
        except BaseException:
            self.close()
            raise

    def close(self) -> None:
        """Wind the stage threads down and wait until loader._iter is
        released so a later __iter__ never races a still-running producer;
        then release the loader's single-consumer lock. Idempotent."""
        if self._closed:
            return
        self._closed = True
        self._cancelled.set()
        for qq in self._queues:
            try:
                while True:
                    qq.get_nowait()
            except queue.Empty:
                pass
        for t in self._threads:
            t.join(timeout=30.0)
            if t.is_alive():  # wedged in the dataset itself; stay dead
                self.loader._failed = True
        self.loader._iterating.release()

    def __del__(self):  # pragma: no cover - GC safety net
        try:
            self.close()
        except Exception:
            pass
