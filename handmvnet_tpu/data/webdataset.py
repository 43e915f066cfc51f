"""Minimal WebDataset-style tar shard reader (no webdataset dependency).

Reads the reference's tar format: entries named ``<key>.<field>`` grouped by
key, e.g. ``000002187.image_0.jpg`` ... ``000002187.label.pyd``
(reference: src/datasets/ho3d.py:52-91). Provides:

  * brace_expand: the ``prefix-{000000..00008}.tar`` URL pattern
  * iter_tar_samples: stream grouped samples from one shard
  * ShardDataset: multi-shard iterator with shard shuffling, resampling,
    buffer shuffling, node/worker splitting — the same knobs the reference
    uses via wds (ho3d.py:251-263)

Decoding: .jpg/.png via cv2 (rgb8, matching wds .decode('rgb8')); .pyd via
pickle (the reference's label payloads are pickled dicts).
"""

from __future__ import annotations

import io
import pickle
import re
import tarfile
from pathlib import Path
from typing import Any, Callable, Iterable, Iterator

import numpy as np


def brace_expand(url: str) -> list[str]:
    """Expand one `{A..B}` numeric range (zero-padded), like braceexpand."""
    m = re.search(r"\{(\d+)\.\.(\d+)\}", url)
    if not m:
        return [url]
    lo, hi = m.group(1), m.group(2)
    width = len(lo)
    out = []
    for i in range(int(lo), int(hi) + 1):
        out.extend(brace_expand(url[: m.start()] + str(i).zfill(width) + url[m.end():]))
    return out


def decode_field(name: str, payload: bytes) -> Any:
    if name.endswith((".jpg", ".jpeg", ".png")):
        import cv2

        arr = np.frombuffer(payload, dtype=np.uint8)
        img = cv2.imdecode(arr, cv2.IMREAD_COLOR)  # BGR
        return np.ascontiguousarray(img[:, :, ::-1])  # rgb8
    if name.endswith((".pyd", ".pickle", ".pkl")):
        return pickle.loads(payload)
    if name.endswith(".cls"):
        return int(payload)
    if name.endswith((".txt", ".json")):
        return payload.decode()
    return payload


def iter_tar_samples(path: str | Path, decode: bool = True) -> Iterator[dict]:
    """Yield {'__key__', '__url__', '<field>': value, ...} per sample group."""
    path = str(path)
    current_key: str | None = None
    sample: dict[str, Any] = {}
    with tarfile.open(path, "r") as tf:
        for member in tf:
            if not member.isfile():
                continue
            base = Path(member.name).name
            key, _, field = base.partition(".")
            if key != current_key:
                if current_key is not None and sample:
                    yield sample
                current_key = key
                sample = {"__key__": key, "__url__": path}
            payload = tf.extractfile(member).read()
            sample[field] = decode_field(field, payload) if decode else payload
    if current_key is not None and sample:
        yield sample


class ShardDataset:
    """Iterable over samples across tar shards.

    Args:
      urls: list of shard paths (already brace-expanded).
      shuffle_shards: reshuffle shard order every epoch.
      resample: sample shards with replacement forever (training mode;
        reference ho3d.py:255 `resampled=True`).
      shuffle_buffer: reservoir-style sample shuffling (reference .shuffle(500)).
      preprocess: per-sample callable.
      split_index/split_count: this reader's shard slice (node*worker split).
      seed: epoch-stable RNG seed.
    """

    def __init__(
        self,
        urls: Iterable[str],
        preprocess: Callable[[dict], Any] | None = None,
        shuffle_shards: bool = False,
        resample: bool = False,
        shuffle_buffer: int = 0,
        split_index: int = 0,
        split_count: int = 1,
        seed: int = 42,
    ):
        self.urls = list(urls)
        self.preprocess = preprocess
        self.shuffle_shards = shuffle_shards
        self.resample = resample
        self.shuffle_buffer = shuffle_buffer
        self.split_index = split_index
        self.split_count = split_count
        self.seed = seed
        self._epoch = 0

    @property
    def _sample_split(self) -> bool:
        """More readers than shards (non-resampled): split at SAMPLE
        granularity so no two processes see the same data. The old behavior
        (fall back to all shards) double-counted evaluation data — with 2
        val shards and >=3 processes the pmean'd metrics were wrong."""
        # the mode must be decided identically on EVERY process, so it keys
        # on split_count vs the shard count, not on this process's slice
        return not self.resample and self.split_count > max(len(self.urls), 1)

    def _shards_for_epoch(self, rng: np.random.Generator) -> list[str]:
        if self._sample_split:
            # every process must walk the shards in the SAME order for the
            # ordinal split to partition cleanly
            return list(self.urls)
        urls = self.urls[self.split_index :: self.split_count]
        if self.resample:
            urls = urls or self.urls  # with replacement, oversubscription is fine
            return [str(rng.choice(urls)) for _ in range(len(urls))]
        if self.shuffle_shards:
            urls = list(urls)
            rng.shuffle(urls)
        return urls

    def __iter__(self) -> Iterator[Any]:
        rng = np.random.default_rng(self.seed + self._epoch * 10007 + self.split_index)
        sample_split = self._sample_split
        self._epoch += 1
        buffer: list[Any] = []

        def emit(sample):
            return self.preprocess(sample) if self.preprocess else sample

        ordinal = 0
        for shard in self._shards_for_epoch(rng):
            for sample in iter_tar_samples(shard):
                if sample_split:
                    mine = ordinal % self.split_count == self.split_index
                    ordinal += 1
                    if not mine:
                        continue
                if self.shuffle_buffer > 1:
                    buffer.append(sample)
                    if len(buffer) >= self.shuffle_buffer:
                        idx = int(rng.integers(len(buffer)))
                        buffer[idx], buffer[-1] = buffer[-1], buffer[idx]
                        yield emit(buffer.pop())
                else:
                    yield emit(sample)
        while buffer:
            idx = int(rng.integers(len(buffer)))
            buffer[idx], buffer[-1] = buffer[-1], buffer[idx]
            yield emit(buffer.pop())


def write_tar_shard(path: str | Path, samples: Iterable[dict]) -> None:
    """Write samples ({'__key__', field: bytes-or-encodable}) to a tar shard —
    used by tests and the synthetic-dataset generator to produce shards in
    the exact reference format."""
    import cv2

    with tarfile.open(str(path), "w") as tf:
        for sample in samples:
            key = sample["__key__"]
            for field, value in sample.items():
                if field.startswith("__"):
                    continue
                if field.endswith((".jpg", ".jpeg")):
                    ok, buf = cv2.imencode(".jpg", np.asarray(value)[:, :, ::-1])
                    assert ok
                    payload = buf.tobytes()
                elif field.endswith((".pyd", ".pickle", ".pkl")):
                    payload = pickle.dumps(value)
                elif isinstance(value, bytes):
                    payload = value
                else:
                    payload = str(value).encode()
                info = tarfile.TarInfo(name=f"{key}.{field}")
                info.size = len(payload)
                tf.addfile(info, io.BytesIO(payload))
