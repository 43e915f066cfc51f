"""Decode-once sample cache: JPEG decode leaves the steady state.

The reference re-decodes every JPEG every epoch inside its dataloader
workers (reference src/datasets/ho3d.py:261-263). On hosts with few cores
that decode dominates the input pipeline (LOADER_BENCH.json: 8.3x
input-bound at full res on this 1-core box, still 3.4x with the DCT-domain
half-res decode). This module is the lever the reference doesn't have:
with ``data.cache_decoded: true`` the FIRST full pass over a split writes
every parsed sample — decoded uint8 frames plus the small label arrays — to
an mmap-able cache; every later epoch streams from the page cache and never
touches libjpeg again.

Layout (one directory per cache identity, under ``data.cache_dir`` or
``<dataset_dir>/decoded_cache``):

  frames.u8   raw appended ``full_rgb`` bytes, fixed per-sample shape
              [V, H, W, 3] uint8 — np.memmap'd for reading
  labels.pkl  list of per-sample label dicts (every field except full_rgb)
  meta.json   sample count + frame shape; written LAST (atomically), so a
              directory without it is an aborted build and is rebuilt

The identity hash covers the shard list (basename, size, mtime), the view
selection, decode_scale_denom, and the process's split slice — any change
rebuilds rather than serving stale frames. Multi-process safe by
construction: each process's slice is part of the identity, so builders
never share a directory.
"""

from __future__ import annotations

import hashlib
import json
import os
import pickle
from pathlib import Path
from typing import Iterable, Iterator

import numpy as np


class DecodedCache:
    def __init__(self, root: str | Path, identity: dict):
        blob = json.dumps(identity, sort_keys=True, default=str).encode()
        digest = hashlib.sha256(blob).hexdigest()[:16]
        split = identity.get("split", "data")
        name = identity.get("name", "ds")
        self.dir = Path(root) / f"{name}_{split}_{digest}"
        self.identity = identity
        self._frames: np.memmap | None = None
        self._labels: list[dict] | None = None
        self._meta: dict | None = None

    @property
    def complete(self) -> bool:
        return (self.dir / "meta.json").exists()

    # ------------------------------------------------------------- build --
    def build(self, samples: Iterable[dict]) -> int:
        """Consume one full deterministic pass of parsed samples and persist
        them. Returns the sample count. meta.json lands last, so a crash
        mid-build leaves an incomplete directory that the next run rebuilds
        from scratch."""
        self.dir.mkdir(parents=True, exist_ok=True)
        frames_path = self.dir / "frames.u8"
        labels: list[dict] = []
        shape: tuple[int, ...] | None = None
        n = 0
        with open(frames_path, "wb") as f:
            for sample in samples:
                rgb = np.ascontiguousarray(sample["full_rgb"], dtype=np.uint8)
                if shape is None:
                    shape = rgb.shape
                else:
                    assert rgb.shape == shape, (
                        f"inconsistent frame shape in cache build: {rgb.shape} "
                        f"vs {shape} — all samples must share one "
                        "[V, H, W, 3] layout"
                    )
                f.write(rgb.tobytes())
                labels.append({k: v for k, v in sample.items() if k != "full_rgb"})
                n += 1
        if n == 0:
            raise RuntimeError(
                "decode-once cache build saw zero samples — check shard "
                "paths/patterns (data.cache_decoded)"
            )
        with open(self.dir / "labels.pkl", "wb") as f:
            pickle.dump(labels, f, protocol=pickle.HIGHEST_PROTOCOL)
        meta = {
            "n": n,
            "frame_shape": list(shape),
            "identity": self.identity,
        }
        tmp = self.dir / "meta.json.tmp"
        tmp.write_text(json.dumps(meta, indent=2, default=str))
        os.replace(tmp, self.dir / "meta.json")  # atomic completion marker
        return n

    # -------------------------------------------------------------- read --
    def _open(self) -> None:
        # labels load fully into RAM (~15-20 KB/sample incl. the 778-vertex
        # mesh -> ~150 MB for HO3D train); frames stay on disk via memmap
        if self._meta is None:
            self._meta = json.loads((self.dir / "meta.json").read_text())
            shape = (self._meta["n"], *self._meta["frame_shape"])
            self._frames = np.memmap(
                self.dir / "frames.u8", dtype=np.uint8, mode="r", shape=shape
            )
            with open(self.dir / "labels.pkl", "rb") as f:
                self._labels = pickle.load(f)

    def __len__(self) -> int:
        self._open()
        return self._meta["n"]

    def iter_samples(
        self, shuffle: bool = False, seed: int = 42, epoch: int = 0
    ) -> Iterator[dict]:
        """One pass over the cached samples. ``shuffle`` permutes the full
        epoch (strictly stronger than the streaming readers' 500-sample
        reservoir, which a random-access store doesn't need)."""
        self._open()
        order = np.arange(self._meta["n"])
        if shuffle:
            np.random.default_rng(seed + epoch * 10007).shuffle(order)
        for i in order:
            sample = dict(self._labels[i])
            # memmap view, not a copy: collate's np.stack materializes it
            # straight out of the page cache
            sample["full_rgb"] = self._frames[i]
            yield sample
