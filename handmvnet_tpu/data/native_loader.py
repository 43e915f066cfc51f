"""ctypes bindings for the native tar/JPEG loader (native/tario.cc).

The C++ thread pool does tar parsing + libjpeg decode and hands Python
fully-decoded [V, H, W, 3] uint8 frames plus raw label-pickle bytes; Python
only unpickles labels and runs parse_multiview_labels. Falls back cleanly to
the pure-Python reader when the shared library hasn't been built
(``make -C native``).
"""

from __future__ import annotations

import ctypes
import pickle
from pathlib import Path
from typing import Iterator

import numpy as np

_LIB_PATH = Path(__file__).resolve().parents[2] / "native" / "libtario.so"
_TARIO_END = -1

_lib = None


def _load_lib():
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.tario_create.restype = ctypes.c_void_p
        lib.tario_create.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.tario_create_scaled.restype = ctypes.c_void_p
        lib.tario_create_scaled.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int,
        ]
        lib.tario_next.restype = ctypes.c_int
        lib.tario_next.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int,
            ctypes.c_char_p,
            ctypes.c_int,
        ]
        lib.tario_destroy.argtypes = [ctypes.c_void_p]
        lib.tario_dropped.restype = ctypes.c_long
        lib.tario_dropped.argtypes = [ctypes.c_void_p]
        _lib = lib
    return _lib


def native_available() -> bool:
    return _LIB_PATH.exists()


class NativeShardLoader:
    """Iterator over decoded samples: (key, images [V,H,W,3] uint8, labels dict)."""

    def __init__(
        self,
        shard_paths: list[str],
        num_views: int,
        image_hw: tuple[int, int] = (480, 640),
        n_threads: int = 4,
        capacity: int = 64,
        label_cap: int = 16 * 1024 * 1024,
        scale_denom: int = 1,
    ):
        """image_hw: the SOURCE frame dims; with scale_denom in {2,4,8} the
        decoder runs libjpeg's DCT-domain downscaling and emits
        ceil(hw/denom) frames at ~1/3 the decode cost (per halving) — the
        cheap lever on decode-bound hosts (LOADER_BENCH.json)."""
        self.lib = _load_lib()
        self.num_views = num_views
        assert scale_denom in (1, 2, 4, 8), scale_denom
        self.scale_denom = scale_denom
        # libjpeg emits ceil(orig/denom)
        self.h = -(-image_hw[0] // scale_denom)
        self.w = -(-image_hw[1] // scale_denom)
        self.label_cap = label_cap
        arr = (ctypes.c_char_p * len(shard_paths))(
            *[p.encode() for p in shard_paths]
        )
        self.handle = self.lib.tario_create_scaled(
            arr, len(shard_paths), num_views, self.h, self.w, n_threads,
            capacity, scale_denom,
        )
        if not self.handle:
            raise RuntimeError("tario_create failed")
        self._closed = False

    def __iter__(self) -> Iterator[tuple[str, np.ndarray, dict]]:
        img_buf = np.empty((self.num_views, self.h, self.w, 3), dtype=np.uint8)
        label_buf = (ctypes.c_uint8 * self.label_cap)()
        key_buf = ctypes.create_string_buffer(256)
        while True:
            n = self.lib.tario_next(
                self.handle,
                img_buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                label_buf,
                self.label_cap,
                key_buf,
                256,
            )
            if n == _TARIO_END:
                return
            if n < 0:
                raise RuntimeError(f"tario_next error {n}")
            labels = pickle.loads(bytes(label_buf[:n]))
            yield key_buf.value.decode(), img_buf.copy(), labels

    def dropped_samples(self) -> int:
        """Samples the C++ pool silently skipped so far: incomplete
        view/label groups, malformed JPEGs, or frames whose decoded dims
        differ from the expected (ceil(image_hw/scale_denom)) shape — all
        frames are assumed to be exactly image_hw at the source."""
        if self._closed:
            return self._dropped_at_close
        return int(self.lib.tario_dropped(self.handle))

    def close(self) -> None:
        if not self._closed:
            self._dropped_at_close = int(self.lib.tario_dropped(self.handle))
            self.lib.tario_destroy(self.handle)
            self._closed = True

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass
