"""Native (C++) data-loader bindings.

`zipreader.cpp` implements the hot IO path of the StyleGAN-zip dataset
(central-directory parsing, raw-deflate entry extraction, PNG decode to
RGB8) as a small shared library; this module compiles it on first use and
exposes it through ctypes.  `cips3d_tpu.data.zip_dataset.ZipImageDataset`
uses it automatically for PNG entries and falls back to PIL otherwise.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_LIB_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_LIB_FAILED = False

_SRC = os.path.join(os.path.dirname(__file__), "zipreader.cpp")
_SO = os.path.join(os.path.dirname(__file__), "libzipreader.so")


def _build() -> bool:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-o", _SO, _SRC, "-lz"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=240)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _LIB, _LIB_FAILED
    with _LIB_LOCK:
        if _LIB is not None or _LIB_FAILED:
            return _LIB
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            if not _build():
                _LIB_FAILED = True
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            _LIB_FAILED = True
            return None
        lib.zr_open.restype = ctypes.c_void_p
        lib.zr_open.argtypes = [ctypes.c_char_p]
        lib.zr_close.argtypes = [ctypes.c_void_p]
        lib.zr_count.restype = ctypes.c_int64
        lib.zr_count.argtypes = [ctypes.c_void_p]
        lib.zr_name.restype = ctypes.c_char_p
        lib.zr_name.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.zr_entry_size.restype = ctypes.c_int64
        lib.zr_entry_size.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.zr_read_raw.restype = ctypes.c_int
        lib.zr_read_raw.argtypes = [ctypes.c_void_p, ctypes.c_int64, ctypes.c_char_p]
        lib.zr_read_image.restype = ctypes.c_int
        lib.zr_read_image.argtypes = [
            ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.c_int,
        ]
        _LIB = lib
        return _LIB


class NativeZipReader:
    """Thread-compatible reader over one zip archive (one handle per
    instance; zipreader.cpp seeks on a single FILE*, so guard with a lock)."""

    def __init__(self, path: str):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native zipreader unavailable")
        self._lib = lib
        self._h = lib.zr_open(path.encode())
        if not self._h:
            raise IOError(f"cannot open zip: {path}")
        self._lock = threading.Lock()
        self.names = []
        for i in range(lib.zr_count(self._h)):
            name = lib.zr_name(self._h, i)
            self.names.append(name.decode() if name else "")

    def __len__(self):
        return len(self.names)

    def read_raw(self, idx: int) -> bytes:
        size = self._lib.zr_entry_size(self._h, idx)
        if size < 0:
            raise IndexError(idx)
        buf = ctypes.create_string_buffer(size)
        with self._lock:
            rc = self._lib.zr_read_raw(self._h, idx, buf)
        if rc != 0:
            raise IOError(f"zr_read_raw failed ({rc}) for entry {idx}")
        return buf.raw

    def read_image(self, idx: int) -> np.ndarray:
        """Decode PNG entry → (H, W, 3) uint8.  Raises on non-PNG/unsupported."""
        w = ctypes.c_uint32()
        h = ctypes.c_uint32()
        with self._lock:
            rc = self._lib.zr_read_image(self._h, idx, None, ctypes.byref(w), ctypes.byref(h), 1)
            if rc != 0:
                raise IOError(f"png probe failed ({rc}) for entry {idx}")
            out = np.empty((h.value, w.value, 3), np.uint8)
            rc = self._lib.zr_read_image(
                self._h, idx, out.ctypes.data_as(ctypes.c_void_p),
                ctypes.byref(w), ctypes.byref(h), 0,
            )
        if rc != 0:
            raise IOError(f"png decode failed ({rc}) for entry {idx}")
        return out

    def close(self):
        if self._h:
            self._lib.zr_close(self._h)
            self._h = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass
