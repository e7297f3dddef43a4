"""ctypes binding for the native 16-bit PNG decoder (native/png16.cc).

ctypes calls release the GIL, so the host loader's thread pool decodes PNGs
in true parallel — the native replacement for the reference's DataLoader
worker *processes* (scripts/phase5_big_run.py:1577-1587). The library is
built on demand (g++ + zlib, both baked into the image); any failure —
missing toolchain, unsupported PNG variant — falls back to PIL silently, so
the pipeline never hard-depends on the native path.
"""

from __future__ import annotations

import ctypes
import logging
import subprocess
import threading
from pathlib import Path
from typing import Optional

import numpy as np

log = logging.getLogger(__name__)

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libdinoxpng.so"

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_lib_failed = False

PNG16_OK = 0


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-s", "libdinoxpng.so"], cwd=_NATIVE_DIR, check=True,
            capture_output=True, timeout=120,
        )
        return _LIB_PATH.exists()
    except Exception as e:  # noqa: BLE001
        log.info("native png decoder unavailable (%s); using PIL", e)
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        if not _LIB_PATH.exists() and not _build():
            _lib_failed = True
            return None
        try:
            lib = ctypes.CDLL(str(_LIB_PATH))
            lib.png16_decode.restype = ctypes.c_int
            lib.png16_decode.argtypes = [
                ctypes.c_char_p, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_uint16), ctypes.c_int64,
            ]
            lib.png16_header.restype = ctypes.c_int
            lib.png16_header.argtypes = [
                ctypes.c_char_p, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_uint32),
                ctypes.POINTER(ctypes.c_uint32),
            ]
            _lib = lib
        except OSError as e:
            log.info("failed to load native png decoder: %s", e)
            _lib_failed = True
    return _lib


def native_available() -> bool:
    return get_lib() is not None


def decode_png16(data: bytes) -> Optional[np.ndarray]:
    """Decode PNG bytes -> (H, W) uint16, or None if the native path can't
    handle this file (caller falls back to PIL)."""
    lib = get_lib()
    if lib is None:
        return None
    w = ctypes.c_uint32()
    h = ctypes.c_uint32()
    depth = ctypes.c_uint32()
    rc = lib.png16_header(data, len(data), ctypes.byref(w), ctypes.byref(h),
                          ctypes.byref(depth))
    if rc != PNG16_OK:
        return None
    out = np.empty((h.value, w.value), np.uint16)
    rc = lib.png16_decode(
        data, len(data),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)), out.size,
    )
    if rc != PNG16_OK:
        return None
    return out


def read_png16(path: str) -> Optional[np.ndarray]:
    try:
        return decode_png16(Path(path).read_bytes())
    except OSError:
        return None
