"""ctypes binding for the native C++ decode/resize core (native/loader.cc).

Builds the shared library on first use (g++, cached next to the source);
falls back gracefully when the toolchain or libjpeg is unavailable —
callers must check `available()`.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional

import numpy as np

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _source_dir() -> str:
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(__file__))),
        "native",
    )


def _build_and_load() -> Optional[ctypes.CDLL]:
    src = os.path.join(_source_dir(), "loader.cc")
    so = os.path.join(_source_dir(), "libppea_loader.so")
    if not os.path.exists(src):
        return None
    if (not os.path.exists(so)
            or os.path.getmtime(so) < os.path.getmtime(src)):
        cmd = ["g++", "-O3", "-fPIC", "-shared", "-o", so, src,
               "-ljpeg", "-pthread"]
        try:
            subprocess.run(cmd, check=True, capture_output=True)
        except Exception as e:  # pragma: no cover
            print(f"[native_loader] build failed: {e}")
            return None
    lib = ctypes.CDLL(so)
    lib.ppea_decode_resize.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_ubyte),
    ]
    lib.ppea_decode_resize.restype = ctypes.c_int
    lib.ppea_decode_resize_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.ppea_decode_resize_batch.restype = ctypes.c_int
    return lib


def _get() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if not _TRIED:
            _TRIED = True
            try:
                _LIB = _build_and_load()
            except Exception as e:  # pragma: no cover
                print(f"[native_loader] unavailable: {e}")
                _LIB = None
    return _LIB


def available() -> bool:
    return _get() is not None


def decode_resize(path: str, width: int, height: int) -> np.ndarray:
    """Decode a JPEG and resize to (height, width); returns u8 HWC RGB."""
    lib = _get()
    assert lib is not None, "native loader unavailable"
    out = np.empty((height, width, 3), np.uint8)
    rc = lib.ppea_decode_resize(
        path.encode(), width, height,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
    )
    if rc != 0:
        raise FileNotFoundError(f"decode failed ({rc}): {path}")
    return out


def decode_resize_batch(
    paths: List[str], width: int, height: int, n_threads: int = 8
) -> np.ndarray:
    """Threaded batch decode; failed slots are zero-filled (the blank-frame
    protocol). Returns u8 [N, height, width, 3]."""
    lib = _get()
    assert lib is not None, "native loader unavailable"
    n = len(paths)
    out = np.empty((n, height, width, 3), np.uint8)
    status = np.zeros(n, np.int32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    lib.ppea_decode_resize_batch(
        arr, n, width, height,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        n_threads,
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
    )
    return out
