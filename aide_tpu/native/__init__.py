"""Native host-ops library (C++ via ctypes), self-building with fallback.

The compute path is JAX/XLA/Pallas on TPU; this module covers the *host*
runtime pieces the eval loop hits every epoch (largest-connected-component,
volume confusion counts). The library builds itself from ``native/hostops.cpp``
with g++ on first use and is cached next to the source; if no toolchain is
available the callers fall back to scipy/numpy implementations.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(__file__)))
_SRC = os.path.join(_REPO_ROOT, "native", "hostops.cpp")
_LIB_PATH = os.path.join(_REPO_ROOT, "native", "libhostops.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _src_digest() -> str:
    """Fingerprint of the source AND the build host: the .so is compiled
    -march=native, so a binary copied from another machine could carry
    illegal instructions (SIGILL is uncatchable and would kill the eval
    loop) — it must rebuild, not load."""
    import hashlib
    import platform

    with open(_SRC, "rb") as fh:
        src = fh.read()
    host = f"{platform.machine()}|{platform.processor()}|{platform.node()}"
    return hashlib.sha1(src + host.encode()).hexdigest()


def _build() -> bool:
    try:
        subprocess.run(
            [
                "g++", "-O3", "-march=native", "-shared", "-fPIC",
                _SRC, "-o", _LIB_PATH,
            ],
            check=True,
            capture_output=True,
            timeout=120,
        )
        with open(_LIB_PATH + ".sha1", "w") as fh:
            fh.write(_src_digest())
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def _lib_current() -> bool:
    """True iff the cached .so was built from the current source ON THIS
    HOST (see _src_digest). A hash sidecar instead of mtime comparison:
    checkouts/copies give source and library indistinguishable mtimes."""
    if not os.path.exists(_LIB_PATH):
        return False
    try:
        with open(_LIB_PATH + ".sha1") as fh:
            return fh.read().strip() == _src_digest()
    except OSError:
        return False


def load() -> Optional[ctypes.CDLL]:
    """The hostops library, building it on first use; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SRC):
            return None
        if not _lib_current() and not _build():
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.keep_largest_cc.restype = ctypes.c_int32
        lib.keep_largest_cc.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.volume_confusion.restype = None
        lib.volume_confusion.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64,
        ] + [ctypes.POINTER(ctypes.c_int64)] * 4
        _lib = lib
        return _lib


def keep_largest_cc(mask: np.ndarray) -> Optional[np.ndarray]:
    """Native largest-CC; None if the library is unavailable."""
    lib = load()
    if lib is None:
        return None
    m = np.ascontiguousarray(mask.astype(np.uint8))
    if m.ndim == 2:
        d, h, w = 1, *m.shape
    elif m.ndim == 3:
        d, h, w = m.shape
    else:
        return None
    out = np.empty_like(m)
    lib.keep_largest_cc(
        m.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        d, h, w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out


def volume_confusion(pred: np.ndarray, target: np.ndarray):
    """(tp, tn, fp, fn) ints; None if the library is unavailable."""
    lib = load()
    if lib is None:
        return None
    p = np.ascontiguousarray(pred.astype(np.uint8)).ravel()
    t = np.ascontiguousarray(target.astype(np.uint8)).ravel()
    if p.size != t.size:
        # the C loop reads target[0:pred.size] — a smaller target buffer
        # would be read out of bounds
        raise ValueError(
            f"pred/target size mismatch: {pred.shape} vs {target.shape}"
        )
    outs = [ctypes.c_int64() for _ in range(4)]
    lib.volume_confusion(
        p.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        t.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        p.size,
        *[ctypes.byref(o) for o in outs],
    )
    return tuple(o.value for o in outs)
