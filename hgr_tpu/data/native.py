"""ctypes binding for the native host runtime (native/hgr_native.cpp).

Builds the shared library on first use when the toolchain is available;
all callers fall back to the cv2/PIL python path when it isn't (see
hgr_tpu.data.loader). The batch API writes straight into caller-owned
numpy buffers and releases the GIL for the whole decode+stage batch.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Tuple

import numpy as np

_LIB_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_LIB_DIR, "libhgr_native.so")

_lib = None
_lib_lock = threading.Lock()
_build_attempted = False


def _build() -> bool:
    try:
        subprocess.run(
            ["sh", os.path.join(_LIB_DIR, "build.sh")],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load_unique_copy() -> Optional[ctypes.CDLL]:
    """CDLL a fresh temp copy of the library (bypasses dlopen's
    same-path dedup against an already-loaded stale image)."""
    import shutil
    import tempfile

    tmp = None
    try:
        fd, tmp = tempfile.mkstemp(suffix=".so", prefix="hgr_native_")
        os.close(fd)
        shutil.copyfile(_LIB_PATH, tmp)
        return ctypes.CDLL(tmp)
    except OSError:
        return None
    finally:
        if tmp is not None:
            try:
                os.unlink(tmp)  # safe on Linux once mapped
            except OSError:
                pass


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_attempted
    with _lib_lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB_PATH) and not _build_attempted:
            _build_attempted = True
            _build()
        if not os.path.exists(_LIB_PATH):
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        if not hasattr(lib, "hgr_decode_jpeg_mem"):  # newest ABI symbol
            # Stale .so from an older ABI — rebuild once. dlopen dedupes
            # by pathname while the stale handle is alive, so re-CDLL of
            # _LIB_PATH would return the OLD image; load the fresh build
            # through a unique temp copy instead. The attempt flag is set
            # BEFORE building so a failed compile (no toolchain on the
            # host) is not retried on every _load() call.
            if _build_attempted:
                return None
            _build_attempted = True
            if not _build():
                return None
            lib = _load_unique_copy()
            if lib is None or not hasattr(lib, "hgr_decode_jpeg_mem"):
                return None
        lib.hgr_decode_jpeg.restype = ctypes.c_int
        lib.hgr_decode_jpeg.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int)]
        lib.hgr_decode_jpeg_mem.restype = ctypes.c_int
        lib.hgr_decode_jpeg_mem.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
        lib.hgr_stage_batch2.restype = ctypes.c_int
        lib.hgr_stage_batch2.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_float,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


_MAX_SIDE = 4096

# Bounded pool of 48 MB decode buffers, shared by ALL decode callers.
# (A per-thread cache looked cheaper but leaked by design under
# ThreadingHTTPServer, which runs one fresh thread per request — every
# JPEG POST allocated and discarded a full buffer. The pool lock costs
# nanoseconds against a multi-ms libjpeg decode.)
_decode_pool: list = []
_decode_pool_lock = threading.Lock()
_DECODE_POOL_MAX = 8


def _decode_into_pooled_buf(call) -> Optional[np.ndarray]:
    """Run one libjpeg decode ``call(out_ptr, cap, &w, &h) -> rc`` into a
    pooled buffer; return the copied (H, W, 3) BGR array or None."""
    cap = _MAX_SIDE * _MAX_SIDE * 3
    with _decode_pool_lock:
        buf = _decode_pool.pop() if _decode_pool else None
    if buf is None:
        buf = np.empty((cap,), np.uint8)
    try:
        w = ctypes.c_int(0)
        h = ctypes.c_int(0)
        rc = call(buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                  cap, ctypes.byref(w), ctypes.byref(h))
        if rc != 0:
            return None
        return (buf[: h.value * w.value * 3]
                .reshape(h.value, w.value, 3).copy())
    finally:
        with _decode_pool_lock:
            if len(_decode_pool) < _DECODE_POOL_MAX:
                _decode_pool.append(buf)


def decode_jpeg_bgr(path: str) -> Optional[np.ndarray]:
    """Decode one JPEG to BGR uint8 (H, W, 3); None on failure/unavailable."""
    lib = _load()
    if lib is None:
        return None
    return _decode_into_pooled_buf(
        lambda out, cap, w, h: lib.hgr_decode_jpeg(
            path.encode(), out, cap, w, h))


def decode_jpeg_bgr_bytes(data: bytes) -> Optional[np.ndarray]:
    """Decode an in-memory JPEG (e.g. an HTTP body) to BGR uint8
    (H, W, 3); None on failure or when the library is unavailable.
    Callers needing a pure-python fallback should try cv2.imdecode."""
    lib = _load()
    if lib is None:
        return None
    src = np.frombuffer(data, np.uint8)
    return _decode_into_pooled_buf(
        lambda out, cap, w, h: lib.hgr_decode_jpeg_mem(
            src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(data),
            out, cap, w, h))


def stage_batch(
    paths: List[str],
    canvas_size: int,
    num_threads: int = 4,
    out_canvases: Optional[np.ndarray] = None,
    out_affines: Optional[np.ndarray] = None,
    out_sizes: Optional[np.ndarray] = None,
    window_frac: float = 0.75,
) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]]:
    """Decode + stage a whole batch natively.

    Returns (canvases (N,S,S,3) u8, affines (N,2,3) f32, sizes_hw (N,2)
    f32, ok (N,) u8) or None when the native library is unavailable.
    """
    lib = _load()
    if lib is None:
        return None
    n = len(paths)
    canvases = out_canvases if out_canvases is not None else np.empty(
        (n, canvas_size, canvas_size, 3), np.uint8)
    affines = out_affines if out_affines is not None else np.empty(
        (n, 2, 3), np.float32)
    sizes = out_sizes if out_sizes is not None else np.empty(
        (n, 2), np.float32)
    ok = np.empty((n,), np.uint8)

    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    lib.hgr_stage_batch2(
        c_paths, n,
        canvases.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        canvas_size, window_frac,
        affines.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ok.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        num_threads)
    return canvases, affines, sizes, ok
