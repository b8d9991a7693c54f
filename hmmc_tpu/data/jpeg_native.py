"""ctypes bindings for the native batched JPEG decoder
(native/hmmc_jpeg.cpp).

One call decodes a whole batch of frame blobs to packed uint8
[n, target, target, 3] RGB with short-side resize + center crop, threaded in
C++ (libjpeg-turbo with DCT-domain prescaling). This is the native
replacement for the reference's per-frame cv2.imdecode/PIL/torchvision loop
(dataloader_msrvtt_retrieval.py:319-335 — SURVEY §2.9 names it the one
place this rebuild writes C++).

Falls back gracefully: :func:`available` is False when the .so is absent
and callers use the PIL/cv2 paths in datasets.py. Build with
``make -C native`` or ``python -m hmmc_tpu.data.jpeg_native --build``.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Sequence

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libhmmc_jpeg.so")

_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def build(verbose: bool = False) -> bool:
    """Compile the shared library; returns success."""
    try:
        out = subprocess.run(
            ["make", "-C", _NATIVE_DIR], capture_output=True, text=True,
            timeout=300)
        if verbose or out.returncode != 0:
            print(out.stdout, out.stderr)
        return out.returncode == 0
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    if not os.path.exists(_SO_PATH):
        if not build():
            _load_failed = True
            return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
        lib.hmmc_decode_batch.restype = ctypes.c_int
        lib.hmmc_decode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_size_t),
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
        ]
        _lib = lib
    except OSError:
        _load_failed = True
    return _lib


def available() -> bool:
    if os.environ.get("HMMC_NO_NATIVE_JPEG"):
        return False
    return _load() is not None


def decode_batch(blobs: Sequence[bytes], target: int,
                 num_threads: int = 0) -> np.ndarray:
    """-> uint8 [n, target, target, 3] RGB. Raises if the native lib is
    unavailable (check available())."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native JPEG decoder not built")
    n = len(blobs)
    out = np.empty((n, target, target, 3), np.uint8)
    blob_bytes: List[bytes] = [bytes(b) for b in blobs]
    arr = (ctypes.c_char_p * n)(*blob_bytes)
    sizes = (ctypes.c_size_t * n)(*[len(b) for b in blob_bytes])
    failures = lib.hmmc_decode_batch(
        arr, sizes, n, target,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), num_threads)
    if failures:
        import logging

        logging.getLogger(__name__).warning(
            "%d/%d JPEG decodes failed (zero-filled)", failures, n)
    return out


if __name__ == "__main__":
    import sys

    if "--build" in sys.argv:
        ok = build(verbose=True)
        print("build", "OK" if ok else "FAILED")
        sys.exit(0 if ok else 1)
