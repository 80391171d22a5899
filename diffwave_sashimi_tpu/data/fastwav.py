"""ctypes binding to the native multithreaded WAV batch decoder.

The native core (native/fastwav.cpp) replaces the reference's torch
DataLoader worker processes (reference dataloaders/__init__.py:21-28,
num_workers=4): one C call decodes a whole batch in parallel threads,
with pad-or-trim (SC09, reference sc.py:25-33) or seeded random crop
(Mel2Samp, reference mel2samp.py:96-103) done in native code.

Plain C ABI via ctypes — no pybind11 in this image.  The library is built
on demand (``make -C native``); ``available()`` gates all call sites so
the pure-python scipy path remains a complete fallback.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libfastwav.so"))

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:  # auto-build on first use
            subprocess.run(["make", "-C", os.path.abspath(_NATIVE_DIR)],
                           check=True, capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.fastwav_decode_batch.restype = ctypes.c_int
    lib.fastwav_decode_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.c_int, ctypes.c_uint64,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int]
    lib.fastwav_probe.restype = ctypes.c_int
    lib.fastwav_probe.argtypes = [ctypes.c_char_p,
                                  ctypes.POINTER(ctypes.c_int32),
                                  ctypes.POINTER(ctypes.c_int32)]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def decode_batch(paths: List[str], target_len: int, scale: float = 1.0,
                 crop: bool = False, crop_seed: int = 0,
                 n_threads: int = 0
                 ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Decode ``paths`` into (out (n, target_len) f32, sample_rates (n,),
    orig_lens (n,), status (n,)); status[i] != 0 marks a failed file (the
    caller falls back to scipy for those)."""
    lib = _load()
    assert lib is not None, "libfastwav.so unavailable"
    n = len(paths)
    out = np.zeros((n, target_len), np.float32)
    srs = np.zeros(n, np.int32)
    lens = np.zeros(n, np.int32)
    status = np.zeros(n, np.int32)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    lib.fastwav_decode_batch(
        c_paths, n, target_len, ctypes.c_float(scale),
        1 if crop else 0, ctypes.c_uint64(crop_seed),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        srs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        n_threads)
    return out, srs, lens, status


def probe(path: str) -> Tuple[int, int]:
    """(sample_rate, n_frames) from the RIFF header, no decode."""
    lib = _load()
    assert lib is not None, "libfastwav.so unavailable"
    sr = ctypes.c_int32(0)
    nf = ctypes.c_int32(0)
    rc = lib.fastwav_probe(path.encode(), ctypes.byref(sr), ctypes.byref(nf))
    if rc != 0:
        raise ValueError(f"fastwav_probe failed ({rc}) on {path}")
    return int(sr.value), int(nf.value)


__all__ = ["available", "decode_batch", "probe"]
