"""Native (C++) helpers with pure-Python fallbacks.

The reference delegates its CPU-native needs to libraries (munkres,
pycocotools's C extension, OpenCV — SURVEY.md §2.4).  None of those are
assumed here: this package builds its own small C++ library
(``librtpe_native.so``) and falls back to numpy/scipy when the shared
object has not been compiled.

Currently provided:

* ``lap_solve(cost)``   — square linear assignment (Jonker-Volgenant)
* ``rle_decode/encode`` — COCO compressed RLE masks (see data/rle.py)
* ``bilinear_resize``   — HWC float32 resize, torch semantics (the
  per-sample teacher-map upsampling in the data pipeline)
"""

import ctypes
import os
from typing import Tuple

import numpy as np

_LIB = None
_LIB_TRIED = False


def _load_lib():
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    so = os.path.join(os.path.dirname(__file__), "librtpe_native.so")
    if os.path.exists(so):
        try:
            lib = ctypes.CDLL(so)
            lib.lap_solve.argtypes = [
                ctypes.POINTER(ctypes.c_double), ctypes.c_int,
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
            lib.lap_solve.restype = ctypes.c_int
            for name in ("rle_decode_counts", "rle_decode_mask",
                         "rle_encode_mask"):
                if not hasattr(lib, name):
                    raise OSError(f"{name} missing; rebuild")
            lib.rle_decode_counts.argtypes = [
                ctypes.c_char_p, ctypes.c_int,
                ctypes.POINTER(ctypes.c_longlong), ctypes.c_int]
            lib.rle_decode_counts.restype = ctypes.c_int
            lib.rle_decode_mask.argtypes = [
                ctypes.POINTER(ctypes.c_longlong), ctypes.c_int,
                ctypes.POINTER(ctypes.c_ubyte), ctypes.c_longlong]
            lib.rle_decode_mask.restype = ctypes.c_int
            lib.rle_encode_mask.argtypes = [
                ctypes.POINTER(ctypes.c_ubyte), ctypes.c_longlong,
                ctypes.POINTER(ctypes.c_longlong), ctypes.c_int]
            lib.rle_encode_mask.restype = ctypes.c_int
            if hasattr(lib, "bilinear_resize_hwc"):
                lib.bilinear_resize_hwc.argtypes = [
                    ctypes.POINTER(ctypes.c_float), ctypes.c_int,
                    ctypes.c_int, ctypes.c_int,
                    ctypes.POINTER(ctypes.c_float), ctypes.c_int,
                    ctypes.c_int, ctypes.c_int]
                lib.bilinear_resize_hwc.restype = ctypes.c_int
            _LIB = lib
        except OSError:
            _LIB = None
    return _LIB


def native_rle_decode(counts_str: bytes, h: int, w: int):
    """C++ RLE decode; returns (h, w) uint8 mask or None if the native
    library is unavailable."""
    lib = _load_lib()
    if lib is None:
        return None
    max_counts = len(counts_str) + 4
    counts = np.zeros(max_counts, dtype=np.int64)
    n = lib.rle_decode_counts(
        counts_str, len(counts_str),
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
        max_counts)
    if n < 0:
        return None
    flat = np.zeros(h * w, dtype=np.uint8)
    lib.rle_decode_mask(
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)), n,
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)), h * w)
    return flat.reshape((w, h)).T


def native_rle_encode_counts(mask):
    """C++ run-length pass; returns the int counts list or None."""
    lib = _load_lib()
    if lib is None:
        return None
    flat = np.ascontiguousarray(np.asarray(mask, np.uint8).T.reshape(-1))
    max_counts = flat.size + 2
    counts = np.zeros(max_counts, dtype=np.int64)
    n = lib.rle_encode_mask(
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)), flat.size,
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
        max_counts)
    if n < 0:
        return None
    return counts[:n].tolist()


def build(verbose: bool = False) -> bool:
    """Compile the C++ library in place with g++.  Returns success."""
    import subprocess
    here = os.path.dirname(__file__)
    src = [os.path.join(here, "lap.cpp"), os.path.join(here, "rle.cpp"),
           os.path.join(here, "resize.cpp")]
    src = [s for s in src if os.path.exists(s)]
    if not src:
        return False
    out = os.path.join(here, "librtpe_native.so")
    # -march=x86-64-v3 (AVX2 baseline), NOT -march=native: the built .so
    # can outlive the build host (container migration, shared volume) and
    # a native-ISA binary then dies with SIGILL instead of falling back
    for arch in ("-march=x86-64-v3", None):
        cmd = ["g++", "-O3", "-shared", "-fPIC", "-o", out] + src
        if arch:
            cmd.insert(2, arch)
        try:
            res = subprocess.run(cmd, capture_output=True, text=True)
        except FileNotFoundError:
            return False
        if res.returncode == 0:
            global _LIB_TRIED
            _LIB_TRIED = False
            return True
        if verbose:
            print(res.stderr)
    return False


def lap_solve(cost: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Minimal-cost square assignment.

    :param cost: (k, k) float64 cost matrix.
    :returns: (rows, cols) int arrays, rows == arange(k).
    """
    cost = np.ascontiguousarray(cost, dtype=np.float64)
    k = cost.shape[0]
    assert cost.shape == (k, k), "lap_solve needs a square matrix"
    lib = _load_lib()
    if lib is not None:
        rows = np.arange(k, dtype=np.int32)
        cols = np.zeros(k, dtype=np.int32)
        rc = lib.lap_solve(
            cost.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), k,
            rows.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            cols.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
        if rc == 0:
            return rows.astype(np.int64), cols.astype(np.int64)
    from scipy.optimize import linear_sum_assignment
    rows, cols = linear_sum_assignment(cost)
    return rows, cols


def native_bilinear_resize(x_hwc: np.ndarray, out_hw,
                           align_corners: bool = True):
    """C++ bilinear HWC resize; returns None when the lib is absent."""
    lib = _load_lib()
    if lib is None or not hasattr(lib, "bilinear_resize_hwc"):
        return None
    x = np.ascontiguousarray(x_hwc, dtype=np.float32)
    ih, iw, c = x.shape
    oh, ow = int(out_hw[0]), int(out_hw[1])
    out = np.empty((oh, ow, c), np.float32)
    rc = lib.bilinear_resize_hwc(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), ih, iw, c,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), oh, ow,
        int(bool(align_corners)))
    return out if rc == 0 else None
