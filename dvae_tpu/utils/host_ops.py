"""ctypes bindings for the native host-metric kernels (native/host_ops.cpp).

Loads ``native/libhost_ops.so``, building it with ``make`` on first use if
the toolchain is available.  Everything degrades gracefully: callers check
``available()`` and fall back to the numpy implementations in
dvae_tpu/eval/metrics.py.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libhost_ops.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        # always invoke make: a no-op when the checked-in .so is current,
        # a rebuild when host_ops.cpp is newer (e.g. after a pull)
        subprocess.run(["make", "-C", _NATIVE_DIR, "-s"], check=True,
                       capture_output=True, timeout=120)
    except Exception:
        if not os.path.exists(_SO_PATH):
            return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        return None
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    lib.confmat.argtypes = [i64p, i64p, ctypes.c_int64, ctypes.c_int64, f64p]
    lib.confmat.restype = None
    lib.confmat_normalize_inplace.argtypes = [f64p, ctypes.c_int64]
    lib.confmat_normalize_inplace.restype = None
    lib.pairwise_consensus.argtypes = [i64p, ctypes.c_int64, ctypes.c_int64,
                                       ctypes.c_int64, f64p]
    lib.pairwise_consensus.restype = ctypes.c_double
    lib.per_category_agreement.argtypes = [i64p, ctypes.c_int64,
                                           ctypes.c_int64, ctypes.c_int64,
                                           f64p]
    lib.per_category_agreement.restype = None
    if hasattr(lib, "emi_binary"):   # absent in pre-round-2 .so builds
        lib.emi_binary.argtypes = [i64p, ctypes.c_int64, i64p,
                                   ctypes.c_int64, ctypes.c_int64, f64p]
        lib.emi_binary.restype = None
    if hasattr(lib, "gather_rows_bytes"):  # absent in pre-round-5 builds
        lib.gather_rows_bytes.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, i64p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int]
        lib.gather_rows_bytes.restype = None
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        lib.gather_cast_f32_bf16.argtypes = [
            f32p, ctypes.c_int64, i64p, ctypes.c_int64, ctypes.c_void_p,
            ctypes.c_int]
        lib.gather_cast_f32_bf16.restype = None
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def confmat(l1: np.ndarray, l2: np.ndarray, K: int) -> np.ndarray:
    lib = _load()
    l1 = np.ascontiguousarray(l1, np.int64)
    l2 = np.ascontiguousarray(l2, np.int64)
    if len(l1) != len(l2):
        # the C kernel reads n entries of BOTH buffers; a mismatch would be
        # an out-of-bounds heap read, not a clean error
        raise ValueError(f"label length mismatch: {len(l1)} vs {len(l2)}")
    out = np.zeros((K, K), np.float64)
    lib.confmat(l1, l2, len(l1), K, out)
    return out


def confmat_normalize(cm: np.ndarray) -> np.ndarray:
    lib = _load()
    out = np.ascontiguousarray(cm, np.float64).copy()
    lib.confmat_normalize_inplace(out, out.shape[0])
    return out


def pairwise_consensus(labels: np.ndarray, K: int):
    """(mean_consensus, (A, A) score matrix) for (A, N) integer labels."""
    lib = _load()
    labels = np.ascontiguousarray(labels, np.int64)
    A, N = labels.shape
    scores = np.zeros((A, A), np.float64)
    mean = lib.pairwise_consensus(labels, A, N, K, scores)
    return float(mean), scores


def per_category_agreement(labels: np.ndarray, K: int) -> np.ndarray:
    lib = _load()
    labels = np.ascontiguousarray(labels, np.int64)
    A, N = labels.shape
    out = np.zeros(K, np.float64)
    lib.per_category_agreement(labels, A, N, K, out)
    return out


def has_emi() -> bool:
    lib = _load()
    return lib is not None and hasattr(lib, "emi_binary")


def has_gather() -> bool:
    lib = _load()
    return lib is not None and hasattr(lib, "gather_rows_bytes")


def gather_rows(src: np.ndarray, sel: np.ndarray,
                out_dtype=None, n_threads: int = 0):
    """Threaded batch gather ``src[sel]`` (+ fused f32→bf16 cast) for the
    streaming feed path — or None when the native path doesn't apply
    (caller falls back to numpy fancy-indexing).

    Handled: 2-D C-contiguous dense ``src`` with either no dtype change
    (row memcpy, any itemsize) or an f32 source with a bfloat16 target
    (single fused pass — numpy pays a full gather into an f32 temporary
    and then a second cast pass).  ``n_threads`` 0 = hardware concurrency.
    """
    lib = _load()
    if (lib is None or not hasattr(lib, "gather_rows_bytes")
            or not isinstance(src, np.ndarray) or src.ndim != 2
            or not src.flags.c_contiguous):
        return None
    out_dtype = src.dtype if out_dtype is None else np.dtype(out_dtype)
    sel = np.ascontiguousarray(sel, np.int64)
    B, D = len(sel), src.shape[1]
    if out_dtype == src.dtype:
        # pure row copy only pays off with threads: single-core memcpy
        # loses to numpy's fancy-index (measured 0.82x at (5000, 5032)
        # f32 on this host); the fused-cast path below wins even alone
        if (os.cpu_count() or 1) <= 1 and n_threads <= 1:
            return None
        out = np.empty((B, D), src.dtype)
        row_bytes = D * src.dtype.itemsize
        lib.gather_rows_bytes(src.ctypes.data, row_bytes, sel, B,
                              out.ctypes.data, n_threads)
        return out
    if src.dtype == np.float32 and out_dtype.name == "bfloat16":
        out = np.empty((B, D), out_dtype)
        lib.gather_cast_f32_bf16(src, D, sel, B, out.ctypes.data, n_threads)
        return out
    return None


def emi_binary(tf: np.ndarray, pc: np.ndarray, N: int) -> np.ndarray:
    """(F, C) expected MI of the 2x2 contingency tables with marginals
    (tf[f], pc[c]) over N samples — the E[MI] term of the AMI."""
    lib = _load()
    tf = np.ascontiguousarray(tf, np.int64)
    pc = np.ascontiguousarray(pc, np.int64)
    out = np.zeros((len(tf), len(pc)), np.float64)
    lib.emi_binary(tf, len(tf), pc, len(pc), N, out)
    return out
