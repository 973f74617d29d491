"""Native host-runtime kernels (C++ via ctypes).

Compiles ``fastrec.cpp`` on first use with the system ``g++`` (cached as a
shared object next to the source; rebuilt when the source changes) and
exposes the hot host-side loops:

* ``neg_sample`` — per-row rejection sampling against a sorted positive-key
  set (the per-epoch pairwise sampler's fast mode);
* ``history_matrix`` — preceding-event history arrays (the offline
  pipeline's heaviest pass), bit-identical to the numpy implementation.

Falls back silently (``AVAILABLE = False``) when no compiler is present;
callers keep the numpy paths.
"""

from __future__ import annotations

import ctypes
import hashlib
import logging
import os
import subprocess
import threading
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)

_SRC = os.path.join(os.path.dirname(__file__), "fastrec.cpp")
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

AVAILABLE = None  # resolved lazily


def _build_and_load() -> Optional[ctypes.CDLL]:
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    cache_dir = os.environ.get(
        "PYTORCHREC_TPU_NATIVE_CACHE", os.path.join(os.path.dirname(_SRC), "_build")
    )
    os.makedirs(cache_dir, exist_ok=True)
    so_path = os.path.join(cache_dir, f"fastrec_{digest}.so")
    if not os.path.exists(so_path):
        cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", so_path]
        logger.info("building native kernels: %s", " ".join(cmd))
        subprocess.run(cmd, check=True, capture_output=True)
    lib = ctypes.CDLL(so_path)
    lib.fastrec_neg_sample.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.c_uint64, ctypes.POINTER(ctypes.c_int32),
    ]
    lib.fastrec_history.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int32, ctypes.POINTER(ctypes.c_int32),
    ]
    return lib


def _lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED, AVAILABLE
    if _TRIED:
        return _LIB
    with _LOCK:
        if _TRIED:
            return _LIB
        try:
            _LIB = _build_and_load()
            AVAILABLE = True
        except (OSError, subprocess.CalledProcessError, FileNotFoundError) as e:
            logger.warning("native kernels unavailable, using numpy fallbacks: %s", e)
            _LIB = None
            AVAILABLE = False
        _TRIED = True
    return _LIB


def available() -> bool:
    return _lib() is not None


def _as_c(array: np.ndarray, ctype):
    return array.ctypes.data_as(ctypes.POINTER(ctype))


def neg_sample(uids: np.ndarray, lo: int, hi: int, pos_keys_sorted: np.ndarray,
               seed: int) -> np.ndarray:
    """Per-row negative iid in [lo, hi) avoiding (uid*hi + iid) in pos_keys."""
    lib = _lib()
    assert lib is not None, "native kernels unavailable"
    uids = np.ascontiguousarray(uids, dtype=np.int32)
    pos_keys_sorted = np.ascontiguousarray(pos_keys_sorted, dtype=np.int64)
    out = np.empty(len(uids), dtype=np.int32)
    lib.fastrec_neg_sample(
        _as_c(uids, ctypes.c_int32), len(uids), lo, hi,
        _as_c(pos_keys_sorted, ctypes.c_int64), len(pos_keys_sorted),
        ctypes.c_uint64(seed), _as_c(out, ctypes.c_int32),
    )
    return out


def history_matrix(uids: np.ndarray, iids: np.ndarray, event_mask: np.ndarray,
                   k: int, inclusive: bool) -> np.ndarray:
    """Bit-identical to data/process/history._history_matrix (numpy oracle)."""
    lib = _lib()
    assert lib is not None, "native kernels unavailable"
    n = len(uids)
    # the C++ loop needs (uid-stable) ordering; sort/unsort like the oracle
    order = np.argsort(uids, kind="stable")
    inv_order = np.argsort(order, kind="stable")
    s_uids = np.ascontiguousarray(uids[order], dtype=np.int32)
    s_iids = np.ascontiguousarray(iids[order], dtype=np.int32)
    s_mask = np.ascontiguousarray(event_mask[order], dtype=np.uint8)
    out = np.empty((n, k + 1), dtype=np.int32)
    lib.fastrec_history(
        _as_c(s_uids, ctypes.c_int32), _as_c(s_iids, ctypes.c_int32),
        _as_c(s_mask, ctypes.c_uint8), n, k, int(inclusive),
        _as_c(out, ctypes.c_int32),
    )
    return out[inv_order]
