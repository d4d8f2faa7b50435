"""Native (C++) runtime components, bound via ctypes.

The compute path is JAX/XLA/Pallas; these are the host-side hot loops around
it — currently the exact glocal DP (dp.cpp) used by the sequential engine's
extend step and the batch engine's traceback finalization.  The library is
compiled on first use (g++ is part of the toolchain) and cached next to the
sources; everything degrades gracefully to the numpy implementation when a
compiler is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(__file__)
_SOURCE = os.path.join(_HERE, "dp.cpp")
_LIBRARY = os.path.join(_HERE, "libmapperdp.so")

_lock = threading.Lock()
_lib = None
_load_failed = False


def _build() -> bool:
    try:
        subprocess.run(
            [
                "g++",
                "-O3",
                "-march=native",
                "-shared",
                "-fPIC",
                _SOURCE,
                "-o",
                _LIBRARY + ".tmp",
            ],
            check=True,
            capture_output=True,
        )
        os.replace(_LIBRARY + ".tmp", _LIBRARY)
        return True
    except Exception:
        return False


def get_library():
    """The loaded native library, or None when unavailable."""
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    with _lock:
        if _lib is not None or _load_failed:
            return _lib
        if not os.path.exists(_LIBRARY) or os.path.getmtime(_LIBRARY) < os.path.getmtime(
            _SOURCE
        ):
            if not _build():
                _load_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIBRARY)
            lib.mapper_dp_align.restype = ctypes.c_int
            lib.mapper_dp_align.argtypes = [
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_double),
                ctypes.c_int,
                ctypes.c_double,
                ctypes.c_double,
                ctypes.POINTER(ctypes.c_int32),
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_double),
            ]
            _lib = lib
        except Exception:
            _load_failed = True
    return _lib


def native_dp_align(
    q_codes: np.ndarray,
    w_codes: np.ndarray,
    params,
    may_extend: bool,
    max_ins_ext: float,
    max_interesting: float,
):
    """Run the native DP.  Returns (blocks ndarray [k,4] in traceback order
    goal->start, goal_penalty) or None when the library is unavailable.
    Returns ([], goal_penalty) when no goal state fits the budget."""
    lib = get_library()
    if lib is None:
        return None
    q = np.ascontiguousarray(q_codes, dtype=np.uint8)
    w = np.ascontiguousarray(w_codes, dtype=np.uint8)
    params_arr = np.array(
        [
            params.mutation_penalty,
            params.ambiguity_penalty,
            params.insertion_start_penalty,
            params.insertion_extension_penalty,
            params.deletion_start_penalty,
            params.deletion_extension_penalty,
            params.unaligned_penalty,
            params.get_starting_insertion_start_penalty(),
        ],
        dtype=np.float64,
    )
    max_blocks = q.shape[0] + w.shape[0] + 4
    out_blocks = np.zeros((max_blocks, 4), dtype=np.int32)
    goal_penalty = ctypes.c_double(0.0)
    count = lib.mapper_dp_align(
        q.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        q.shape[0],
        w.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        w.shape[0],
        params_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        1 if may_extend else 0,
        float(max_ins_ext),
        float(max_interesting),
        out_blocks.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        max_blocks,
        ctypes.byref(goal_penalty),
    )
    if count == -2:
        return None  # block overflow; numpy path decides
    if count < 0:
        return np.zeros((0, 4), dtype=np.int32), goal_penalty.value
    return out_blocks[:count], goal_penalty.value
