"""Native (C++) helpers, loaded via ctypes.

Currently ships a from-scratch Dinic max-flow min-cut used as an independent
oracle for the TPU push-relabel kernel (the reference instead vendors the
external BK maxflow library, ``maxflow/README.TXT``). Compiled on demand with
``g++ -O2`` and cached next to the source.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None


def _build_and_load() -> ctypes.CDLL:
    src = os.path.join(_DIR, "maxflow.cpp")
    lib_path = os.path.join(_DIR, "libnative.so")
    if (not os.path.exists(lib_path)
            or os.path.getmtime(lib_path) < os.path.getmtime(src)):
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", src, "-o",
             lib_path],
            check=True, capture_output=True)
    lib = ctypes.CDLL(lib_path)
    lib.grid_mincut.restype = ctypes.c_double
    lib.grid_mincut.argtypes = [
        ctypes.c_int,
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
    ]
    return lib


def get_lib() -> ctypes.CDLL:
    global _LIB
    with _LOCK:
        if _LIB is None:
            _LIB = _build_and_load()
        return _LIB


def grid_mincut_oracle(excess: np.ndarray, cap_t: np.ndarray,
                       cap_fw: np.ndarray):
    """Exact min-cut of one grid region via Dinic (test oracle).

    Args:
      excess: [S, S] float32 source capacities (after terminal folding).
      cap_t:  [S, S] float32 sink capacities.
      cap_fw: [4, S, S] float32 forward-edge capacities in mincut.EDGE_DIRS
        order.
    Returns:
      (accept [S, S] bool, flow value).
    """
    s = excess.shape[0]
    accept = np.zeros(s * s, np.uint8)
    flow = get_lib().grid_mincut(
        s, np.ascontiguousarray(excess.reshape(-1), np.float32),
        np.ascontiguousarray(cap_t.reshape(-1), np.float32),
        np.ascontiguousarray(cap_fw.reshape(4, -1), np.float32), accept)
    return accept.reshape(s, s).astype(bool), float(flow)
