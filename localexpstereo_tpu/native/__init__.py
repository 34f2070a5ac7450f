"""Native (C++) helpers, loaded via ctypes.

Ships two components, compiled on demand with ``g++ -O2`` and cached next to
the sources:

- a from-scratch Dinic max-flow min-cut used as an independent oracle for
  the TPU push-relabel kernel (the reference instead vendors the external BK
  maxflow library, ``maxflow/README.TXT``);
- a threaded ``.acrt`` cost-volume loader (``loader.cpp``) fusing parallel
  pread with the out-of-view fill / L->R recovery (``main.cpp:146-199``),
  replacing the reference's single-threaded fread + loops for the ~1.2 GB
  MiddV3 volumes.
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
    srcs = [os.path.join(_DIR, "maxflow.cpp"),
            os.path.join(_DIR, "loader.cpp")]
    lib_path = os.path.join(_DIR, "libnative.so")

    def _stale():
        return (not os.path.exists(lib_path)
                or any(os.path.getmtime(lib_path) < os.path.getmtime(s)
                       for s in srcs))

    if _stale():
        # Multiprocess-safe rebuild (parallel pytest workers import this
        # concurrently): serialize via an flock, re-check staleness under
        # it, compile to a temp name, and publish with an atomic rename so
        # a concurrent dlopen never sees a half-written .so.
        import fcntl
        import tempfile
        with open(lib_path + ".lock", "w") as lk:
            fcntl.flock(lk, fcntl.LOCK_EX)
            if _stale():
                fd, tmp = tempfile.mkstemp(dir=_DIR, suffix=".so.tmp")
                os.close(fd)
                try:
                    subprocess.run(
                        ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
                         *srcs, "-o", tmp, "-lpthread"],
                        check=True, capture_output=True)
                    os.replace(tmp, lib_path)
                finally:
                    if os.path.exists(tmp):
                        os.unlink(tmp)
    lib = ctypes.CDLL(lib_path)
    lib.grid_mincut.restype = ctypes.c_double
    lib.grid_mincut.argtypes = [
        ctypes.c_int,
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
    ]
    lib.read_acrt_fill.restype = ctypes.c_int
    lib.read_acrt_fill.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int,
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
    ]
    lib.convert_l2r_fill.restype = None
    lib.convert_l2r_fill.argtypes = [
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
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


def read_acrt_fill(path: str, ndisp: int, height: int, width: int,
                   fill_mode: int = -1, threads: int = 0) -> np.ndarray:
    """Parallel .acrt read with fused out-of-view fill (-1 = no fill).

    Equivalent to ``acrt.read_acrt`` + ``acrt.fill_out_of_view`` (margin 0)
    but multithreaded (defaults to the CPU count)."""
    if threads <= 0:
        threads = os.cpu_count() or 8
    out = np.empty((ndisp, height, width), np.float32)
    rc = get_lib().read_acrt_fill(path.encode(), ndisp, height, width,
                                  fill_mode, threads, out)
    if rc == -1:
        raise FileNotFoundError(path)
    if rc != 0:
        raise IOError(f"{path}: short read (expected "
                      f"[{ndisp},{height},{width}] float32)")
    return out


def convert_l2r_fill(vol_l: np.ndarray, threads: int = 0) -> np.ndarray:
    """Fused L->R volume recovery + right-view fill (margin 0), threaded.

    Equivalent to ``acrt.convert_volume_l2r`` + ``fill_out_of_view(.., 1)``.
    """
    if threads <= 0:
        threads = os.cpu_count() or 8
    d, h, w = vol_l.shape
    vol_l = np.ascontiguousarray(vol_l, np.float32)
    out = np.empty_like(vol_l)
    get_lib().convert_l2r_fill(vol_l, d, h, w, threads, out)
    return out
