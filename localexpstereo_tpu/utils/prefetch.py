"""Background data prefetcher for multi-pair (batch) runs.

The reference processes one pair per process and pays the full load time of
each ~1.2 GB MiddV3 volume up front (``main.cpp:353-368``). For batched /
sequential TPU runs the loader here overlaps the NEXT pair's disk IO and
preprocessing with the CURRENT pair's solve: a bounded background thread
pool walks the dataset list one item ahead, using the threaded C++ loader
(``native/loader.cpp``) for volumes when available.
"""
from __future__ import annotations

import os
import queue
import threading
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

from . import acrt, datasets


def _load_volumes(target_dir: str, ndisp: int, h: int, w: int):
    p0 = os.path.join(target_dir, "im0.acrt")
    p1 = os.path.join(target_dir, "im1.acrt")
    if not os.path.exists(p0):
        raise FileNotFoundError(p0)
    # Probe the native loader's availability SEPARATELY from reading the
    # data file: its on-demand build can fail with FileNotFoundError
    # (missing g++) or CalledProcessError (compile error), neither of which
    # means the .acrt is unreadable — fall back to the numpy codec then.
    lib = None
    try:
        from .. import native
        lib = native.get_lib()
    except Exception:
        lib = None
    if lib is not None:
        from .. import native
        vol_l = native.read_acrt_fill(p0, ndisp, h, w, fill_mode=0)
        if os.path.exists(p1):
            vol_r = native.read_acrt_fill(p1, ndisp, h, w, fill_mode=1)
        else:
            vol_r = native.convert_l2r_fill(vol_l)
        return vol_l, vol_r
    vol_l = acrt.fill_out_of_view(
        acrt.read_acrt(p0, ndisp, h, w), 0)
    if os.path.exists(p1):
        vol_r = acrt.read_acrt(p1, ndisp, h, w)
    else:
        vol_r = acrt.convert_volume_l2r(vol_l)
    return vol_l, acrt.fill_out_of_view(vol_r, 1)


class PairPrefetcher:
    """Iterates (StereoPair, vol_l, vol_r) over dataset directories, loading
    one item ahead on a background thread.

    Args:
      target_dirs: dataset directories (image pair + optional .acrt files).
      ndisp_override: forwarded to ``datasets.load_data``.
      load_volumes: load ``im0.acrt`` (V3 mode); volumes are None otherwise.
      depth: queue depth (items loaded ahead).
    """

    def __init__(self, target_dirs: Sequence[str], ndisp_override: int = 0,
                 load_volumes: bool = False, depth: int = 1):
        self.dirs = list(target_dirs)
        self.ndisp_override = ndisp_override
        self.load_volumes = load_volumes
        self._q: "queue.Queue" = queue.Queue(maxsize=max(depth, 1))
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _worker(self):
        for d in self.dirs:
            try:
                pair = datasets.load_data(d, self.ndisp_override)
                vols: Tuple[Optional[np.ndarray], Optional[np.ndarray]]
                if self.load_volumes:
                    h, w = pair.im0.shape[:2]
                    vols = _load_volumes(d, pair.ndisp, h, w)
                else:
                    vols = (None, None)
                self._q.put((d, pair, vols[0], vols[1]))
            except Exception as e:  # surface on the consumer side
                self._q.put((d, e, None, None))
        self._q.put(None)

    def __iter__(self) -> Iterator:
        while True:
            item = self._q.get()
            if item is None:
                return
            d, pair, vol_l, vol_r = item
            if isinstance(pair, Exception):
                raise RuntimeError(f"prefetch failed for {d}") from pair
            yield d, pair, vol_l, vol_r
