"""Multi-scale region grid with 16-color disjoint scheduling.

TPU-native equivalent of the reference's ``LayerManager`` (``LayerManager.h``):
instead of per-region ``cv::Rect`` crops of varying sizes, every layer has
FIXED window sizes (required for XLA static shapes):

- unit window   ``s x s``          (cell; clipped part handled by masks)
- shared window ``3s x 3s``        (move/graph-cut domain)
- filter window ``3s + 2R``        (cost aggregation domain)

Cells are ``ceil(W/s) x ceil(H/s)``; cells on the right/bottom edge are
clipped by the in-image mask rather than merged (the reference's merge rule,
``LayerManager.h:88-165``, exists only to avoid tiny ragged cells — masking
achieves the same without dynamic shapes).

Regions are grouped into the 16 disjoint color sets ``(i % 4) * 4 + (j % 4)``
(``LayerManager.h:168-173``). The cells of one color form a REGULAR grid with
stride 4s, and their 3s shared windows are separated by s — so a whole color
set updates as one dense canvas ``[nby * 4s, nbx * 4s]`` written with a single
``dynamic_update_slice`` (no scatters, no collisions). Every color of a layer
is padded to the same ``(nby_max, nbx_max)`` so a layer compiles exactly once.
"""
from __future__ import annotations

import dataclasses
from typing import List, Tuple

import numpy as np


@dataclasses.dataclass(frozen=True)
class Layer:
    """Static geometry of one expansion layer."""

    unit_size: int               # s
    width_blocks: int            # ceil(W / s)
    height_blocks: int           # ceil(H / s)
    nbx: int                     # max cells of one color along x = ceil(wb/4)
    nby: int                     # max cells of one color along y

    @property
    def shared_size(self) -> int:
        return 3 * self.unit_size

    def filter_size(self, window_radius: int) -> int:
        return 3 * self.unit_size + 2 * window_radius

    @property
    def num_regions(self) -> int:
        """Regions per (padded) color set."""
        return self.nbx * self.nby

    @property
    def colors(self) -> List[Tuple[int, int]]:
        """(i0, j0) color offsets that contain at least one cell, in the
        reference's scheduling order j = (i%4)*4 + (j%4)."""
        out = []
        for i0 in range(min(4, self.height_blocks)):
            for j0 in range(min(4, self.width_blocks)):
                out.append((i0, j0))
        return out

    def color_regions(self, i0: int, j0: int):
        """Region origins of color (i0, j0), padded to ``num_regions``.

        Returns:
          ox, oy: [N] int32 global coords of each region's UNIT origin,
          mask:   [N] bool, False for grid slots beyond the image.
        """
        s = self.unit_size
        ks = np.arange(self.nbx)
        ms = np.arange(self.nby)
        jj = j0 + 4 * ks                      # cell column indices
        ii = i0 + 4 * ms
        ox = (jj[None, :] * s).repeat(self.nby, 0)
        oy = (ii[:, None] * s).repeat(self.nbx, 1)
        mask = ((jj[None, :] < self.width_blocks)
                & (ii[:, None] < self.height_blocks))
        return (ox.reshape(-1).astype(np.int32),
                oy.reshape(-1).astype(np.int32), mask.reshape(-1))

    def canvas_origin(self, i0: int, j0: int):
        """Unpadded global coords of the color's update canvas top-left: the
        canvas tiles the shared windows (each 3s with an s gap) starting one
        cell above/left of the color's first cell."""
        s = self.unit_size
        return (j0 - 1) * s, (i0 - 1) * s

    @property
    def canvas_shape(self):
        t = 4 * self.unit_size
        return self.nby * t, self.nbx * t


def build_layer(width: int, height: int, unit_size: int) -> Layer:
    s = int(unit_size)
    assert s >= 1
    wb = -(-width // s)
    hb = -(-height // s)
    return Layer(unit_size=s, width_blocks=wb, height_blocks=hb,
                 nbx=-(-wb // 4), nby=-(-hb // 4))


def build_layers(width: int, height: int, unit_sizes) -> List[Layer]:
    return [build_layer(width, height, s) for s in unit_sizes]


def required_volume_padding(width: int, height: int, unit_sizes,
                            guided_radius: int) -> int:
    """Spatial zero padding of the cost volume so every color's filter-window
    bounding block (see ``ops.windows``) slices in-bounds: block origins
    reach ``-s - r`` (top-left) and block ends reach ``4s * nb + s + r``
    (bottom-right) in image coordinates."""
    r = guided_radius
    vp = 0
    for s in unit_sizes:
        ly = build_layer(width, height, int(s))
        vp = max(vp, s + r,
                 4 * s * ly.nby + s + r - height,
                 4 * s * ly.nbx + s + r - width)
    return int(vp)


def _f32_tile_pad_ratio(ss: int) -> float:
    """Padded/logical element ratio of an ``[.., ss, ss]`` f32 plane on the
    (8, 128) VMEM tile — the footprint every [B, S, S] min-cut plane pays."""
    return (-(-ss // 8) * 8) * (-(-ss // 128) * 128) / float(ss * ss)


def lane_friendly_unit(s: int, *, max_shrink: int = 7,
                       min_gain: float = 1.5) -> int:
    """Round a requested unit size DOWN (by at most ``max_shrink``) so the
    3s x 3s shared window wastes less of the f32 VMEM tile, but only when
    the padding ratio improves by at least ``min_gain``.

    The reference's layer sizes are width-fraction heuristics
    (``main.cpp:395-397``: ``int(w * 0.01 / 0.03 / 0.09)``), so a few
    pixels of cell size carry no semantic weight — but the fused min-cut
    kernel's [B, S, S] solver planes pad S to the (8, 128) f32 tile, so
    S = 3*43 = 129 pads 2.09x while S = 126 pads 1.03x.

    The ``min_gain`` threshold encodes the hardware A/B
    (``tools/ab_lane_sizes.py``, v5e, MiddV3 halfH): 43 -> 42 sped the
    layer's GC sweep 1.22x (gain 2.03x), while 129 -> 128 (gain only
    1.34x) REGRESSED the greedy sweep 0.84x — the slab-hoist unary has
    its own tiling preferences, so only clear min-cut-padding wins are
    taken."""
    s = int(s)
    best, best_ratio = s, _f32_tile_pad_ratio(3 * s)
    base_ratio = best_ratio
    for cand in range(max(1, s - max_shrink), s):
        r = _f32_tile_pad_ratio(3 * cand)
        if r < best_ratio - 1e-9:
            best_ratio, best = r, cand
    if base_ratio / best_ratio >= min_gain:
        return best
    return s


def required_padding(unit_sizes, window_radius: int) -> int:
    """Margin for the padded global arrays: the update canvas of the largest
    layer can extend up to ~6s beyond the image on the right/bottom, and
    filter windows need s + R + 1 on the left/top."""
    s_max = max(unit_sizes)
    return max(6 * s_max, 2 * s_max + window_radius + 2)
