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

Regions are grouped into the same 16 disjoint color sets
``(i % 4) * 4 + (j % 4)`` (``LayerManager.h:168-173``): same-color shared
windows are 4s apart and 3s wide, hence always >= s apart — scatters never
collide, which is what makes one color = one batched device dispatch.
"""
from __future__ import annotations

import dataclasses
from typing import List

import numpy as np


@dataclasses.dataclass(frozen=True)
class Layer:
    """Static geometry of one expansion layer."""

    unit_size: int               # s
    shared_size: int             # 3s
    filter_size: int             # 3s + 2R
    width_blocks: int
    height_blocks: int
    # Per color set c (always padded to `max_per_color` with mask=False):
    #   origins[c]: [N, 2] int32 (x, y) of the UNIT window's top-left,
    #   mask[c]:    [N] bool, True for real regions.
    color_origins: tuple         # tuple of np.ndarray [N, 2]
    color_mask: tuple            # tuple of np.ndarray [N]
    proposers: tuple = ()        # attached by the engine (names)

    @property
    def num_colors(self) -> int:
        return len(self.color_origins)


def build_layer(width: int, height: int, unit_size: int,
                window_radius: int) -> Layer:
    """Builds the region grid for one layer (cf. ``LayerManager::addLayer``)."""
    s = int(unit_size)
    assert s >= 1
    wb = -(-width // s)
    hb = -(-height // s)

    buckets: List[List[tuple]] = [[] for _ in range(16)]
    for i in range(hb):
        for j in range(wb):
            buckets[(i % 4) * 4 + (j % 4)].append((j * s, i * s))

    buckets = [b for b in buckets if b]
    max_n = max(len(b) for b in buckets)
    origins, masks = [], []
    for b in buckets:
        arr = np.zeros((max_n, 2), np.int32)
        msk = np.zeros(max_n, bool)
        arr[:len(b)] = np.asarray(b, np.int32)
        msk[:len(b)] = True
        origins.append(arr)
        masks.append(msk)

    return Layer(
        unit_size=s,
        shared_size=3 * s,
        filter_size=3 * s + 2 * window_radius,
        width_blocks=wb,
        height_blocks=hb,
        color_origins=tuple(origins),
        color_mask=tuple(masks),
    )


def build_layers(width: int, height: int, unit_sizes: List[int],
                 window_radius: int) -> List[Layer]:
    return [build_layer(width, height, s, window_radius) for s in unit_sizes]


def required_padding(layers: List[Layer], window_radius: int) -> int:
    """Margin needed so every shared/filter window slice of every layer stays
    in bounds of the padded global arrays (+1 for the pairwise halo)."""
    return max(l.unit_size for l in layers) + window_radius + 1
