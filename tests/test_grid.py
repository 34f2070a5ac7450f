"""Region-grid invariants — the by-construction race-safety of the 16-color
schedule (the reference relies on the same invariant for OpenMP safety,
LayerManager.h:168-182; here it guarantees collision-free canvas updates)."""
import numpy as np
import pytest

from localexpstereo_tpu.models import grid


@pytest.mark.parametrize("w,h,s", [(64, 48, 4), (100, 70, 7), (31, 90, 5),
                                   (1436, 992, 129)])
def test_same_color_shared_windows_disjoint(w, h, s):
    layer = grid.build_layer(w, h, s)
    for i0, j0 in layer.colors:
        ox, oy, mask = layer.color_regions(i0, j0)
        pts = [(x, y) for x, y, m in zip(ox, oy, mask) if m]
        ss = layer.shared_size
        for a in range(len(pts)):
            for b in range(a + 1, len(pts)):
                dx = abs(pts[a][0] - pts[b][0])
                dy = abs(pts[a][1] - pts[b][1])
                # shared windows start at origin - s and are 3s wide
                assert dx >= ss + s or dy >= ss + s or (dx >= 4 * s
                                                        and dy == 0) \
                    or (dy >= 4 * s), (pts[a], pts[b])
                assert dx >= 4 * s or dy >= 4 * s


def test_unit_cells_tile_image():
    w, h, s = 50, 34, 6
    layer = grid.build_layer(w, h, s)
    covered = np.zeros((h, w), int)
    for i0, j0 in layer.colors:
        ox, oy, mask = layer.color_regions(i0, j0)
        for x, y, m in zip(ox, oy, mask):
            if not m:
                continue
            covered[y:min(y + s, h), x:min(x + s, w)] += 1
    assert (covered == 1).all()


def test_canvas_contains_all_shared_windows():
    w, h, s = 40, 28, 4
    layer = grid.build_layer(w, h, s)
    ch, cw = layer.canvas_shape
    for i0, j0 in layer.colors:
        cox, coy = layer.canvas_origin(i0, j0)
        ox, oy, mask = layer.color_regions(i0, j0)
        for k, (x, y, m) in enumerate(zip(ox, oy, mask)):
            # region k's shared window [x-s, x+2s) must land at canvas tile
            # (k // nbx, k % nbx) * 4s
            ty, tx = divmod(k, layer.nbx)
            assert x - s - cox == tx * 4 * s
            assert y - s - coy == ty * 4 * s
            assert x - s - cox + 3 * s <= cw
            assert y - s - coy + 3 * s <= ch


def test_required_padding_covers_slices():
    for sizes, r in [([5, 15, 25], 20), ([14, 43, 129], 20), ([4], 4)]:
        pad = grid.required_padding(sizes, r)
        s_max = max(sizes)
        assert pad >= s_max + r + 1          # filter slice left/top
        assert pad >= 6 * s_max or pad >= 2 * s_max + r + 2


def test_lane_friendly_unit():
    """Rounding rule matches the hardware A/B (tools/ab_lane_sizes.py):
    halfH sizes [14, 43, 129] -> [14, 42, 129] — only the 3s = 129 window
    (2.09x f32-tile padding) clears the 1.5x-gain bar; 3s = 387 (1.34x)
    and small windows (lanes always pad to 128, so the LARGEST s in range
    already minimizes waste) stay unchanged."""
    assert grid.lane_friendly_unit(43) == 42
    for s in (1, 5, 14, 15, 25, 129):
        assert grid.lane_friendly_unit(s) == s
    # Never grows, never shrinks past the cap, always >= 1.
    for s in range(1, 200):
        s2 = grid.lane_friendly_unit(s)
        assert 1 <= s2 <= s and s - s2 <= 7
        # When it does shrink, the padding ratio strictly improves >= 1.5x.
        if s2 != s:
            assert (grid._f32_tile_pad_ratio(3 * s)
                    / grid._f32_tile_pad_ratio(3 * s2)) >= 1.5
