"""Threaded C++ .acrt loader vs the numpy reference codec."""
import os

import numpy as np
import pytest

from localexpstereo_tpu.utils import acrt

try:
    from localexpstereo_tpu import native
    native.get_lib()
    HAVE_NATIVE = True
except Exception:
    HAVE_NATIVE = False

needs_native = pytest.mark.skipif(not HAVE_NATIVE,
                                  reason="native toolchain unavailable")


def _vol(d=7, h=11, w=23, seed=0):
    rng = np.random.default_rng(seed)
    return rng.random((d, h, w)).astype(np.float32)


@needs_native
@pytest.mark.parametrize("mode", [-1, 0, 1])
def test_read_acrt_fill_matches_numpy(tmp_path, mode):
    vol = _vol()
    path = str(tmp_path / "v.acrt")
    acrt.write_acrt(path, vol)
    got = native.read_acrt_fill(path, *vol.shape, fill_mode=mode, threads=3)
    want = vol if mode == -1 else acrt.fill_out_of_view(vol, mode)
    np.testing.assert_array_equal(got, want)


@needs_native
def test_read_acrt_fill_large_d_exceeds_width(tmp_path):
    """d >= W exercises the clamped fill sources."""
    vol = _vol(d=30, h=5, w=9, seed=1)
    path = str(tmp_path / "v.acrt")
    acrt.write_acrt(path, vol)
    for mode in (0, 1):
        got = native.read_acrt_fill(path, *vol.shape, fill_mode=mode)
        np.testing.assert_array_equal(got, acrt.fill_out_of_view(vol, mode))


@needs_native
def test_convert_l2r_fill_matches_numpy():
    vol = _vol(d=16, h=6, w=12, seed=2)
    got = native.convert_l2r_fill(vol, threads=4)
    want = acrt.fill_out_of_view(acrt.convert_volume_l2r(vol), 1)
    np.testing.assert_array_equal(got, want)


@needs_native
def test_read_errors(tmp_path):
    with pytest.raises(FileNotFoundError):
        native.read_acrt_fill(str(tmp_path / "missing.acrt"), 2, 2, 2)
    short = str(tmp_path / "short.acrt")
    with open(short, "wb") as f:
        f.write(b"\x00" * 8)
    with pytest.raises(IOError):
        native.read_acrt_fill(short, 4, 4, 4)


def test_prefetcher_v2_pairs():
    from localexpstereo_tpu.utils.prefetch import PairPrefetcher
    dirs = ["/root/reference/data/MiddV2/tsukuba",
            "/root/reference/data/MiddV2/venus"]
    seen = []
    for d, pair, vol_l, vol_r in PairPrefetcher(dirs):
        assert vol_l is None and vol_r is None
        assert pair.im0.ndim == 3
        seen.append(os.path.basename(d))
    assert seen == ["tsukuba", "venus"]
