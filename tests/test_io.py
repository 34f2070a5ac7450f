"""IO codec tests: PFM round-trip + exact header, acrt volume ops, datasets."""
import io
import numpy as np
import pytest

from localexpstereo_tpu.utils import acrt, calib, datasets, pfm


def test_pfm_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.standard_normal((13, 17)).astype(np.float32)
    p = str(tmp_path / "x.pfm")
    pfm.write_pfm(p, img)
    back = pfm.read_pfm(p)
    np.testing.assert_array_equal(back, img)


def test_pfm_header_bit_exact(tmp_path):
    """The writer must emit the reference's exact header bytes
    (Utilities.hpp:98: 'Pf\\n%d %d\\n%lf\\n' with scale -1/255)."""
    img = np.zeros((2, 3), np.float32)
    p = str(tmp_path / "x.pfm")
    pfm.write_pfm(p, img)
    data = open(p, "rb").read()
    assert data.startswith(b"Pf\n3 2\n-0.003922\n")
    assert len(data) == len(b"Pf\n3 2\n-0.003922\n") + 2 * 3 * 4


def test_pfm_rows_bottom_up(tmp_path):
    img = np.arange(6, dtype=np.float32).reshape(2, 3)
    p = str(tmp_path / "x.pfm")
    pfm.write_pfm(p, img)
    payload = open(p, "rb").read()[-24:]
    rows = np.frombuffer(payload, "<f4").reshape(2, 3)
    np.testing.assert_array_equal(rows[0], img[1])  # last image row first
    np.testing.assert_array_equal(rows[1], img[0])


def test_pfm_big_endian_read(tmp_path):
    img = np.arange(6, dtype=np.float32).reshape(2, 3)
    p = str(tmp_path / "be.pfm")
    with open(p, "wb") as f:
        f.write(b"Pf\n3 2\n1.000000\n")
        f.write(np.ascontiguousarray(img[::-1], dtype=">f4").tobytes())
    np.testing.assert_array_equal(pfm.read_pfm(p), img)


def test_acrt_roundtrip(tmp_path):
    vol = np.random.default_rng(1).random((4, 5, 6)).astype(np.float32)
    p = str(tmp_path / "v.acrt")
    acrt.write_acrt(p, vol)
    np.testing.assert_array_equal(acrt.read_acrt(p, 4, 5, 6), vol)


def test_fill_out_of_view_left():
    """vol[d,y,x] = vol[d,y,d] for x < d (main.cpp:152-163)."""
    D, H, W = 4, 2, 6
    vol = np.arange(D * H * W, dtype=np.float32).reshape(D, H, W)
    out = acrt.fill_out_of_view(vol, mode=0)
    for d in range(D):
        for y in range(H):
            np.testing.assert_array_equal(out[d, y, :d], vol[d, y, d])
            np.testing.assert_array_equal(out[d, y, d:], vol[d, y, d:])


def test_fill_out_of_view_right():
    D, H, W = 4, 2, 6
    vol = np.arange(D * H * W, dtype=np.float32).reshape(D, H, W)
    out = acrt.fill_out_of_view(vol, mode=1)
    for d in range(D):
        for y in range(H):
            if d > 0:
                np.testing.assert_array_equal(out[d, y, W - d:],
                                              vol[d, y, W - d - 1])
            np.testing.assert_array_equal(out[d, y, :W - d], vol[d, y, :W - d])


def test_convert_volume_l2r():
    """volR[d,y,x] = volL[d,y,x+d] with edge replication (main.cpp:178-199)."""
    D, H, W = 3, 2, 5
    vol = np.random.default_rng(2).random((D, H, W)).astype(np.float32)
    out = acrt.convert_volume_l2r(vol)
    for d in range(D):
        for x in range(W):
            src_x = x + d
            expect = vol[d, :, src_x] if src_x < W - 1 else vol[d, :, W - 1]
            np.testing.assert_array_equal(out[d, :, x], expect)


def test_parse_info(tmp_path):
    p = tmp_path / "info.txt"
    p.write_text("4\n59\n")
    assert calib.parse_info(str(p)) == (4, 59)


def test_parse_calib(tmp_path):
    p = tmp_path / "calib.txt"
    p.write_text(
        "cam0 = [2852.758 0 1424.085; 0 2852.758 953.053; 0 0 1]\n"
        "cam1 = [2852.758 0 1549.445; 0 2852.758 953.053; 0 0 1]\n"
        "doffs = 125.36\nbaseline = 178.089\nwidth = 2828\nheight = 1924\n"
        "ndisp = 260\nisint = 0\nvmin = 36\nvmax = 218\n"
        "dyavg = 0.408\ndymax = 1.923\n")
    c = calib.parse_calib(str(p))
    assert c.ndisp == 260 and c.width == 2828 and c.height == 1924
    assert abs(c.doffs - 125.36) < 1e-5
    assert c.cam0[0] == pytest.approx(2852.758)


def test_load_cones(cones_dir):
    pair = datasets.load_data(cones_dir)
    assert pair.ndisp == 59  # info.txt: scale 4, ndisp 59
    assert pair.im0.dtype == np.float32
    assert pair.im0.shape == pair.im1.shape
    assert pair.im0.shape[2] == 3
    assert pair.im0.max() > 1.5  # 0..255 scale, not normalized
    assert pair.disp_gt.shape == pair.im0.shape[:2]
    # GT intensities divided by 4; unknown (0) mapped to +inf
    finite = np.isfinite(pair.disp_gt)
    assert finite.any()
    assert pair.disp_gt[finite].max() <= 255.0 / 4
    assert pair.nonocc.dtype == bool
