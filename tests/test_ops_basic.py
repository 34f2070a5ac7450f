"""Oracle tests for plane ops, pairwise terms, box filter, guided filter."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from localexpstereo_tpu.ops import boxfilter, guided, pairwise, plane


# ---------------------------------------------------------------- plane ----

def test_create_plane_roundtrip():
    key = jax.random.PRNGKey(0)
    n = plane.random_unit_vector(key, np.pi / 3, (32,))
    z = jnp.linspace(1.0, 50.0, 32)
    x = jnp.linspace(0.0, 100.0, 32)
    y = jnp.linspace(0.0, 80.0, 32)
    labels = plane.create_plane(n, z, x, y)
    # Disparity at the anchor point must equal z.
    d = plane.disparity_at(labels, x, y)
    np.testing.assert_allclose(np.asarray(d), np.asarray(z), rtol=2e-5,
                               atol=1e-3)
    # Normal recovered from (a, b) must match the input normal.
    n_back = plane.get_normal(labels)
    np.testing.assert_allclose(np.asarray(n_back), np.asarray(n), rtol=1e-4,
                               atol=1e-4)


def test_random_unit_vector_cone():
    v = plane.random_unit_vector(jax.random.PRNGKey(1), np.pi / 3, (1000,))
    v = np.asarray(v)
    np.testing.assert_allclose(np.linalg.norm(v, axis=-1), 1.0, atol=1e-5)
    assert (v[:, 2] >= np.cos(np.pi / 3) - 1e-6).all()


def test_disparity_map_global_coords():
    lab = jnp.zeros((4, 5, 4)).at[..., 0].set(2.0).at[..., 2].set(1.0)
    d = plane.disparity_map(lab, x0=10, y0=20)
    # d = 2*x + 1 with global x starting at 10
    np.testing.assert_allclose(np.asarray(d[0]), 2.0 * (10 + np.arange(5)) + 1)


# ------------------------------------------------------------- pairwise ----

def _np_smoothness_cost(labeling, image, omega, eps, lam, tau):
    """Naive oracle mirroring StereoEnergy::computeSmoothnessCost_."""
    h, w = labeling.shape[:2]

    def d(lab, x, y):
        return lab[0] * x + lab[1] * y + lab[2]

    total = 0.0
    for y in range(h):
        for x in range(w):
            for dx, dy in [pairwise.NEIGHBORS[k] for k in pairwise.FORWARD]:
                qx, qy = x + dx, y + dy
                if not (0 <= qx < w and 0 <= qy < h):
                    continue
                ls, lt = labeling[y, x], labeling[qy, qx]
                wgt = max(np.exp(-np.abs(image[y, x] - image[qy, qx]).sum()
                                 / omega), eps)
                curv = (abs(d(ls, x, y) - d(lt, x, y))
                        + abs(d(ls, qx, qy) - d(lt, qx, qy)))
                total += wgt * min(curv, tau) * lam
    return total


def test_smoothness_cost_vs_naive_oracle():
    rng = np.random.default_rng(3)
    h, w = 7, 9
    image = rng.random((h, w, 3)).astype(np.float32) * 255
    labeling = rng.standard_normal((h, w, 4)).astype(np.float32)
    omega, eps, lam, tau = 10.0, 0.01, 0.7, 1.0
    coeffs = pairwise.smoothness_coeffs(jnp.asarray(image), omega, eps)
    got = float(pairwise.smoothness_cost(jnp.asarray(labeling), coeffs, lam,
                                         tau))
    want = _np_smoothness_cost(labeling, image, omega, eps, lam, tau)
    assert got == pytest.approx(want, rel=1e-4)


def test_smoothness_coeffs_zero_across_border():
    img = jnp.zeros((4, 6, 3))
    c = pairwise.smoothness_coeffs(img, 10.0, 0.01)
    assert c.shape == (8, 4, 6)
    # Left neighbor invalid in first column, etc.
    assert np.asarray(c[0][:, 0]).max() == 0.0
    assert np.asarray(c[1][:, -1]).max() == 0.0
    assert np.asarray(c[2][0, :]).max() == 0.0
    assert np.asarray(c[3][-1, :]).max() == 0.0
    # Interior weight of a constant image is exp(0) = 1.
    assert np.asarray(c[7][:-1, :-1]).min() == pytest.approx(1.0)


def test_expansion_tables_match_termwise_oracle():
    """cost00/01/10 must equal psi evaluated on the corresponding label
    combos; cost11 would be 0 (identical planes)."""
    rng = np.random.default_rng(4)
    s = 6
    halo = rng.standard_normal((s + 2, s + 2, 4)).astype(np.float32)
    proposal = rng.standard_normal(4).astype(np.float32)
    coeff4 = rng.random((4, s, s)).astype(np.float32)
    ox, oy = 11, 3
    lam, tau = 0.5, 1.0
    c00, c01, c10 = pairwise.expansion_tables(
        jnp.asarray(halo), jnp.asarray(proposal), jnp.asarray(coeff4),
        ox, oy, lam, tau)
    c00, c01, c10 = np.asarray(c00), np.asarray(c01), np.asarray(c10)

    def d(lab, x, y):
        return lab[0] * x + lab[1] * y + lab[2]

    for i, k in enumerate(pairwise.FORWARD):
        dx, dy = pairwise.NEIGHBORS[k]
        for yy in range(s):
            for xx in range(s):
                p_lab = halo[yy + 1, xx + 1]
                q_lab = halo[yy + 1 + dy, xx + 1 + dx]
                px, py = ox + xx, oy + yy
                qx, qy = px + dx, py + dy

                def psi(l0, l1):
                    curv = (abs(d(l0, px, py) - d(l1, px, py))
                            + abs(d(l0, qx, qy) - d(l1, qx, qy)))
                    return coeff4[i, yy, xx] * min(curv, tau) * lam

                assert float(c00[i, yy, xx]) == pytest.approx(
                    psi(p_lab, q_lab), rel=1e-4, abs=1e-5)
                assert float(c01[i, yy, xx]) == pytest.approx(
                    psi(p_lab, proposal), rel=1e-4, abs=1e-5)
                assert float(c10[i, yy, xx]) == pytest.approx(
                    psi(proposal, q_lab), rel=1e-4, abs=1e-5)


def test_boundary_tlinks_oracle():
    rng = np.random.default_rng(5)
    s = 5
    halo = rng.standard_normal((s + 2, s + 2, 4)).astype(np.float32)
    proposal = rng.standard_normal(4).astype(np.float32)
    coeff8 = rng.random((8, s, s)).astype(np.float32)
    ox, oy = 2, 7
    lam, tau = 0.8, 1.0
    t0, t1 = pairwise.boundary_tlinks(jnp.asarray(halo), jnp.asarray(proposal),
                                      jnp.asarray(coeff8), ox, oy, lam, tau)
    t0, t1 = np.asarray(t0), np.asarray(t1)

    def d(lab, x, y):
        return lab[0] * x + lab[1] * y + lab[2]

    for yy in range(s):
        for xx in range(s):
            e0 = e1 = 0.0
            for k, (dx, dy) in enumerate(pairwise.NEIGHBORS):
                qxx, qyy = xx + dx, yy + dy
                if 0 <= qxx < s and 0 <= qyy < s:
                    continue  # interior edge, not a boundary t-link
                q_lab = halo[yy + 1 + dy, xx + 1 + dx]
                px, py = ox + xx, oy + yy
                qx, qy = px + dx, py + dy

                def psi(l0):
                    curv = (abs(d(l0, px, py) - d(q_lab, px, py))
                            + abs(d(l0, qx, qy) - d(q_lab, qx, qy)))
                    return coeff8[k, yy, xx] * min(curv, tau) * lam

                e0 += psi(halo[yy + 1, xx + 1])
                e1 += psi(proposal)
            assert float(t0[yy, xx]) == pytest.approx(e0, rel=1e-4, abs=1e-5)
            assert float(t1[yy, xx]) == pytest.approx(e1, rel=1e-4, abs=1e-5)


# ------------------------------------------------------------ boxfilter ----

def test_boxsum2d_matches_naive():
    rng = np.random.default_rng(6)
    x = rng.random((10, 13)).astype(np.float32)
    r = 3
    got = np.asarray(boxfilter.boxsum2d(jnp.asarray(x), r))
    want = np.zeros_like(x)
    for y in range(10):
        for xx in range(13):
            want[y, xx] = x[max(0, y - r):y + r + 1,
                            max(0, xx - r):xx + r + 1].sum()
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_boxsum2d_batched():
    rng = np.random.default_rng(7)
    x = rng.random((4, 2, 8, 9)).astype(np.float32)
    got = np.asarray(boxfilter.boxsum2d(jnp.asarray(x), 2))
    for i in range(4):
        for j in range(2):
            single = np.asarray(boxfilter.boxsum2d(jnp.asarray(x[i, j]), 2))
            np.testing.assert_allclose(got[i, j], single, rtol=1e-5)


# --------------------------------------------------------------- guided ----

def _np_guided_filter_reference(I255, p, radius, eps, mask=None):
    """Oracle reimplementation of GuidedFilter.h:58-266 on a crop, with the
    crop's own zero-pad box sums and true-count N, but *global* stats passed
    in via closure-free recomputation on the full image (FastGuidedImageFilter
    semantics are tested separately via filter_windows)."""
    I = I255.astype(np.float64) / 255.0
    h, w = p.shape
    box = lambda x: guided._np_boxsum(x, radius)
    if mask is None:
        mask = np.ones((h, w))
    n = box(mask)
    p0 = p * mask
    mean = np.stack([box(I[..., c] * 1.0) / np.maximum(box(np.ones((h, w))),
                                                       1e-12)
                     for c in range(3)], -1)
    # NOTE: this helper only supports mask == all-ones for stats; tests use
    # full-image crops for the oracle and filter_windows for masked cases.
    var = {}
    for name, i, j in [("rr", 0, 0), ("rg", 0, 1), ("rb", 0, 2), ("gg", 1, 1),
                       ("gb", 1, 2), ("bb", 2, 2)]:
        v = box(I[..., i] * I[..., j]) / n - mean[..., i] * mean[..., j]
        if i == j:
            v += eps
        var[name] = v
    inv_rr = var["gg"] * var["bb"] - var["gb"] * var["gb"]
    inv_rg = var["gb"] * var["rb"] - var["rg"] * var["bb"]
    inv_rb = var["rg"] * var["gb"] - var["gg"] * var["rb"]
    inv_gg = var["rr"] * var["bb"] - var["rb"] * var["rb"]
    inv_gb = var["rb"] * var["rg"] - var["rr"] * var["gb"]
    inv_bb = var["rr"] * var["gg"] - var["rg"] * var["rg"]
    det = inv_rr * var["rr"] + inv_rg * var["rg"] + inv_rb * var["rb"]

    mean_p = box(p0) / n
    cov = [box(p0 * I[..., c]) / n - mean[..., c] * mean_p for c in range(3)]
    a_r = (inv_rr * cov[0] + inv_rg * cov[1] + inv_rb * cov[2]) / det
    a_g = (inv_rg * cov[0] + inv_gg * cov[1] + inv_gb * cov[2]) / det
    a_b = (inv_rb * cov[0] + inv_gb * cov[1] + inv_bb * cov[2]) / det
    b = mean_p - a_r * mean[..., 0] - a_g * mean[..., 1] - a_b * mean[..., 2]
    q = (box(a_r) * I[..., 0] + box(a_g) * I[..., 1] + box(a_b) * I[..., 2]
         + box(b)) / n
    return q


def test_guided_filter_full_image_vs_oracle():
    rng = np.random.default_rng(8)
    h, w, r, eps = 24, 30, 4, 1e-4
    img = (rng.random((h, w, 3)) * 255).astype(np.float32)
    p = rng.random((h, w)).astype(np.float32)
    stats = guided.compute_stats(img, r, eps)
    got = np.asarray(guided.filter_image(jnp.asarray(p), stats, r))
    want = _np_guided_filter_reference(img, p.astype(np.float64), r, eps)
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-4)


def test_filter_windows_interior_matches_full_image():
    """FastGuidedImageFilter semantics: a window filtered with global stats
    must agree with the full-image filter at positions >= 2R from the window
    border (GuidedFilter.h:298-300)."""
    rng = np.random.default_rng(9)
    h, w, r, eps = 40, 44, 3, 1e-4
    img = (rng.random((h, w, 3)) * 255).astype(np.float32)
    p_full = rng.random((h, w)).astype(np.float32)
    stats = guided.compute_stats(img, r, eps)
    q_full = np.asarray(guided.filter_image(jnp.asarray(p_full), stats, r))

    f = 20
    oy, ox = 7, 9
    win = (slice(oy, oy + f), slice(ox, ox + f))
    q_win = np.asarray(guided.filter_windows(
        jnp.asarray(p_full[win])[None],
        stats.guide[win][None], stats.mean[win][None], stats.inv[win][None],
        jnp.ones((1, f, f)), r))[0]
    inner = slice(2 * r, f - 2 * r)
    np.testing.assert_allclose(q_win[inner, inner],
                               q_full[win][inner, inner], rtol=1e-3,
                               atol=1e-4)


def test_filter_windows_mask_matches_clipped_crop():
    """A window extending past the image (mask zeros) must equal the
    reference's crop-clipped filtering: compare against a window fully inside
    a zero-extended stats computation where the mask region is the crop."""
    rng = np.random.default_rng(10)
    h, w, r, eps = 30, 30, 3, 1e-4
    img = (rng.random((h, w, 3)) * 255).astype(np.float32)
    p = rng.random((h, w)).astype(np.float32)
    stats = guided.compute_stats(img, r, eps)

    f = 16
    # Window hanging off the right/bottom edge by 6 pixels.
    oy, ox = h - f + 6, w - f + 6
    valid = f - 6
    pad = 6
    p_win = np.zeros((f, f), np.float32)
    p_win[:valid, :valid] = p[oy:oy + valid, ox:ox + valid]
    g_win = np.zeros((f, f, 3), np.float32)
    g_win[:valid, :valid] = np.asarray(stats.guide)[oy:, ox:]
    m_win = np.zeros((f, f, 3), np.float32)
    m_win[:valid, :valid] = np.asarray(stats.mean)[oy:, ox:]
    i_win = np.zeros((f, f, 6), np.float32)
    i_win[:valid, :valid] = np.asarray(stats.inv)[oy:, ox:]
    mask = np.zeros((f, f), np.float32)
    mask[:valid, :valid] = 1.0

    q_masked = np.asarray(guided.filter_windows(
        jnp.asarray(p_win)[None], jnp.asarray(g_win)[None],
        jnp.asarray(m_win)[None], jnp.asarray(i_win)[None],
        jnp.asarray(mask)[None], r))[0]

    # Oracle: filter the clipped (valid x valid) crop directly.
    q_crop = np.asarray(guided.filter_windows(
        jnp.asarray(p_win[:valid, :valid])[None],
        jnp.asarray(g_win[:valid, :valid])[None],
        jnp.asarray(m_win[:valid, :valid])[None],
        jnp.asarray(i_win[:valid, :valid])[None],
        jnp.ones((1, valid, valid)), r))[0]
    np.testing.assert_allclose(q_masked[:valid, :valid], q_crop, rtol=1e-4,
                               atol=1e-5)


# --------------------------------------------------------- unary volume ----

def test_volume_slab_matches_gather_path():
    """The slab-based fast path must reproduce the reference-exact gather
    path (linear interpolation, edge clamping, th truncation, masking)."""
    from localexpstereo_tpu.ops import unary_volume
    rng = np.random.default_rng(11)
    d_, h, w = 12, 20, 26
    vol = rng.random((d_, h, w)).astype(np.float32)
    n = 5
    props = np.stack([
        rng.uniform(-0.2, 0.2, n),
        rng.uniform(-0.2, 0.2, n),
        rng.uniform(-3, d_ + 3, n),   # includes out-of-range planes
        np.zeros(n),
    ], -1).astype(np.float32)
    ox = np.asarray([-4, 0, 5, 14, 20], np.int32)   # windows off both edges
    oy = np.asarray([-3, 2, 8, 12, 16], np.int32)
    size = 8
    a = np.asarray(unary_volume.sample_windows(
        jnp.asarray(vol), jnp.asarray(props), jnp.asarray(ox),
        jnp.asarray(oy), size, 0.0, float(d_ - 1), 0.7, 1))
    b = np.asarray(unary_volume.sample_windows_slab(
        jnp.asarray(vol), jnp.asarray(props), jnp.asarray(ox),
        jnp.asarray(oy), size, 0.0, float(d_ - 1), 0.7))
    np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-5)


def test_warp_slab_matches_gather_path():
    """The V2 slab fast path must match the gather formulation wherever the
    plane's disparity is within [0, max_disp] (the validity range)."""
    from localexpstereo_tpu.ops import unary_warp
    rng = np.random.default_rng(12)
    h, w = 24, 60
    exi0 = rng.random((h, w, 4)).astype(np.float32) * 50
    exi1 = rng.random((h, w, 4)).astype(np.float32) * 50
    n = 4
    props = np.stack([
        rng.uniform(-0.1, 0.1, n), rng.uniform(-0.1, 0.1, n),
        rng.uniform(2.0, 8.0, n), np.zeros(n)], -1).astype(np.float32)
    ox = np.asarray([-3, 0, 10, 40], np.int32)
    oy = np.asarray([-2, 4, 8, 10], np.int32)
    size = 10
    for sign in (1.0, -1.0):
        a = np.asarray(unary_warp.sample_windows(
            jnp.asarray(exi0), jnp.asarray(exi1), jnp.asarray(props),
            jnp.asarray(ox), jnp.asarray(oy), size, sign, 10.0, 2.0, 0.9))
        b = np.asarray(unary_warp.sample_windows_slab(
            jnp.asarray(exi0), jnp.asarray(exi1), jnp.asarray(props),
            jnp.asarray(ox), jnp.asarray(oy), size, sign, 10.0, 2.0, 0.9,
            max_disp=12.0))
        np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-4)
