"""Fusion-move tests: table semantics + min-cut optimality vs brute force."""
import itertools

import jax.numpy as jnp
import numpy as np
import pytest

from localexpstereo_tpu.ops import mincut, pairwise


def _fusion_problem(rng, n, s, tau=1.0, lam=0.7):
    """Random fusion problem from two labelings (curvature tables)."""
    halo0 = rng.standard_normal((n, s + 2, s + 2, 4)).astype(np.float32)
    halo1 = rng.standard_normal((n, s + 2, s + 2, 4)).astype(np.float32)
    coeff = rng.random((n, 4, s, s)).astype(np.float32)
    import jax
    c00, c01, c10, c11 = jax.vmap(
        lambda h0, h1, cf: pairwise.fusion_tables(h0, h1, cf, 3.0, 5.0,
                                                  lam, tau)
    )(jnp.asarray(halo0), jnp.asarray(halo1), jnp.asarray(coeff))
    t0 = (rng.random((n, s, s)) * 4).astype(np.float32)
    t1 = (rng.random((n, s, s)) * 4).astype(np.float32)
    return (t0, t1, np.asarray(c00), np.asarray(c01), np.asarray(c10),
            np.asarray(c11), halo0, halo1, coeff)


def _energy(x, t0, t1, c00, c01, c10, c11):
    s = x.shape[0]
    e = float(np.sum(np.where(x, t1, t0)))
    for k, (dx, dy) in enumerate(mincut.EDGE_DIRS):
        for yy in range(s):
            for xx in range(s):
                qx, qy = xx + dx, yy + dy
                if not (0 <= qx < s and 0 <= qy < s):
                    continue
                tbl = (c00, c01, c10, c11)[
                    int(x[yy, xx]) * 2 + int(x[qy, qx])]
                e += tbl[k, yy, xx]
    return e


def test_fusion_tables_oracle():
    """Each table entry is psi of the corresponding label pair at global
    coords (StereoEnergy.h:331-394)."""
    rng = np.random.default_rng(0)
    s = 4
    h0 = rng.standard_normal((s + 2, s + 2, 4)).astype(np.float32)
    h1 = rng.standard_normal((s + 2, s + 2, 4)).astype(np.float32)
    coeff = rng.random((4, s, s)).astype(np.float32)
    ox, oy, lam, tau = 7.0, 2.0, 0.5, 1.0
    tables = pairwise.fusion_tables(jnp.asarray(h0), jnp.asarray(h1),
                                    jnp.asarray(coeff), ox, oy, lam, tau)
    tables = [np.asarray(t) for t in tables]

    def d(lab, x, y):
        return lab[0] * x + lab[1] * y + lab[2]

    for i, k in enumerate(pairwise.FORWARD):
        dx, dy = pairwise.NEIGHBORS[k]
        for yy in range(s):
            for xx in range(s):
                px, py = ox + xx, oy + yy
                qx, qy = px + dx, py + dy
                labs_p = (h0[yy + 1, xx + 1], h1[yy + 1, xx + 1])
                labs_q = (h0[yy + 1 + dy, xx + 1 + dx],
                          h1[yy + 1 + dy, xx + 1 + dx])
                for a in (0, 1):
                    for b in (0, 1):
                        lp, lq = labs_p[a], labs_q[b]
                        curv = (abs(d(lp, px, py) - d(lq, px, py))
                                + abs(d(lp, qx, qy) - d(lq, qx, qy)))
                        want = coeff[i, yy, xx] * min(curv, tau) * lam
                        got = tables[a * 2 + b][i, yy, xx]
                        assert got == pytest.approx(want, rel=1e-4, abs=1e-5)


def test_fusion_mincut_not_worse_than_endpoints():
    """The fused labeling's energy must be <= min(all-0, all-1) — the
    guarantee fusion moves provide even with non-submodular truncation."""
    rng = np.random.default_rng(1)
    n, s = 4, 5
    t0, t1, c00, c01, c10, c11, *_ = _fusion_problem(rng, n, s)
    acc = np.asarray(mincut.fusion_accept(
        jnp.asarray(t0), jnp.asarray(t1), jnp.asarray(c00),
        jnp.asarray(c01), jnp.asarray(c10), jnp.asarray(c11)))
    for i in range(n):
        e_fused = _energy(acc[i], t0[i], t1[i], c00[i], c01[i], c10[i],
                          c11[i])
        e_0 = _energy(np.zeros((s, s), bool), t0[i], t1[i], c00[i], c01[i],
                      c10[i], c11[i])
        e_1 = _energy(np.ones((s, s), bool), t0[i], t1[i], c00[i], c01[i],
                      c10[i], c11[i])
        assert e_fused <= min(e_0, e_1) + 1e-3


def test_fusion_mincut_optimal_when_submodular():
    """On submodular instances the fusion cut must reach the brute-force
    optimum (3x3 windows). Random curvature tables between two independent
    labelings are generally NOT submodular, so build submodular instances
    directly: c00 = c11 = 0 with non-negative c01/c10."""
    rng = np.random.default_rng(2)
    n, s = 6, 3
    c00 = np.zeros((n, 4, s, s), np.float32)
    c11 = np.zeros((n, 4, s, s), np.float32)
    c01 = (rng.random((n, 4, s, s)) * 2).astype(np.float32)
    c10 = (rng.random((n, 4, s, s)) * 2).astype(np.float32)
    t0 = (rng.random((n, s, s)) * 4).astype(np.float32)
    t1 = (rng.random((n, s, s)) * 4).astype(np.float32)
    acc = np.asarray(mincut.fusion_accept(
        jnp.asarray(t0), jnp.asarray(t1), jnp.asarray(c00),
        jnp.asarray(c01), jnp.asarray(c10), jnp.asarray(c11)))
    for i in range(n):
        best = min(
            _energy(np.asarray(bits, bool).reshape(s, s), t0[i], t1[i],
                    c00[i], c01[i], c10[i], c11[i])
            for bits in itertools.product([0, 1], repeat=s * s))
        got = _energy(acc[i], t0[i], t1[i], c00[i], c01[i], c10[i], c11[i])
        assert got == pytest.approx(best, rel=1e-4, abs=1e-3)


def test_fusion_reduces_to_expansion_when_lab1_constant():
    """Fusion with labeling1 = a constant plane must equal the expansion
    solver on the same problem (cost11 == 0 for identical planes)."""
    rng = np.random.default_rng(3)
    n, s = 3, 4
    halo0 = rng.standard_normal((n, s + 2, s + 2, 4)).astype(np.float32)
    prop = rng.standard_normal((n, 4)).astype(np.float32)
    halo1 = np.broadcast_to(prop[:, None, None, :],
                            (n, s + 2, s + 2, 4)).copy()
    coeff = rng.random((n, 4, s, s)).astype(np.float32)
    lam, tau = 0.7, 1.0
    import jax
    f00, f01, f10, f11 = jax.vmap(
        lambda h0, h1, cf: pairwise.fusion_tables(h0, h1, cf, 2.0, 4.0,
                                                  lam, tau)
    )(jnp.asarray(halo0), jnp.asarray(halo1), jnp.asarray(coeff))
    e00, e01, e10 = jax.vmap(
        lambda h0, pr, cf: pairwise.expansion_tables(h0, pr, cf, 2.0, 4.0,
                                                     lam, tau)
    )(jnp.asarray(halo0), jnp.asarray(prop), jnp.asarray(coeff))
    np.testing.assert_allclose(np.asarray(f11), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(f00), np.asarray(e00), rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(f01), np.asarray(e01), rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(f10), np.asarray(e10), rtol=1e-5,
                               atol=1e-5)


def test_fusion_move_energy_delta_matches_brute():
    """fusion_move_energy_delta(accept) == E(accept) - E(all-zero)."""
    rng = np.random.default_rng(3)
    n, s = 5, 4
    t0, t1, c00, c01, c10, c11, *_ = _fusion_problem(rng, n, s)
    acc = rng.random((n, s, s)) > 0.5
    delta = np.asarray(mincut.fusion_move_energy_delta(
        jnp.asarray(acc), jnp.asarray(t0), jnp.asarray(t1),
        jnp.asarray(c00), jnp.asarray(c01), jnp.asarray(c10),
        jnp.asarray(c11)))
    for i in range(n):
        want = (_energy(acc[i], t0[i], t1[i], c00[i], c01[i], c10[i],
                        c11[i])
                - _energy(np.zeros((s, s), bool), t0[i], t1[i], c00[i],
                          c01[i], c10[i], c11[i]))
        assert delta[i] == pytest.approx(want, rel=1e-4, abs=1e-3)


def test_fusion_boundary_tlinks_degenerates_to_expansion():
    """With labeling 1 == a constant plane, the fusion boundary absorption
    must equal the expansion one for that plane as proposal."""
    rng = np.random.default_rng(4)
    s = 5
    h0 = rng.standard_normal((s + 2, s + 2, 4)).astype(np.float32)
    prop = rng.standard_normal(4).astype(np.float32)
    h1 = np.broadcast_to(prop, (s + 2, s + 2, 4)).copy()
    coeff = rng.random((8, s, s)).astype(np.float32)
    ox, oy, lam, tau = 3.0, 9.0, 0.7, 1.0
    want = pairwise.boundary_tlinks(jnp.asarray(h0), jnp.asarray(prop),
                                    jnp.asarray(coeff), ox, oy, lam, tau)
    got = pairwise.fusion_boundary_tlinks(
        jnp.asarray(h0), jnp.asarray(h1), jnp.asarray(coeff), ox, oy,
        lam, tau)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want[0]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(want[1]),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_engine_fuse_adopts_better_labeling():
    """Solver.fuse: fusing an oracle labeling (the planted plane of a
    synthetic volume) into a short solve must not increase the energy, must
    strictly adopt oracle labels where they help, and fusing the state's
    own labeling is a no-op."""
    from localexpstereo_tpu.config import PARAMS_GF
    from localexpstereo_tpu.models.engine import LocalExpansionSolver

    rng = np.random.default_rng(0)
    h, w, nd = 32, 48, 8
    a_true, b_true, c_true = 0.04, 0.02, 2.0
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    d_true = np.clip(a_true * xs + b_true * ys + c_true, 0, nd - 1)
    dd = np.arange(nd, dtype=np.float32)[:, None, None]
    vol = np.minimum(np.abs(dd - d_true[None]) * 0.4, 1.0).astype(np.float32)
    vol += rng.random(vol.shape, np.float32) * 0.02
    img = (rng.random((h, w, 3)) * 255).astype(np.float32)
    params = PARAMS_GF.replace(windR=4, lambda_=0.5, th_col=0.5)

    solver = LocalExpansionSolver(img, img, params, max_disp=float(nd - 1),
                                  vol0=vol, vol1=vol, seed=0,
                                  vol_dtype="float32")
    solver.add_layer(3, ("expansion", "ransac", "random7"))
    solver.run(iterations=1, view_modes=(0,), pm_iterations=1)

    from localexpstereo_tpu.models.engine import energy_audit
    lab0, cost0 = solver._state[0]
    e_before = float(energy_audit(solver.data, solver.cfg, lab0, cost0,
                                  0)[0])

    # No-op: fusing the current labeling leaves state bitwise unchanged.
    cur = np.asarray(solver._unpadded_labeling(solver._state, 0))
    fused_same = solver.fuse(cur, mode=0)
    np.testing.assert_array_equal(fused_same, cur)

    oracle = np.zeros((h, w, 4), np.float32)
    oracle[..., 0] = a_true
    oracle[..., 1] = b_true
    oracle[..., 2] = c_true
    fused = solver.fuse(oracle, mode=0)
    lab1, cost1 = solver._state[0]
    e_after = float(energy_audit(solver.data, solver.cfg, lab1, cost1,
                                 0)[0])
    assert e_after <= e_before + 1e-3
    # The oracle plane should win somewhere (the 1+1-sweep solve is far
    # from converged on this volume).
    took = np.any(np.all(np.abs(fused - oracle) < 1e-6, axis=-1))
    assert bool(took)


def test_completion_labeling_recovers_plane_in_low_texture_strip():
    """A tile whose low-texture strip drifted to a wrong plane must be
    completed from the textured surround's (correct) plane."""
    from localexpstereo_tpu.models import proposals

    rng = np.random.default_rng(0)
    h, w = 64, 64
    a, b, c = 0.03, -0.02, 5.0
    lab = np.zeros((h, w, 4), np.float32)
    lab[..., 0], lab[..., 1], lab[..., 2] = a, b, c
    # Strip x in [24, 40): wrong plane, and textureless image there.
    lab[:, 24:40, 0] = 0.0
    lab[:, 24:40, 1] = 0.0
    lab[:, 24:40, 2] = c + 2.0
    img = (rng.random((h, w, 3)) * 255).astype(np.float32)
    img[:, 24:40] = 100.0

    ext = proposals.completion_labeling(lab, img, block=64)
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    want = a * xs + b * ys + c
    got = ext[..., 0] * xs + ext[..., 1] * ys + ext[..., 2]
    # Completed strip follows the true plane, not the drifted one.
    assert np.abs(got[:, 24:40] - want[:, 24:40]).max() < 0.3
    assert np.abs(ext[:, :, 3]).max() == 0.0


@pytest.mark.slow
def test_run_fuse_with_lowers_energy():
    """run(fuse_with=[other solve's labeling]) must end at energy <= the
    plain solve (fusion applied after GC, before postprocess)."""
    from localexpstereo_tpu.config import PARAMS_GF
    from localexpstereo_tpu.models.engine import (LocalExpansionSolver,
                                                  energy_audit)

    rng = np.random.default_rng(1)
    h, w, nd = 32, 48, 8
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    d_true = np.clip(0.03 * xs + 0.01 * ys + 2.0, 0, nd - 1)
    dd = np.arange(nd, dtype=np.float32)[:, None, None]
    vol = np.minimum(np.abs(dd - d_true[None]) * 0.4, 1.0).astype(np.float32)
    vol += rng.random(vol.shape, np.float32) * 0.05
    img = (rng.random((h, w, 3)) * 255).astype(np.float32)
    params = PARAMS_GF.replace(windR=4, lambda_=0.5, th_col=0.5)

    def make(seed):
        s = LocalExpansionSolver(img, img, params, max_disp=float(nd - 1),
                                 vol0=vol, vol1=vol, seed=seed,
                                 vol_dtype="float32")
        s.add_layer(3, ("expansion", "ransac", "random7"))
        return s

    solo = make(0)
    solo.run(iterations=1, view_modes=(0,), pm_iterations=1)
    e_solo = float(energy_audit(solo.data, solo.cfg, *solo._state[0], 0)[0])

    aux = make(1)
    aux.run(iterations=1, view_modes=(0,), pm_iterations=1)
    ext = np.asarray(aux._unpadded_labeling(aux._state, 0))

    fused = make(0)
    fused.run(iterations=1, view_modes=(0,), pm_iterations=1,
              fuse_with=[ext])
    e_fused = float(energy_audit(fused.data, fused.cfg, *fused._state[0],
                                 0)[0])
    assert e_fused <= e_solo + 1e-3


def test_cli_fuse_seeds_flag():
    from localexpstereo_tpu.cli import main as cli
    assert cli.parse_args(["-mode", "MiddV2", "-fuseSeeds", "3"]
                          ).fuse_seeds == 3
    assert cli.parse_args(["-mode", "MiddV2"]).fuse_seeds == 0


def test_completion_labeling_fully_textureless_tile_keeps_fit():
    """A tile with a perfectly constant image must fall back to uniform
    weights in EVERY IRLS round (regression: reweighting from zero
    confidence collapsed the fit to the zero plane)."""
    from localexpstereo_tpu.models import proposals

    h, w = 32, 32
    a, b, c = 0.02, 0.01, 4.0
    lab = np.zeros((h, w, 4), np.float32)
    lab[..., 0], lab[..., 1], lab[..., 2] = a, b, c
    img = np.full((h, w, 3), 127.0, np.float32)   # zero texture everywhere
    ext = proposals.completion_labeling(lab, img, block=32)
    np.testing.assert_allclose(ext[..., 0], a, atol=1e-3)
    np.testing.assert_allclose(ext[..., 1], b, atol=1e-3)
    np.testing.assert_allclose(ext[..., 2], c, atol=5e-2)
