"""Min-cut kernel tests: exactness vs brute-force enumeration.

The reference keeps its graph-construction audit compiled out
(``FastGCStereo.h:561-594``); here it is a live test: the batched
push-relabel must return a labeling whose energy equals the global optimum
found by enumerating all 2^(S*S) binary labelings on small windows.
"""
import itertools

import jax.numpy as jnp
import numpy as np
import pytest

from localexpstereo_tpu.ops import mincut


def _random_problem(rng, n, s, tau=1.0, lam=1.0, scale=1.0):
    """Random expansion-move problem with valid (submodular) tables.

    Tables are built the way the engine builds them: from random per-pixel
    disparities of 'current' and 'proposal' labelings, so the curvature
    structure (and hence submodularity B + C >= D with cost11 = 0) holds.
    """
    w = rng.random((n, 4, s, s)).astype(np.float32) * scale
    # Random disparity fields for current labels evaluated at p and q, and
    # the proposal's disparities: psi terms |d0(p)-d1(p)| + |d0(q)-d1(q)|.
    d_cur_p = rng.random((n, 4, s, s)).astype(np.float32) * 3
    d_cur_q = rng.random((n, 4, s, s)).astype(np.float32) * 3
    d_nb_p = rng.random((n, 4, s, s)).astype(np.float32) * 3
    d_nb_q = rng.random((n, 4, s, s)).astype(np.float32) * 3
    d_pr_p = rng.random((n, 4, s, s)).astype(np.float32) * 3
    d_pr_q = rng.random((n, 4, s, s)).astype(np.float32) * 3

    def psi(a_p, a_q, b_p, b_q):
        return w * np.minimum(np.abs(a_p - b_p) + np.abs(a_q - b_q),
                              tau) * lam

    c00 = psi(d_cur_p, d_cur_q, d_nb_p, d_nb_q)
    c01 = psi(d_cur_p, d_cur_q, d_pr_p, d_pr_q)
    c10 = psi(d_pr_p, d_pr_q, d_nb_p, d_nb_q)
    t0 = (rng.random((n, s, s)) * 5).astype(np.float32)
    t1 = (rng.random((n, s, s)) * 5).astype(np.float32)
    return t0, t1, c00, c01, c10


def _energy(x, t0, t1, c00, c01, c10):
    """Region energy of binary labeling x [S, S] for one problem (no batch)."""
    s = x.shape[0]
    e = float(np.sum(np.where(x, t1, t0)))
    for k, (dx, dy) in enumerate(mincut.EDGE_DIRS):
        for yy in range(s):
            for xx in range(s):
                qx, qy = xx + dx, yy + dy
                if not (0 <= qx < s and 0 <= qy < s):
                    continue
                xp, xq = x[yy, xx], x[qy, qx]
                if not xp and not xq:
                    e += c00[k, yy, xx]
                elif not xp and xq:
                    e += c01[k, yy, xx]
                elif xp and not xq:
                    e += c10[k, yy, xx]
    return e


def _brute_force(t0, t1, c00, c01, c10):
    s = t0.shape[0]
    best_e, best_x = np.inf, None
    for bits in itertools.product([0, 1], repeat=s * s):
        x = np.asarray(bits, bool).reshape(s, s)
        e = _energy(x, t0, t1, c00, c01, c10)
        if e < best_e:
            best_e, best_x = e, x
    return best_e, best_x


def test_submodularity_of_curvature_tables():
    """cost11 = 0 and B + C >= D (up to float noise) for curvature tables —
    the property the graph construction relies on (FastGCStereo.h:492)."""
    rng = np.random.default_rng(0)
    t0, t1, c00, c01, c10 = _random_problem(rng, 8, 6)
    assert (c10 + c01 - c00 >= -1e-4).all()


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_mincut_matches_brute_force_3x3(seed):
    rng = np.random.default_rng(seed)
    n, s = 6, 3
    t0, t1, c00, c01, c10 = _random_problem(rng, n, s)
    acc = np.asarray(mincut.mincut_accept(
        jnp.asarray(t0), jnp.asarray(t1), jnp.asarray(c00),
        jnp.asarray(c01), jnp.asarray(c10)))
    for i in range(n):
        got_e = _energy(acc[i], t0[i], t1[i], c00[i], c01[i], c10[i])
        best_e, _ = _brute_force(t0[i], t1[i], c00[i], c01[i], c10[i])
        assert got_e == pytest.approx(best_e, rel=1e-4, abs=1e-3), \
            f"region {i}: got {got_e}, optimal {best_e}"


def test_mincut_matches_brute_force_4x4():
    rng = np.random.default_rng(7)
    n, s = 2, 4
    t0, t1, c00, c01, c10 = _random_problem(rng, n, s)
    acc = np.asarray(mincut.mincut_accept(
        jnp.asarray(t0), jnp.asarray(t1), jnp.asarray(c00),
        jnp.asarray(c01), jnp.asarray(c10)))
    for i in range(n):
        got_e = _energy(acc[i], t0[i], t1[i], c00[i], c01[i], c10[i])
        best_e, _ = _brute_force(t0[i], t1[i], c00[i], c01[i], c10[i])
        assert got_e == pytest.approx(best_e, rel=1e-4, abs=1e-3)


def test_mincut_all_accept_and_all_keep():
    """Degenerate cases: uniformly better proposal -> all accept; uniformly
    worse -> all keep."""
    n, s = 1, 5
    zeros = np.zeros((n, 4, s, s), np.float32)
    t_hi = np.full((n, s, s), 10.0, np.float32)
    t_lo = np.zeros((n, s, s), np.float32)
    acc = np.asarray(mincut.mincut_accept(
        jnp.asarray(t_hi), jnp.asarray(t_lo), jnp.asarray(zeros),
        jnp.asarray(zeros), jnp.asarray(zeros)))
    assert acc.all()
    acc = np.asarray(mincut.mincut_accept(
        jnp.asarray(t_lo), jnp.asarray(t_hi), jnp.asarray(zeros),
        jnp.asarray(zeros), jnp.asarray(zeros)))
    assert not acc.any()


def test_move_energy_delta_matches_naive():
    rng = np.random.default_rng(9)
    n, s = 4, 4
    t0, t1, c00, c01, c10 = _random_problem(rng, n, s)
    x = rng.random((n, s, s)) > 0.5
    delta = np.asarray(mincut.move_energy_delta(
        jnp.asarray(x), jnp.asarray(t0), jnp.asarray(t1), jnp.asarray(c00),
        jnp.asarray(c01), jnp.asarray(c10)))
    for i in range(n):
        e_move = _energy(x[i], t0[i], t1[i], c00[i], c01[i], c10[i])
        e_keep = _energy(np.zeros((s, s), bool), t0[i], t1[i], c00[i],
                         c01[i], c10[i])
        assert delta[i] == pytest.approx(e_move - e_keep, rel=1e-4, abs=1e-3)
