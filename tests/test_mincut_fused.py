"""Fused expansion kernel (tables + graph + solve + guard in Pallas) vs the
split XLA pipeline, on randomized realistic inputs (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from localexpstereo_tpu.ops import mincut, mincut_pallas, pairwise


def _random_problem(rng, n, s, lam=0.7, tau=1.0):
    halo = rng.normal(size=(n, s + 2, s + 2, 4)).astype(np.float32)
    halo[..., 0:2] *= 0.1            # plausible slopes
    halo[..., 2] = rng.uniform(0, 8, (n, s + 2, s + 2))
    halo[..., 3] = 0.0
    props = np.stack([rng.uniform(-0.1, 0.1, n), rng.uniform(-0.1, 0.1, n),
                      rng.uniform(0, 8, n), np.zeros(n)], -1).astype(np.float32)
    coeff8 = rng.uniform(0.01, 1.0, (n, 8, s, s)).astype(np.float32)
    ccost = rng.uniform(0, 2, (n, s, s)).astype(np.float32)
    pcost = rng.uniform(0, 2, (n, s, s)).astype(np.float32)
    tox = rng.integers(-3, 10, n).astype(np.float32)
    toy = rng.integers(-3, 10, n).astype(np.float32)
    return (jnp.asarray(halo), jnp.asarray(props), jnp.asarray(tox),
            jnp.asarray(toy), jnp.asarray(coeff8), jnp.asarray(ccost),
            jnp.asarray(pcost), lam, tau)


def _xla_reference(halo, props, tox, toy, coeff8, ccost, pcost, lam, tau):
    coeff_fwd = coeff8[:, list(pairwise.FORWARD)]
    c00, c01, c10 = jax.vmap(
        lambda hl, pr, cf, x0, y0: pairwise.expansion_tables(
            hl, pr, cf, x0, y0, lam, tau))(halo, props, coeff_fwd, tox, toy)
    t0b, t1b = jax.vmap(
        lambda hl, pr, cf, x0, y0: pairwise.boundary_tlinks(
            hl, pr, cf, x0, y0, lam, tau))(halo, props, coeff8, tox, toy)
    t0 = ccost + t0b
    t1 = pcost + t1b
    accept = mincut.mincut_accept(t0, t1, c00, c01, c10)
    delta = mincut.move_energy_delta(accept, t0, t1, c00, c01, c10)
    return accept & (delta <= 0.0)[:, None, None], (t0, t1, c00, c01, c10)


@pytest.mark.parametrize("n,s", [(6, 6), (3, 9)])
def test_fused_kernel_matches_xla_pipeline(n, s):
    rng = np.random.default_rng(0)
    args = _random_problem(rng, n, s)
    want, (t0, t1, c00, c01, c10) = _xla_reference(*args)
    got = mincut_pallas.expansion_accept_pallas(
        args[0], args[1], args[2], args[3], args[4], args[5], args[6],
        lam=args[7], tau=args[8], interpret=True)
    # Both solvers are exact min-cuts; ties can differ, so compare ENERGY of
    # the two accept masks rather than masks bitwise.
    e_want = mincut.move_energy_delta(want, t0, t1, c00, c01, c10)
    e_got = mincut.move_energy_delta(got, t0, t1, c00, c01, c10)
    np.testing.assert_allclose(np.asarray(e_got), np.asarray(e_want),
                               rtol=1e-5, atol=1e-4)
    # and the guard held
    assert np.all(np.asarray(e_got) <= 1e-5)


def test_fused_kernel_region_on_lanes_layout():
    """n >= _RL_B/2 with small S selects the region-on-lanes layout; results
    must stay exact min-cuts (energy-equal to the XLA pipeline)."""
    rng = np.random.default_rng(2)
    n = mincut_pallas._RL_B // 2 + 6   # odd count exercises lane padding
    args = _random_problem(rng, n, 5)
    got = mincut_pallas.expansion_accept_pallas(
        args[0], args[1], args[2], args[3], args[4], args[5], args[6],
        lam=args[7], tau=args[8], interpret=True)
    assert got.shape == (n, 5, 5)
    want, (t0, t1, c00, c01, c10) = _xla_reference(*args)
    e_want = mincut.move_energy_delta(want, t0, t1, c00, c01, c10)
    e_got = mincut.move_energy_delta(got, t0, t1, c00, c01, c10)
    np.testing.assert_allclose(np.asarray(e_got), np.asarray(e_want),
                               rtol=1e-5, atol=1e-4)
    assert np.all(np.asarray(e_got) <= 1e-5)


def test_fused_kernel_region_packing_pads():
    """n not divisible by the packing factor exercises the pad path."""
    rng = np.random.default_rng(1)
    args = _random_problem(rng, 5, 4)
    got = mincut_pallas.expansion_accept_pallas(
        args[0], args[1], args[2], args[3], args[4], args[5], args[6],
        lam=args[7], tau=args[8], interpret=True)
    assert got.shape == (5, 4, 4)
    want, (t0, t1, c00, c01, c10) = _xla_reference(*args)
    e_want = mincut.move_energy_delta(want, t0, t1, c00, c01, c10)
    e_got = mincut.move_energy_delta(got, t0, t1, c00, c01, c10)
    np.testing.assert_allclose(np.asarray(e_got), np.asarray(e_want),
                               rtol=1e-5, atol=1e-4)
