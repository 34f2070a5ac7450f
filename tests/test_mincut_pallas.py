"""Pallas min-cut kernel vs the XLA solver (interpret mode on CPU)."""
import jax.numpy as jnp
import numpy as np
import pytest

from localexpstereo_tpu.ops import mincut, mincut_pallas
from tests.test_mincut import _energy, _random_problem


@pytest.mark.parametrize("seed,n,s", [(0, 4, 6), (1, 2, 10), (2, 3, 9)])
def test_pallas_kernel_matches_xla_energy(seed, n, s):
    rng = np.random.default_rng(seed)
    t0, t1, c00, c01, c10 = _random_problem(rng, n, s)
    args = tuple(map(jnp.asarray, (t0, t1, c00, c01, c10)))
    a_xla = np.asarray(mincut.mincut_accept(*args))
    a_pal = np.asarray(mincut_pallas.mincut_accept_pallas(*args,
                                                          interpret=True))
    for i in range(n):
        e1 = _energy(a_xla[i], t0[i], t1[i], c00[i], c01[i], c10[i])
        e2 = _energy(a_pal[i], t0[i], t1[i], c00[i], c01[i], c10[i])
        assert e2 == pytest.approx(e1, rel=1e-4, abs=1e-3)
