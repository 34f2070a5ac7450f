"""Cross-check the TPU push-relabel against the native Dinic oracle on
region sizes far beyond brute-force reach."""
import jax.numpy as jnp
import numpy as np
import pytest

from localexpstereo_tpu import native
from localexpstereo_tpu.ops import mincut
from tests.test_mincut import _energy, _random_problem


@pytest.mark.parametrize("seed,s", [(0, 8), (1, 12), (2, 16)])
def test_pushrelabel_energy_matches_dinic(seed, s):
    rng = np.random.default_rng(seed)
    n = 3
    t0, t1, c00, c01, c10 = _random_problem(rng, n, s)
    acc = np.asarray(mincut.mincut_accept(
        jnp.asarray(t0), jnp.asarray(t1), jnp.asarray(c00),
        jnp.asarray(c01), jnp.asarray(c10)))

    e, cap_t, cap_fw = (np.asarray(v) for v in mincut.build_graph(
        jnp.asarray(t0), jnp.asarray(t1), jnp.asarray(c00),
        jnp.asarray(c01), jnp.asarray(c10)))

    for i in range(n):
        oracle_acc, _ = native.grid_mincut_oracle(e[i], cap_t[i], cap_fw[i])
        e_got = _energy(acc[i], t0[i], t1[i], c00[i], c01[i], c10[i])
        e_oracle = _energy(oracle_acc, t0[i], t1[i], c00[i], c01[i], c10[i])
        # Both must reach the same (optimal) energy; the labelings themselves
        # may differ on zero-cost ties.
        assert e_got == pytest.approx(e_oracle, rel=1e-4, abs=1e-2), \
            f"region {i}: pushrelabel {e_got} vs dinic {e_oracle}"
