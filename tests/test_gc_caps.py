"""Tuned GC round caps vs exact min-cut (VERDICT r4 item 5).

The engine's fused path caps the push-relabel at ``gc_rounds=16`` global
relabels (``models/engine.py:277``) instead of running the reference's exact
BK maxflow to termination (``FastGCStereo.h:553-559``). These tests pin that
the cap is NOT a silent truncation at the coarse-layer sizes where
truncation is most plausible (S = 129, 387), using the solver's own
exactness certificate: push-relabel that terminates with ``active_left == 0``
(no node with excess that can still reach the sink) has found a maximum
preflow, so the extracted cut is an exact min-cut.

The 100-instance x 5-regime hardware audit lives in tools/gc_cap_audit.py
(committed artifact tools/gc_cap_audit.json: max rounds used 3 of 16, zero
truncation/mismatch); this default-gate version re-proves the certificate on
every run at reduced instance count.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from localexpstereo_tpu.ops import mincut

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from gc_cap_audit import random_problem, region_energy  # noqa: E402


# (tau, lam, pairwise scale, unary scale): engine-typical + the adversarial
# pairwise-dominated regime (long augmenting structure).
REGIMES = [(1.0, 1.0, 1.0, 5.0), (3.0, 1.0, 2.0, 1.0)]


@pytest.mark.parametrize("s,sweeps,n", [(129, 16, 3), (387, 64, 1)])
def test_capped_rounds_certified_exact(s, sweeps, n):
    """At the engine's tuned budget (16 rounds, engine-matched sweeps) the
    solve must terminate with the exactness certificate AND match the
    conservative 64-round solve bitwise on every instance."""
    for ri, (tau, lam, scale, uscale) in enumerate(REGIMES):
        rng = np.random.default_rng(7 + 100 * ri + s)
        t0, t1, c00, c01, c10 = random_problem(rng, n, s, tau, lam, scale,
                                               uscale)
        args = tuple(jnp.asarray(v) for v in (t0, t1, c00, c01, c10))
        acc_c, rounds, left = (np.asarray(v) for v in mincut.mincut_accept(
            *args, max_global_rounds=16, sweeps_per_round=sweeps,
            with_stats=True))
        assert int(left) == 0, \
            f"S={s} regime {ri}: truncated (active_left={int(left)} after " \
            f"{int(rounds)} rounds) — the 16-round cap is not exact here"
        acc_e = np.asarray(mincut.mincut_accept(
            *args, max_global_rounds=64, sweeps_per_round=sweeps))
        np.testing.assert_array_equal(acc_c, acc_e)


def test_capped_energy_matches_dinic_oracle():
    """Independent check: the capped cut's region energy equals the native
    Dinic oracle's exact min-cut energy (labels may differ on 0-cost ties)."""
    from localexpstereo_tpu import native

    s = 129
    rng = np.random.default_rng(42)
    t0, t1, c00, c01, c10 = random_problem(rng, 1, s, 1.0, 1.0, 1.0, 5.0)
    args = tuple(jnp.asarray(v) for v in (t0, t1, c00, c01, c10))
    acc = np.asarray(mincut.mincut_accept(*args, max_global_rounds=16,
                                          sweeps_per_round=16))
    e, cap_t, cap_fw = (np.asarray(v) for v in mincut.build_graph(*args))
    oracle_acc, _ = native.grid_mincut_oracle(e[0], cap_t[0], cap_fw[0])
    e_got = region_energy(acc, t0, t1, c00, c01, c10)[0]
    e_ora = region_energy(oracle_acc[None], t0, t1, c00, c01, c10)[0]
    assert e_got == pytest.approx(e_ora, rel=1e-5, abs=1e-2)
