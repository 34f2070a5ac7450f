"""Audit the tuned GC round caps for silent truncation (VERDICT r4 item 5).

The engine's fused path runs ``gc_rounds=16`` global-relabel rounds with
``gc_sweeps = 64 if S >= 256 else 16`` push sweeps per round
(``models/engine.py:277-278``) instead of the reference's exact BK maxflow
(``/root/reference/LocalExpansionStereo/FastGCStereo.h:553-559``). A
truncated preflow can yield a sub-optimal (still energy-monotone,
guard-protected) cut. This audit quantifies that risk with the solver's own
EXACTNESS CERTIFICATE: push-relabel that terminates with no active node
(excess > 0 and residual-reachable to the sink, ``active_left`` in
``ops/mincut._solve_preflow``) has found a maximum preflow, so the extracted
cut is an exact min-cut — no oracle needed. When the certificate holds at
the capped budget, capped == exact by construction.

Protocol per (S, sweeps) in {(129, 16), (387, 64)} — the engine's coarse
layer geometries where truncation is most plausible:
  * >= 100 random submodular expansion instances (the same construction the
    engine produces: curvature tables from random disparity fields, varied
    tau/lambda/unary scales including adversarially skewed ones);
  * solve at the capped budget (16 rounds), record rounds used + active_left;
  * certificate: assert active_left == 0 for every instance;
  * cross-check: accepts bitwise-equal to the conservative 64-round solve;
  * spot-check: per-region energy equals the native Dinic oracle's on a
    random sample (ties may flip labels; energy is the invariant).

Writes tools/gc_cap_audit.json. The default-gate regression test
(tests/test_gc_caps.py) pins the same certificate at reduced instance count.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from localexpstereo_tpu.ops import mincut  # noqa: E402


def random_problem(rng, n, s, tau, lam, scale, unary_scale):
    """Engine-shaped expansion tables (cf. tests/test_mincut._random_problem):
    submodular curvature structure from random disparity fields."""
    w = rng.random((n, 4, s, s)).astype(np.float32) * scale
    d = [rng.random((n, 4, s, s)).astype(np.float32) * 3 for _ in range(6)]
    d_cur_p, d_cur_q, d_nb_p, d_nb_q, d_pr_p, d_pr_q = d

    def psi(a_p, a_q, b_p, b_q):
        return w * np.minimum(np.abs(a_p - b_p) + np.abs(a_q - b_q),
                              tau) * lam

    c00 = psi(d_cur_p, d_cur_q, d_nb_p, d_nb_q)
    c01 = psi(d_cur_p, d_cur_q, d_pr_p, d_pr_q)
    c10 = psi(d_pr_p, d_pr_q, d_nb_p, d_nb_q)
    t0 = (rng.random((n, s, s)) * unary_scale).astype(np.float32)
    t1 = (rng.random((n, s, s)) * unary_scale).astype(np.float32)
    return t0, t1, c00, c01, c10


def region_energy(x, t0, t1, c00, c01, c10):
    """Vectorized region energy of binary labelings x [N, S, S]."""
    e = np.where(x, t1, t0).sum(axis=(-2, -1))
    for k, (dx, dy) in enumerate(mincut.EDGE_DIRS):
        s = x.shape[-1]
        # p ranges over pixels with in-bounds neighbor q = p + (dx, dy).
        py = slice(max(0, -dy), s - max(0, dy))
        px = slice(max(0, -dx), s - max(0, dx))
        qy = slice(max(0, dy), s + min(0, dy))
        qx = slice(max(0, dx), s + min(0, dx))
        xp = x[:, py, px]
        xq = x[:, qy, qx]
        c = np.stack([c00[:, k, py, px], c01[:, k, py, px],
                      c10[:, k, py, px]], 0)
        idx = np.where(~xp & ~xq, 0, np.where(~xp & xq, 1, np.where(
            xp & ~xq, 2, -1)))
        pick = np.take_along_axis(c, np.maximum(idx, 0)[None], 0)[0]
        e = e + np.where(idx >= 0, pick, 0.0).sum(axis=(-2, -1))
    return e


# Varied regimes incl. adversarial skews (tau, lam, pairwise scale, unary
# scale). High pairwise-to-unary ratio makes long augmenting structure.
REGIMES = [
    (1.0, 1.0, 1.0, 5.0),     # engine-typical
    (1.0, 0.5, 1.0, 5.0),     # V3 preset lambda
    (3.0, 1.0, 2.0, 1.0),     # pairwise-dominated (hard for maxflow)
    (1.0, 1.0, 0.2, 20.0),    # unary-dominated
    (5.0, 2.0, 4.0, 2.0),     # extreme smoothness
]


def audit(s: int, sweeps: int, n_total: int, batch: int, dinic_sample: int,
          seed0: int = 0):
    res = {"S": s, "sweeps_per_round": sweeps, "instances": 0,
           "capped_rounds": 16, "exact_rounds": 64,
           "max_rounds_used": 0, "truncated": 0, "accept_mismatch": 0,
           "dinic_checked": 0, "dinic_energy_mismatch": 0,
           "max_energy_gap_vs_dinic": 0.0, "regimes": len(REGIMES)}
    t_start = time.time()
    per_regime = -(-n_total // len(REGIMES))
    done = 0
    for ri, (tau, lam, scale, uscale) in enumerate(REGIMES):
        rng = np.random.default_rng(seed0 + 1000 * ri)
        remaining = min(per_regime, n_total - done)
        while remaining > 0:
            n = min(batch, remaining)
            t0, t1, c00, c01, c10 = random_problem(rng, n, s, tau, lam,
                                                   scale, uscale)
            args = tuple(jnp.asarray(v) for v in (t0, t1, c00, c01, c10))
            acc_c, rounds_c, left_c = (np.asarray(v) for v in
                                       mincut.mincut_accept(
                *args, max_global_rounds=16, sweeps_per_round=sweeps,
                with_stats=True))
            acc_e = np.asarray(mincut.mincut_accept(
                *args, max_global_rounds=64, sweeps_per_round=sweeps))
            res["instances"] += n
            res["max_rounds_used"] = max(res["max_rounds_used"],
                                         int(rounds_c))
            res["truncated"] += int(left_c > 0)
            res["accept_mismatch"] += int((acc_c != acc_e).any(axis=(1, 2))
                                          .sum())
            # Dinic oracle spot-check (energy equality; ties may flip).
            if res["dinic_checked"] < dinic_sample:
                from localexpstereo_tpu import native
                e, cap_t, cap_fw = (np.asarray(v) for v in
                                    mincut.build_graph(*args))
                i = int(rng.integers(n))
                oracle_acc, _ = native.grid_mincut_oracle(
                    e[i], cap_t[i], cap_fw[i])
                e_got = region_energy(acc_c[i:i + 1], t0[i:i + 1],
                                      t1[i:i + 1], c00[i:i + 1],
                                      c01[i:i + 1], c10[i:i + 1])[0]
                e_ora = region_energy(oracle_acc[None], t0[i:i + 1],
                                      t1[i:i + 1], c00[i:i + 1],
                                      c01[i:i + 1], c10[i:i + 1])[0]
                gap = abs(float(e_got - e_ora)) / max(abs(float(e_ora)), 1.0)
                res["max_energy_gap_vs_dinic"] = max(
                    res["max_energy_gap_vs_dinic"], gap)
                res["dinic_energy_mismatch"] += int(gap > 1e-4)
                res["dinic_checked"] += 1
            remaining -= n
            done += n
    res["wall_s"] = round(time.time() - t_start, 1)
    return res


def main():
    n_total = int(os.environ.get("GC_AUDIT_N", "100"))
    out = {"protocol": "certificate: active_left==0 at capped budget ==> "
                       "exact min-cut; cross-checked vs 64-round accepts "
                       "and Dinic oracle energies",
           "platform": jax.default_backend(),
           "device": str(jax.devices()[0]),
           "legs": []}
    for s, sweeps, batch, dinic in [(129, 16, 20, 10), (387, 64, 5, 5)]:
        leg = audit(s, sweeps, n_total, batch, dinic)
        out["legs"].append(leg)
        print(json.dumps(leg))
    ok = all(l["truncated"] == 0 and l["accept_mismatch"] == 0
             and l["dinic_energy_mismatch"] == 0 for l in out["legs"])
    out["ok"] = ok
    path = os.path.join(os.path.dirname(__file__), "gc_cap_audit.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"ok": ok, "written": path}))


if __name__ == "__main__":
    main()
