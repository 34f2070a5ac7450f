"""Multi-seed fusion experiment (beyond-reference accuracy).

The venus/tsukuba residual vs the paper is a large-move local minimum:
one dark low-texture strip converges high for some RNG streams and a
3s x 3s local expansion cannot flip it partially (PARITY.md "Anatomy").
The reference has no escape (its fusionMoveBK is never called). Here we
run K independent solves (seeds 0..K-1) and FUSE the runner-up labelings
into the seed-0 solution with ``LocalExpansionSolver.fuse`` — per pixel
the min-cut keeps whichever solve won locally, so any seed that escaped
the trap donates its strip.

Prints per-seed and fused bad rates + energies as JSON.

Usage: python tools/fuse_seeds.py [dataset=venus] [n_seeds=2] \
           [iterations=5] [pm=2] [out.json]
Env: FUSE_PLATFORM=cpu to force the CPU backend (wedged tunnel).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))

if os.environ.get("FUSE_PLATFORM"):
    import jax
    jax.config.update("jax_platforms", os.environ["FUSE_PLATFORM"])

import numpy as np


def bad_rates(disp, gt, nonocc, prec):
    d = disp.copy()
    if prec > 0:
        d = np.rint(d / prec) * prec
    valid = np.isfinite(gt) & (gt > 0)
    out = {}
    for th in (0.5, 1.0, 2.0):
        bad = (np.abs(d - gt) > th) & valid
        out[f"bad{th}_nonocc"] = round(
            100.0 * (bad & nonocc).sum() / (valid & nonocc).sum(), 3)
    return out


def main():
    from localexpstereo_tpu.config import PARAMS_GF
    from localexpstereo_tpu.models.engine import (
        LocalExpansionSolver, LAYER0_PROPOSERS, COARSE_PROPOSERS,
        energy_audit)
    from localexpstereo_tpu.ops import plane as plane_ops
    from localexpstereo_tpu.utils import datasets
    import jax.numpy as jnp

    name = sys.argv[1] if len(sys.argv) > 1 else "venus"
    n_seeds = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    pm = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    out_path = (sys.argv[5] if len(sys.argv) > 5
                else f"/tmp/fuse_{name}.json")
    target = f"/root/reference/data/MiddV2/{name}"
    pair = datasets.load_data(target, 0)
    params = PARAMS_GF.replace(windR=20, lambda_=1.0)

    def solve(seed):
        s = LocalExpansionSolver(pair.im0, pair.im1, params,
                                 pair.max_disparity, seed=seed)
        for i, sz in enumerate([5, 15, 25]):
            s.add_layer(sz, LAYER0_PROPOSERS if i == 0 else COARSE_PROPOSERS)
        s.run(iterations=iters, view_modes=(0,), pm_iterations=pm)
        return s

    res = {"dataset": name, "iterations": iters, "pm": pm,
           "seeds": {}, "fused": None}
    t0 = time.time()
    solvers = []
    for sd in range(n_seeds):
        s = solve(sd)
        solvers.append(s)
        lab = np.asarray(s._unpadded_labeling(s._state, 0))
        disp = np.asarray(plane_ops.disparity_map(jnp.asarray(lab)))
        e = float(energy_audit(s.data, s.cfg, *s._state[0], 0)[0])
        res["seeds"][sd] = {"energy": round(e, 1),
                            **bad_rates(disp, pair.disp_gt, pair.nonocc,
                                        pair.calib.gt_prec)}
        print(f"seed {sd}: {res['seeds'][sd]} ({time.time()-t0:.0f}s)",
              flush=True)

    base = solvers[0]
    for sd in range(1, n_seeds):
        other = np.asarray(
            solvers[sd]._unpadded_labeling(solvers[sd]._state, 0))
        base.fuse(other, mode=0)
        e = float(energy_audit(base.data, base.cfg, *base._state[0], 0)[0])
        print(f"after fusing seed {sd}: energy {e:.1f}", flush=True)
    lab = np.asarray(base._unpadded_labeling(base._state, 0))
    disp = np.asarray(plane_ops.disparity_map(jnp.asarray(lab)))
    e = float(energy_audit(base.data, base.cfg, *base._state[0], 0)[0])
    res["fused"] = {"energy": round(e, 1),
                    **bad_rates(disp, pair.disp_gt, pair.nonocc,
                                pair.calib.gt_prec)}
    res["elapsed_s"] = round(time.time() - t0, 1)
    print(json.dumps(res), flush=True)
    with open(out_path, "w") as f:
        json.dump(res, f, indent=1)


if __name__ == "__main__":
    main()
