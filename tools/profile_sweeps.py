"""Steady-state per-(layer, do_gc) sweep timings of the engine's actual
in-scan executables on the bench workload — the ground-truth breakdown of
the headline s/frame number (unlike tools/profile_phases.py, whose
standalone sub-op dispatches each carry the ~10 ms tunnel floor).

Usage:  python tools/profile_sweeps.py [scale]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))

import jax
import numpy as np

from bench import build_problem
from localexpstereo_tpu.config import PARAMS_GF
from localexpstereo_tpu.models.engine import (LocalExpansionSolver,
                                              LAYER0_PROPOSERS,
                                              COARSE_PROPOSERS, layer_sweep)


def main():
    scale = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    img, vol, h, w, nd = build_problem(scale)
    params = PARAMS_GF.replace(windR=20, lambda_=0.5, th_col=0.5)
    solver = LocalExpansionSolver(img, img, params, max_disp=float(nd - 1),
                                  vol0=vol, vol1=vol, seed=0,
                                  vol_dtype=os.environ.get("PROF_VOL_DTYPE",
                                                           "uint8"),
                                  unary_backend=os.environ.get(
                                      "PROF_UNARY_BACKEND", "auto"))
    solver.add_layer(max(1, int(w * 0.01)), LAYER0_PROPOSERS)
    solver.add_layer(max(1, int(w * 0.03)), COARSE_PROPOSERS)
    solver.add_layer(max(1, int(w * 0.09)), COARSE_PROPOSERS)
    solver.finalize()
    jax.block_until_ready(solver.data)

    key = jax.random.PRNGKey(0)
    state = solver._init_state(key, 0)
    # settle: one greedy sweep for a realistic label field
    state = solver._sweep(state, 0, 0, False, key)
    jax.block_until_ready(state)

    tot = {False: 0.0, True: 0.0}
    for li, layer in enumerate(solver.layers):
        plan, active, (oxs, oys, rmasks, coxs, coys, dzs, nrs, keys) = \
            solver._layer_inputs(li, layer, 0, key)
        for do_gc in (False, True):
            def one(st):
                return layer_sweep(
                    solver.data, solver.cfg, st[0], st[1], oxs, oys, rmasks,
                    coxs, coys, dzs, nrs, keys, unit_size=layer.unit_size,
                    nbx=layer.nbx, nby=layer.nby, plan=plan, do_gc=do_gc,
                    mode=0, step_active=active)
            out = one(state)
            jax.block_until_ready(out)
            n = 3
            t0 = time.perf_counter()
            for _ in range(n):
                out = one(state)
            jax.block_until_ready(out)
            ms = (time.perf_counter() - t0) / n * 1e3
            tot[do_gc] += ms
            print(f"layer {li} (s={layer.unit_size}, plan {len(plan)}) "
                  f"do_gc={int(do_gc)}: {ms:8.1f} ms/sweep")
    greedy, gc = tot[False], tot[True]
    print(f"\nfull greedy sweep {greedy:.0f} ms, full GC sweep {gc:.0f} ms")
    print(f"schedule estimate (2 pm + 5 gc): "
          f"{(2 * greedy + 5 * gc) / 1e3:.2f} s (+ init)")


if __name__ == "__main__":
    main()
