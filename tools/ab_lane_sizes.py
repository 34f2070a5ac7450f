"""In-process interleaved A/B: lane-friendly layer sizes (round 4).

Hypothesis: the min-cut kernel pads every [b, S, S] solver plane to the
f32 VMEM tile — (ceil(S/8)*8, ceil(S/128)*128) — so the coarse layers of
the halfH bench schedule waste most of their vector lanes: S = 3*43 = 129
pads to (136, 256) = 2.09x the logical elements, S = 3*129 = 387 to
(392, 512) = 1.34x. Layer unit sizes are heuristic width fractions
(``main.cpp:395-397``: int(w * 0.01/0.03/0.09)), so rounding them DOWN a
little to make S ~ a lane multiple (43 -> 42: S = 126 pads 1.03x;
129 -> 128: S = 384 pads 1.00x) should cut the dominant GC sweep cost by
up to those factors with no semantic change beyond slightly smaller
regions.

Method (the only trustworthy instrument on the drifting tunnel — see
NOTES_NEXT): both schedules live in one process on the SAME bench
problem; per layer, alternate timed blocks of the two variants' real
``layer_sweep`` executables on live engine state, greedy and GC, and
report medians per block.

Usage: python tools/ab_lane_sizes.py [scale] [reps]
"""
import os
import statistics
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
                                              COARSE_PROPOSERS)


def make_solver(img, vol, nd, w, sizes):
    params = PARAMS_GF.replace(windR=20, lambda_=0.5, th_col=0.5)
    s = LocalExpansionSolver(img, img, params, max_disp=float(nd - 1),
                             vol0=vol, vol1=vol, seed=0, vol_dtype="uint8")
    for i, sz in enumerate(sizes):
        s.add_layer(sz, LAYER0_PROPOSERS if i == 0 else COARSE_PROPOSERS)
    return s


def timed_sweep(solver, li, do_gc, state, key, reps):
    """One timed block: `reps` layer sweeps of layer li on live state."""
    from localexpstereo_tpu.models.engine import layer_sweep
    lab, cost = state
    layer = solver.layers[li]
    t0 = time.perf_counter()
    for r in range(reps):
        plan, active, (oxs, oys, rmasks, coxs, coys, dzs, nrs, keys) = \
            solver._layer_inputs(li, layer, 0, jax.random.fold_in(key, r))
        lab, cost = layer_sweep(
            solver.data, solver.cfg, lab, cost, oxs, oys, rmasks, coxs,
            coys, dzs, nrs, keys, unit_size=layer.unit_size, nbx=layer.nbx,
            nby=layer.nby, plan=plan, do_gc=do_gc, mode=0,
            step_active=active)
    jax.block_until_ready(cost)
    return (time.perf_counter() - t0) / reps * 1e3, (lab, cost)


def main():
    scale = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    img, vol, h, w, nd = build_problem(scale)
    base = [max(1, int(w * f)) for f in (0.01, 0.03, 0.09)]
    friendly = list(base)
    for i, s in enumerate(base):
        ss = 3 * s
        if ss > 128:
            best = s
            best_waste = 1e9
            for cand in range(max(1, s - 7), s + 1):
                cs = 3 * cand
                waste = ((-(-cs // 8) * 8) * (-(-cs // 128) * 128)) / (cs * cs)
                if waste < best_waste - 1e-9:
                    best_waste, best = waste, cand
            friendly[i] = best
    print(f"sizes: base {base} -> friendly {friendly}", flush=True)

    variants = {}
    for name, sizes in (("base", base), ("friendly", friendly)):
        sv = make_solver(img, vol, nd, w, sizes)
        sv.finalize()
        key = jax.random.fold_in(jax.random.PRNGKey(0), 1000)
        state = sv._init_state(key, 0)
        jax.block_until_ready(state[1])
        variants[name] = (sv, state)
        print(f"{name}: finalized + init", flush=True)

    key = jax.random.PRNGKey(7)
    nlayers = len(base)
    results = {}
    for li in range(nlayers):
        for do_gc in (False, True):
            # warm both executables before any timing
            for name, (sv, state) in variants.items():
                _, variants[name] = (None, (sv, timed_sweep(
                    sv, li, do_gc, state, jax.random.fold_in(key, 99), 1)[1]))
            blocks = {"base": [], "friendly": []}
            for rnd in range(3):
                for name in ("base", "friendly") if rnd % 2 == 0 else \
                            ("friendly", "base"):
                    sv, state = variants[name]
                    ms, state = timed_sweep(sv, li, do_gc, state,
                                            jax.random.fold_in(key, rnd),
                                            reps)
                    variants[name] = (sv, state)
                    blocks[name].append(ms)
            mb = statistics.median(blocks["base"])
            mf = statistics.median(blocks["friendly"])
            results[(li, do_gc)] = (mb, mf)
            print(f"layer {li} do_gc={int(do_gc)}: base {mb:8.1f} ms  "
                  f"friendly {mf:8.1f} ms  speedup {mb / mf:5.2f}x  "
                  f"blocks b={[round(x, 1) for x in blocks['base']]} "
                  f"f={[round(x, 1) for x in blocks['friendly']]}",
                  flush=True)

    gsum_b = sum(results[(li, False)][0] for li in range(nlayers))
    gsum_f = sum(results[(li, False)][1] for li in range(nlayers))
    csum_b = sum(results[(li, True)][0] for li in range(nlayers))
    csum_f = sum(results[(li, True)][1] for li in range(nlayers))
    print(f"\nfull greedy sweep: base {gsum_b:.0f} ms -> friendly "
          f"{gsum_f:.0f} ms")
    print(f"full GC sweep:     base {csum_b:.0f} ms -> friendly "
          f"{csum_f:.0f} ms")
    print(f"schedule est (2 pm + 5 gc): base {(2 * gsum_b + 5 * csum_b) / 1e3:.2f} s"
          f" -> friendly {(2 * gsum_f + 5 * csum_f) / 1e3:.2f} s")


if __name__ == "__main__":
    main()
