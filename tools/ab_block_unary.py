"""In-process interleaved A/B: block-major unary backend "blk" vs "xla".

Hypothesis (round-4 greedy-step profile, tools/profile_greedy_step.py):
at the fine layer the xla backend spends ~20 ms/color step exploding
[N, D, F, F] uint8 slabs (0.26 GB at ~13 GB/s effective — gather-overhead
bound, not bandwidth) and ~3.3 ms/proposal on a VPU-bound tent contraction
whose minor dim F = 62 fills 48% of the vector lanes. The "blk" backend
(ops/unary_volume.sample_block_aligned) computes the same math — bitwise,
tests/test_unary_block.py — on the un-exploded bounding block: minor dim
~11 lane tiles (95% fill), no (F/T)^2 duplication, and the per-color hoist
collapses to one dynamic_slice + reshape strips.

Method: both backends in one process on the SAME bench problem, alternate
timed blocks of the real layer_sweep executables on live engine state
(the tunnel drifts >1 s/frame run-to-run; interleaving is the only
trustworthy instrument — see NOTES_NEXT / ARCHITECTURE.md).

Usage: python tools/ab_block_unary.py [scale] [reps]
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

from bench import build_problem, _layer_sizes
from localexpstereo_tpu.config import PARAMS_GF
from localexpstereo_tpu.models.engine import (LocalExpansionSolver,
                                              LAYER0_PROPOSERS,
                                              COARSE_PROPOSERS, layer_sweep)


def make_solver(img, vol, nd, sizes, backend):
    params = PARAMS_GF.replace(windR=20, lambda_=0.5, th_col=0.5)
    s = LocalExpansionSolver(img, img, params, max_disp=float(nd - 1),
                             vol0=vol, vol1=vol, seed=0, vol_dtype="uint8",
                             unary_backend=backend)
    for i, sz in enumerate(sizes):
        s.add_layer(sz, LAYER0_PROPOSERS if i == 0 else COARSE_PROPOSERS)
    return s


def timed_sweep(solver, li, do_gc, state, key, reps):
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
    sizes = _layer_sizes(w)
    print(f"layer sizes {sizes}  D={nd}", flush=True)

    variants = {}
    for name in ("xla", "blk"):
        sv = make_solver(img, vol, nd, sizes, name)
        sv.finalize()
        key = jax.random.fold_in(jax.random.PRNGKey(0), 1000)
        state = sv._init_state(key, 0)
        jax.block_until_ready(state[1])
        variants[name] = (sv, state)
        print(f"{name}: finalized + init", flush=True)

    key = jax.random.PRNGKey(7)
    nlayers = len(sizes)
    results = {}
    for li in range(nlayers):
        for do_gc in (False, True):
            for name, (sv, state) in variants.items():
                variants[name] = (sv, timed_sweep(
                    sv, li, do_gc, state, jax.random.fold_in(key, 99), 1)[1])
            blocks = {"xla": [], "blk": []}
            for rnd in range(3):
                order = ("xla", "blk") if rnd % 2 == 0 else ("blk", "xla")
                for name in order:
                    sv, state = variants[name]
                    ms, state = timed_sweep(sv, li, do_gc, state,
                                            jax.random.fold_in(key, rnd),
                                            reps)
                    variants[name] = (sv, state)
                    blocks[name].append(ms)
            mx = statistics.median(blocks["xla"])
            mb = statistics.median(blocks["blk"])
            results[(li, do_gc)] = (mx, mb)
            print(f"layer {li} do_gc={int(do_gc)}: xla {mx:8.1f} ms  "
                  f"blk {mb:8.1f} ms  speedup {mx / mb:5.2f}x  "
                  f"blocks x={[round(x, 1) for x in blocks['xla']]} "
                  f"b={[round(x, 1) for x in blocks['blk']]}", flush=True)

    # Accept-equality: both variants evolved from the same init with the
    # same keys; their live labelings must match bit-for-bit.
    lx = np.asarray(variants["xla"][1][0])
    lb = np.asarray(variants["blk"][1][0])
    print(f"labelings identical: {bool((lx == lb).all())}", flush=True)

    gsum = [sum(results[(li, g)][i] for li in range(nlayers))
            for g in (False, True) for i in (0, 1)]
    print(f"\nfull greedy sweep: xla {gsum[0]:.0f} ms -> blk {gsum[1]:.0f}")
    print(f"full GC sweep:     xla {gsum[2]:.0f} ms -> blk {gsum[3]:.0f}")
    print(f"schedule est (2 pm + 5 gc): xla "
          f"{(2 * gsum[0] + 5 * gsum[2]) / 1e3:.2f} s -> blk "
          f"{(2 * gsum[1] + 5 * gsum[3]) / 1e3:.2f} s")


if __name__ == "__main__":
    main()
