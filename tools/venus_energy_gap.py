"""Classifies the venus accuracy gap (VERDICT r2 weak #4) as optimization
vs model: solves venus with the reference demo schedule, finds the dominant
bad-pixel component (the dark strip at cols ~171-198 — 82% of all venus bad
pixels), substitutes the GT-fitted plane over that component into the FINAL
labeling, and audits total energy of both configurations with
``engine.energy_audit``.

 - substituted energy LOWER  -> a better minimum exists that the local
   expansion schedule cannot reach (optimization gap; the reference's
   schedule has the same local-move structure, ``FastGCStereo.h:133-226``);
 - substituted energy HIGHER -> the model itself prefers the wrong plane
   (data-term semantics would need reconciling against the reference).

CPU-measured context (2026-08-17): the strip's unary alone PREFERS the
wrong plane (mean 1.643 vs 1.777 for GT; fronto-parallel scan bottoms at
d=4.5 while GT=3.45), so the classification hinges on the smoothness term
this script adds.

Usage: python tools/venus_energy_gap.py [iterations=5] [seed=0]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))

import jax

if os.environ.get("FORCE_CPU") == "1":
    # The axon plugin ignores JAX_PLATFORMS; a wedged tunnel otherwise hangs
    # even CPU-intent runs at backend init (see tests/conftest.py).
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
from scipy import ndimage

from localexpstereo_tpu.config import PARAMS_GF
from localexpstereo_tpu.models.engine import (LocalExpansionSolver,
                                              LAYER0_PROPOSERS,
                                              COARSE_PROPOSERS, energy_audit)
from localexpstereo_tpu.ops import plane as plane_ops
from localexpstereo_tpu.utils import datasets


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    pair = datasets.load_data("/root/reference/data/MiddV2/venus", 0)
    params = PARAMS_GF.replace(windR=20, lambda_=1.0)

    solver = LocalExpansionSolver(pair.im0, pair.im1, params,
                                  pair.max_disparity, seed=seed)
    for i, sz in enumerate([5, 15, 25]):
        solver.add_layer(sz, LAYER0_PROPOSERS if i == 0 else COARSE_PROPOSERS)
    labeling, _ = solver.run(iterations=iters, view_modes=(0,),
                             pm_iterations=2)
    state = solver._state[0]

    disp = np.asarray(plane_ops.disparity_map(jnp.asarray(labeling)))
    gt, prec = pair.disp_gt, pair.calib.gt_prec
    d = np.rint(disp / prec) * prec
    valid = np.isfinite(gt) & (gt > 0)
    bad = (np.abs(d - gt) > 1.0) & valid & pair.nonocc
    lab_cc, ncc = ndimage.label(bad)
    sizes = np.bincount(lab_cc.ravel())[1:]
    if sizes.size == 0:
        print("no bad pixels at 1.0 — nothing to classify")
        return
    m = lab_cc == (int(np.argmax(sizes)) + 1)
    ys, xs = np.where(m)
    print(f"dominant comp: {m.sum()} px of {bad.sum()} bad "
          f"({100.0 * m.sum() / bad.sum():.0f}%), bbox y[{ys.min()},"
          f"{ys.max()}] x[{xs.min()},{xs.max()}]")

    a_ = np.stack([xs, ys, np.ones_like(xs)], 1).astype(np.float64)
    coef, *_ = np.linalg.lstsq(a_, gt[m].astype(np.float64), rcond=None)
    print(f"GT plane fit a={coef[0]:.5f} b={coef[1]:.5f} c={coef[2]:.3f} "
          f"resid {np.abs(a_ @ coef - gt[m]).mean():.3f}")

    def audit(st):
        tot, dc, sc = energy_audit(solver.data, solver.cfg,
                                   labeling_m=st[0], cost_m=st[1], mode=0)
        return float(tot), float(dc), float(sc)

    e0 = audit(state)
    print(f"solver solution : total {e0[0]:.1f} (data {e0[1]:.1f} "
          f"smooth {e0[2]:.1f})")

    # Substitute the GT plane over the component. energy_audit's data term
    # sums the STORED filtered unary (Evaluator.h:119-121 semantics), so the
    # substituted pixels' cost must be recomputed too: evaluate the GT
    # plane's filtered unary over the bbox expanded by 2r (guided-filter
    # values are window-placement-independent for pixels > 2r interior,
    # GuidedFilter.h:298-300) and scatter it over the component.
    from localexpstereo_tpu.models import energy as energy_mod
    p = solver.cfg.pad
    r = solver.cfg.params.guided_radius
    y0, x0 = int(ys.min()) - 2 * r, int(xs.min()) - 2 * r
    size = int(max(ys.max() - y0, xs.max() - x0)) + 1 + 2 * r
    props = jnp.asarray([[coef[0], coef[1], coef[2], 0.0]], jnp.float32)
    q = np.asarray(energy_mod.unary_windows(
        solver.data, solver.cfg, 0, props,
        jnp.asarray([x0], jnp.int32), jnp.asarray([y0], jnp.int32),
        0, size))[0]

    lab_m = np.asarray(state[0])
    cost_m = np.asarray(state[1])
    sub = lab_m.copy()
    subc = cost_m.copy()
    yy, xx = ys + p, xs + p
    sub[yy, xx, 0] = coef[0]
    sub[yy, xx, 1] = coef[1]
    sub[yy, xx, 2] = coef[2]
    sub[yy, xx, 3] = 0.0
    subc[yy, xx] = q[ys - y0, xs - x0]
    e1 = audit((jnp.asarray(sub), jnp.asarray(subc)))
    print(f"GT-substituted  : total {e1[0]:.1f} (data {e1[1]:.1f} "
          f"smooth {e1[2]:.1f})")
    verdict = ("OPTIMIZATION GAP (better minimum exists)"
               if e1[0] < e0[0] else
               "MODEL PREFERENCE (energy favors the wrong plane)")
    print(f"delta {e1[0] - e0[0]:+.1f} -> {verdict}")


if __name__ == "__main__":
    main()
