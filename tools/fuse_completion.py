"""Piecewise-planar completion fusion on a real V2 dataset.

Targets the documented venus dark-strip trap (PARITY.md "Anatomy"): solve
once, then fuse `proposals.completion_labeling` externals at several
(block, offset) grids — the confident textured surround dictates the
plane across low-texture regions, and the fusion min-cut adopts it only
where energy drops.

Usage: python tools/fuse_completion.py [dataset=venus] [iters=5] [pm=2]
Env: FUSE_PLATFORM=cpu to dodge a wedged tunnel.
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

from fuse_seeds import bad_rates


def main():
    from localexpstereo_tpu.config import PARAMS_GF
    from localexpstereo_tpu.models.engine import (
        LocalExpansionSolver, LAYER0_PROPOSERS, COARSE_PROPOSERS,
        energy_audit)
    from localexpstereo_tpu.models import proposals
    from localexpstereo_tpu.ops import plane as plane_ops
    from localexpstereo_tpu.utils import datasets
    import jax.numpy as jnp

    name = sys.argv[1] if len(sys.argv) > 1 else "venus"
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    pm = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    target = f"/root/reference/data/MiddV2/{name}"
    pair = datasets.load_data(target, 0)
    params = PARAMS_GF.replace(windR=20, lambda_=1.0)

    s = LocalExpansionSolver(pair.im0, pair.im1, params,
                             pair.max_disparity, seed=0)
    for i, sz in enumerate([5, 15, 25]):
        s.add_layer(sz, LAYER0_PROPOSERS if i == 0 else COARSE_PROPOSERS)
    t0 = time.time()
    s.run(iterations=iters, view_modes=(0,), pm_iterations=pm)

    def report(tag):
        lab = np.asarray(s._unpadded_labeling(s._state, 0))
        disp = np.asarray(plane_ops.disparity_map(jnp.asarray(lab)))
        e = float(energy_audit(s.data, s.cfg, *s._state[0], 0)[0])
        r = {"energy": round(e, 1),
             **bad_rates(disp, pair.disp_gt, pair.nonocc,
                         pair.calib.gt_prec)}
        print(f"{tag}: {r} ({time.time()-t0:.0f}s)", flush=True)
        return r

    res = {"dataset": name, "baseline": report("baseline"), "steps": []}
    cur_lab = np.asarray(s._unpadded_labeling(s._state, 0))
    # Coarsest layer first: its 3s x 3s fusion regions (75 x 75 at the
    # reference layer sizes) can flip a full low-texture strip width in one
    # move, which 15 x 15 fine-layer regions cannot (seams both ways).
    coarse = len(s.layers) - 1
    for block in (64, 48, 32):
        for off in ((0, 0), (block // 2, block // 2)):
            ext = proposals.completion_labeling(cur_lab, pair.im0,
                                                block=block, offset=off)
            for li in (coarse, 0):
                s.fuse(ext, mode=0, layer_index=li)
            cur_lab = np.asarray(s._unpadded_labeling(s._state, 0))
            res["steps"].append({"block": block, "offset": list(off),
                                 **report(f"block {block} off {off}")})
    with open(f"/tmp/fuse_completion_{name}.json", "w") as f:
        json.dump(res, f, indent=1)


if __name__ == "__main__":
    main()
