"""Decisive probe for the venus dark-strip trap: ORACLE fusion.

Fits per-tile planes to the GROUND-TRUTH disparities and fuses that
labeling into a converged solve. Outcomes:
  - bad rate drops -> the fusion machinery adopts the true plane when
    offered; the earlier completion externals just never contained it.
  - bad rate unchanged -> the strip flip is NOT energy-negative under the
    full energy (the anatomy's boundary-gain estimate overcounted), i.e.
    the trap is energy-real and no proposal can fix it at this lambda.

Also reports the energy of the oracle-substituted strip directly.

Usage: python tools/fuse_oracle.py [dataset=venus] [iters=5] [pm=2]
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


def gt_plane_labeling(gt, block=32):
    """Per-tile LSQ plane fits to valid GT disparities -> [H, W, 4]."""
    h, w = gt.shape
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    out = np.zeros((h, w, 4), np.float32)
    for y0 in range(0, h, block):
        for x0 in range(0, w, block):
            y1, x1 = min(y0 + block, h), min(x0 + block, w)
            tg = gt[y0:y1, x0:x1].ravel()
            tx = xs[y0:y1, x0:x1].ravel()
            ty = ys[y0:y1, x0:x1].ravel()
            m = np.isfinite(tg) & (tg > 0)
            if m.sum() < 8:
                continue
            cx_, cy_ = tx[m].mean(), ty[m].mean()
            a_mat = np.stack([tx[m] - cx_, ty[m] - cy_,
                              np.ones(m.sum(), np.float32)], -1)
            p = np.linalg.lstsq(a_mat, tg[m], rcond=None)[0]
            out[y0:y1, x0:x1, 0] = p[0]
            out[y0:y1, x0:x1, 1] = p[1]
            out[y0:y1, x0:x1, 2] = p[2] - p[0] * cx_ - p[1] * cy_
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
    ext = gt_plane_labeling(pair.disp_gt, block=32)
    coarse = len(s.layers) - 1
    for li in (coarse, 1, 0, coarse, 0):
        s.fuse(ext, mode=0, layer_index=li)
        res["steps"].append({"layer": li, **report(f"oracle fuse L{li}")})
    with open(f"/tmp/fuse_oracle_{name}.json", "w") as f:
        json.dump(res, f, indent=1)


if __name__ == "__main__":
    main()
