"""Quantify the edge-cell geometry deviation (VERDICT r3 item 8).

The reference merges fractional right/bottom edge cells into their
neighbors (``LayerManager.h:88-165``: an edge cell narrower than s is
absorbed, so the absorbed pixels are covered by the bigger cell's proposal
draws). This repo's fixed-shape grid keeps uniform s-cells and CLIPS the
fractional ones (``models/grid.py``), so border pixels get EXTRA dedicated
proposal draws from the fractional cells instead of shared draws from a
merged, larger neighbor.

This tool bounds what that costs (or buys). For each bundled V2 dataset it
runs the full reference schedule (5 GC + 2 PM, seed 0, single view) in two
variants:

- ``default``: the shipped clip+mask grid (fractional cells draw their own
  proposals);
- ``noedge``: fractional cells' region masks cleared — they draw NOTHING,
  and border pixels are only reachable through neighboring cells' shared
  3s-windows. The reference's merged-cell geometry lies BETWEEN the two
  (merged cells draw from a larger support that includes the border
  pixels), so the pair brackets the achievable effect of edge-cell
  geometry on border accuracy.

Reported per dataset and variant: bad0.5 nonocc over the EDGE BAND
(pixels within 3*s_max of the border — the reach of a coarse-layer shared
window) and over the INTERIOR, plus final energy. Results land in
``tools/edge_geometry.json``; the PARITY.md "edge geometry" section quotes
them.

Usage: python tools/edge_geometry.py [datasets...]   (default: all four)
"""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from localexpstereo_tpu.config import PARAMS_GF  # noqa: E402
from localexpstereo_tpu.models import engine as engine_mod  # noqa: E402
from localexpstereo_tpu.ops import plane as plane_ops  # noqa: E402
from localexpstereo_tpu.utils import datasets  # noqa: E402

V2_DIR = "/root/reference/data/MiddV2"
SIZES = [5, 15, 25]


class NoEdgeDrawSolver(engine_mod.LocalExpansionSolver):
    """Clears the region mask of fractional (clipped) edge cells, so they
    draw no proposals — the lower bracket of the merged-cell emulation."""

    def _layer_inputs(self, li, layer, outer_iter, key):
        plan, active, (oxs, oys, rmasks, coxs, coys, dzs, nrs, keys) = \
            super()._layer_inputs(li, layer, outer_iter, key)
        s = layer.unit_size
        frac = ((self.cfg.width - np.asarray(oxs) < s)
                | (self.cfg.height - np.asarray(oys) < s))
        rmasks = jnp.asarray(np.asarray(rmasks) & ~frac)
        return plan, active, (oxs, oys, rmasks, coxs, coys, dzs, nrs, keys)


def run_variant(pair, cls):
    params = PARAMS_GF.replace(windR=20, lambda_=1.0)
    s = cls(pair.im0, pair.im1, params, pair.max_disparity, seed=0)
    for i, sz in enumerate(SIZES):
        s.add_layer(sz, engine_mod.LAYER0_PROPOSERS if i == 0
                    else engine_mod.COARSE_PROPOSERS)
    labeling, _ = s.run(iterations=5, view_modes=(0,), pm_iterations=2)
    lab_m, cost_m = s._state[0]
    total, _, _ = engine_mod.energy_audit(s.data, s.cfg, lab_m, cost_m, 0)
    disp = np.asarray(plane_ops.disparity_map(jnp.asarray(labeling)))
    prec = pair.calib.gt_prec
    if prec > 0:
        disp = np.rint(disp / prec) * prec
    return disp, float(total)


def band_masks(h, w, band):
    ys, xs = np.mgrid[0:h, 0:w]
    edge = ((xs < band) | (xs >= w - band) | (ys < band) | (ys >= h - band))
    return edge


def bad_rate(disp, gt, valid):
    n = valid.sum()
    if n == 0:
        return float("nan")
    return 100.0 * (1.0 - ((np.abs(disp - gt) <= 0.5) & valid).sum() / n)


def main():
    names = sys.argv[1:] or ["cones", "teddy", "venus", "tsukuba"]
    band = 3 * max(SIZES)
    out = {"band_px": band, "schedule": "5GC+2PM seed0 single-view",
           "datasets": {}}
    for name in names:
        pair = datasets.load_data(os.path.join(V2_DIR, name), 0)
        h, w = pair.im0.shape[:2]
        edge = band_masks(h, w, band)
        gt_ok = (pair.disp_gt > 0) & np.isfinite(pair.disp_gt) & pair.nonocc
        rec = {}
        for label, cls in (("default", engine_mod.LocalExpansionSolver),
                           ("noedge", NoEdgeDrawSolver)):
            disp, energy = run_variant(pair, cls)
            rec[label] = {
                "bad05_edge": round(bad_rate(disp, pair.disp_gt,
                                             gt_ok & edge), 4),
                "bad05_interior": round(bad_rate(disp, pair.disp_gt,
                                                 gt_ok & ~edge), 4),
                "bad05_nonocc": round(bad_rate(disp, pair.disp_gt, gt_ok),
                                      4),
                "energy": round(energy, 1),
            }
            print(f"{name:8s} {label:8s} edge {rec[label]['bad05_edge']:7.3f}"
                  f"  interior {rec[label]['bad05_interior']:7.3f}"
                  f"  all {rec[label]['bad05_nonocc']:7.3f}"
                  f"  E {energy:.0f}", flush=True)
        rec["edge_delta_noedge_minus_default"] = round(
            rec["noedge"]["bad05_edge"] - rec["default"]["bad05_edge"], 4)
        out["datasets"][name] = rec
        # Incremental dump: a multi-hour CPU run must survive a timeout.
        path = os.path.join(os.path.dirname(__file__), "edge_geometry.json")
        merged = out
        if os.path.exists(path):
            with open(path) as f:
                merged = json.load(f)
            merged["datasets"].update(out["datasets"])
        with open(path, "w") as f:
            json.dump(merged, f, indent=1)
        print(f"wrote {path} ({name})")


if __name__ == "__main__":
    main()
