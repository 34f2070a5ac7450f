"""Reconciliation experiments for the venus/tsukuba accuracy question
(VERDICT r2 weak #4): is the residual-vs-paper gap explained by
(a) optimization headroom (more outer iterations), (b) run-to-run RNG
spread, or (c) a semantic deviation?

Runs the V2 CLI on one dataset at several (iterations, seed) points and
reports bad rates from the saved disparities. doDual post-processing was
measured separately (/tmp/parity_dual.json): it does NOT close the gap
(venus bad1.0 nonocc 0.83 single-view -> 0.89 dual).

Usage: python tools/venus_reconcile.py [dataset=venus] [out.json]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))

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
    from localexpstereo_tpu.cli import main as cli
    from localexpstereo_tpu.utils import datasets, pfm

    name = sys.argv[1] if len(sys.argv) > 1 else "venus"
    out_path = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/{name}_reconcile.json"
    target = f"/root/reference/data/MiddV2/{name}"
    pair = datasets.load_data(target, 0)

    cases = ([("iters", it, 0) for it in (5, 10, 15)] +
             [("seed", 5, sd) for sd in (1, 2, 3)])
    results = []
    for tag, iters, seed in cases:
        out_dir = f"/tmp/reconcile_{name}_{tag}_{iters}_{seed}"
        os.makedirs(out_dir, exist_ok=True)
        argv = ["-mode", "MiddV2", "-targetDir", target,
                "-outputDir", out_dir, "-doDual", "0",
                "-iterations", str(iters), "-pmIterations", "2",
                "-seed", str(seed)]
        t0 = time.perf_counter()
        rc = cli.main(argv)
        assert rc == 0
        disp = pfm.read_pfm(os.path.join(out_dir, "disp0.pfm"))
        rec = {"iterations": iters, "seed": seed,
               "wall_s": round(time.perf_counter() - t0, 1),
               **bad_rates(disp, pair.disp_gt, pair.nonocc,
                           pair.calib.gt_prec)}
        results.append(rec)
        print(json.dumps(rec), flush=True)

    with open(out_path, "w") as f:
        json.dump({"dataset": name, "runs": results}, f, indent=1)


if __name__ == "__main__":
    main()
