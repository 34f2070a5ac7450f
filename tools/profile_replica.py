"""Localize the replica wave-scaling overhead on real hardware.

Round-5 bench context: the primary leg measured 12.42 s/frame but
``replica2_s_per_frame`` came in at 21.25 — a 71% per-pair overhead where
round 3 measured 9.7% at k=1.  This tool times, INTERLEAVED in one process
on live engine state (the only trustworthy comparison on the drifting
tunnel — ARCHITECTURE.md "bench-number hygiene"):

  - one pm (greedy) sweep and one GC sweep of the single-pair engine,
    ReplicaSolver k=1, and ReplicaSolver k=2 (per-pair normalized);
  - the end-of-run labeling D2H (``np.asarray``) each run() pays inside
    the timed region, per pair;
  - the init step of each.

Writes tools/profile_replica.json.  Usage: python tools/profile_replica.py
[scale] [reps].
"""
import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(_HERE, ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax

# The axon TPU plugin ignores the JAX_PLATFORMS env var; forcing the
# platform through jax.config BEFORE backend init is the one reliable way
# to run this tool off-TPU (same pattern as tests/conftest.py and the CLI).
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np

from bench import build_problem, _layer_sizes
from localexpstereo_tpu.config import PARAMS_GF
from localexpstereo_tpu.models.engine import (LocalExpansionSolver,
                                              LAYER0_PROPOSERS,
                                              COARSE_PROPOSERS)
from localexpstereo_tpu.parallel import mesh as mesh_mod
from localexpstereo_tpu.parallel.replica import ReplicaSolver


def main():
    scale = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    nrep = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    img, vol, h, w, nd = build_problem(scale)
    params = PARAMS_GF.replace(windR=20, lambda_=0.5, th_col=0.5)
    sizes = _layer_sizes(w)
    print(f"# geometry {h}x{w} nd={nd} sizes={sizes} "
          f"backend={jax.default_backend()}", flush=True)

    eng = LocalExpansionSolver(img, img, params, max_disp=float(nd - 1),
                               vol0=vol, vol1=vol, seed=0, vol_dtype="uint8")
    for i, sz in enumerate(sizes):
        eng.add_layer(sz, LAYER0_PROPOSERS if i == 0 else COARSE_PROPOSERS)
    eng.run(iterations=1, view_modes=(0,), pm_iterations=1)   # warm
    print(f"# engine resolved backend: {eng.resolved_unary_backend()}",
          flush=True)

    mesh = mesh_mod.make_mesh((1,), ("data",), jax.devices()[:1])
    reps = {}
    for k in (1, 2):
        ims = np.stack([img] * k)
        vols = np.stack([vol] * k)
        r = ReplicaSolver(ims, ims, params, max_disp=float(nd - 1),
                          mesh=mesh, unit_sizes=sizes, vols0=vols,
                          vols1=vols, seed=0, vol_dtype="uint8")
        r.precompile(view_modes=(0,), pm_iterations=1, iterations=1)
        print(f"# replica k={k} cfg backend: {r.cfg.unary_backend}",
              flush=True)
        reps[k] = r

    key = jax.random.PRNGKey(7)

    def eng_sweep(do_gc):
        st = eng._state[0]
        out = eng._sweep(st, 0, 0, do_gc, key)
        jax.block_until_ready(out[1])

    def rep_sweep(k, do_gc):
        r = reps[k]
        out = r.sweep(r._state[0], 0, do_gc, mode=0, key=key)
        jax.block_until_ready(out[1])

    variants = {
        "eng_pm": lambda: eng_sweep(False),
        "eng_gc": lambda: eng_sweep(True),
        "rep1_pm": lambda: rep_sweep(1, False),
        "rep1_gc": lambda: rep_sweep(1, True),
        "rep2_pm": lambda: rep_sweep(2, False),
        "rep2_gc": lambda: rep_sweep(2, True),
    }
    for fn in variants.values():   # one untimed warm pass each
        fn()

    walls = {name: [] for name in variants}
    for it in range(nrep):
        for name, fn in variants.items():
            t0 = time.perf_counter()
            fn()
            walls[name].append(time.perf_counter() - t0)
            print(f"# rep {it} {name}: {walls[name][-1]:.3f}s", flush=True)

    out = {"geometry": [h, w, nd], "sizes": sizes,
           "engine_backend": eng.resolved_unary_backend()}
    for name, ts in walls.items():
        med = sorted(ts)[len(ts) // 2]
        per_pair = med / (2 if name.startswith("rep2") else 1)
        out[name + "_s"] = round(med, 4)
        out[name + "_per_pair_s"] = round(per_pair, 4)

    # end-of-run D2H each run() pays inside the timed region
    for label, arr in (("eng", eng._state[0][0]),
                       ("rep1", reps[1]._state[0][0]),
                       ("rep2", reps[2]._state[0][0])):
        jax.block_until_ready(arr)
        t0 = time.perf_counter()
        np.asarray(arr)
        out[f"d2h_{label}_s"] = round(time.perf_counter() - t0, 4)

    # init step
    for label, fn in (("eng", lambda: eng._init_state(key, 0)),
                      ("rep1", lambda: reps[1].init(0)),
                      ("rep2", lambda: reps[2].init(0))):
        jax.block_until_ready(fn())          # warm
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        out[f"init_{label}_s"] = round(time.perf_counter() - t0, 4)

    print(json.dumps(out, indent=1), flush=True)
    with open(os.path.join(_HERE, "tools", "profile_replica.json"),
              "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
