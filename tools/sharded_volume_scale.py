"""Config-4 demonstration at the MOTIVATING scale (VERDICT r3 item 5).

Runs :class:`parallel.dvolume.ShardedDVolumeSolver` on the 8-device CPU
mesh at a full-resolution MiddV3-shaped problem — ndisp 400, 1988 x 2880,
uint8 storage (the scale where the reference's hold-both-volumes-in-RAM
strategy, ``main.cpp:353-368``, stops mapping to a single accelerator's
HBM: the f32 volume pair alone is 18.3 GiB > a v5e's 16 GiB) — and
records:

- the measured per-device volume residency (actual device shard bytes) vs
  the single-device residency, proving the ``1/n + 2/D`` split that
  DISPARITY-axis sharding guarantees independent of layer geometry
  (H-sharding's ``8*s_max + R`` halo is ~2100 rows >= the whole image at
  this geometry — its "shards" are full copies, which is why round 4
  replaced it for the at-scale mode);
- the HBM budget arithmetic for a v5e (16 GiB/chip) at this shape;
- an actual executed slice of the solve at this scale (chunked init + one
  greedy color step of the fine layer), with the state checksum printed so
  reruns are comparable.

Usage:  python tools/sharded_volume_scale.py [--ndisp 400] [--height 1988]
            [--width 2880] [--colors 1] [--init-chunk 16]

Writes a JSON summary to tools/sharded_volume_scale.json (committed copy =
the artifact reviewed with ARCHITECTURE.md's budget table).
"""
import argparse
import json
import os
import sys
import time

os.environ.setdefault("XLA_FLAGS",
                      "--xla_force_host_platform_device_count=8")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from localexpstereo_tpu.config import PARAMS_GF  # noqa: E402
from localexpstereo_tpu.parallel import mesh as mesh_mod  # noqa: E402
from localexpstereo_tpu.parallel.dvolume import (  # noqa: E402
    ShardedDVolumeSolver, dsharded_layer_sweep)


def build_problem(h, w, nd, seed=0):
    rng = np.random.default_rng(seed)
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    d_true = np.clip(0.08 * xs + 0.01 * ys, 0, nd - 1)
    # Build the volume plane by plane to keep host RAM flat (~1 full f32
    # volume live: 8.5 GiB at the default shape, on a 125 GiB host).
    vol = np.empty((nd, h, w), np.float32)
    for d in range(nd):
        vol[d] = np.minimum(np.abs(d - d_true) * 0.15, 1.0)
        vol[d] += rng.random((h, w), np.float32) * 0.05
    img = (rng.random((h, w, 3)) * 255).astype(np.float32)
    return img, vol


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ndisp", type=int, default=400)
    ap.add_argument("--height", type=int, default=1988)
    ap.add_argument("--width", type=int, default=2880)
    ap.add_argument("--colors", type=int, default=1,
                    help="greedy color steps of the fine layer to execute")
    ap.add_argument("--init-chunk", type=int, default=16,
                    help="cell rows per chunked-init dispatch")
    ns = ap.parse_args()
    h, w, nd = ns.height, ns.width, ns.ndisp

    n_dev = len(jax.devices())
    print(f"devices: {n_dev} x {jax.devices()[0].platform}", flush=True)
    t0 = time.time()
    img, vol = build_problem(h, w, nd)
    print(f"problem built: vol [{nd},{h},{w}] f32 host "
          f"({vol.nbytes / 2**30:.2f} GiB) in {time.time() - t0:.1f}s",
          flush=True)

    params = PARAMS_GF.replace(windR=20, lambda_=0.5, th_col=0.5)
    mesh = mesh_mod.make_mesh((n_dev,), ("dshard",), jax.devices())
    unit_sizes = [max(1, int(w * f)) for f in (0.01, 0.03, 0.09)]
    solver = ShardedDVolumeSolver(img, img, params, max_disp=float(nd - 1),
                                  vol0=vol, vol1=vol, mesh=mesh,
                                  vol_dtype="uint8",
                                  init_row_chunk=ns.init_chunk)
    for i, us in enumerate(unit_sizes):
        solver.add_layer(us, ("expansion", "ransac", "random7") if i == 0
                         else ("expansion", "expansion", "ransac"))
    t0 = time.time()
    solver.finalize()
    del vol
    solver.vol0 = solver.vol1 = None
    jax.block_until_ready(solver.data.vol)
    t_build = time.time() - t0

    # ---- residency accounting (from the actual device arrays) -------------
    v = solver.data.vol           # [n_dev, V, dq+2, Hp, Wp] uint8, sharded
    shard_bytes = int(np.prod(v.shape[1:])) * v.dtype.itemsize
    hp, wp = v.shape[3], v.shape[4]
    single_bytes = 2 * nd * hp * wp          # the unsharded padded pair
    frac = shard_bytes / single_bytes
    f32_raw_pair_gib = 2 * nd * h * w * 4 / 2**30

    summary = {
        "shape": {"ndisp": nd, "height": h, "width": w,
                  "vol_dtype": "uint8"},
        "n_devices": n_dev,
        "sharding_axis": "disparity",
        "reference_f32_pair_gib": round(f32_raw_pair_gib, 2),
        "single_device_volume_bytes": single_bytes,
        "single_device_volume_gib": round(single_bytes / 2**30, 3),
        "per_device_shard_bytes": shard_bytes,
        "per_device_shard_gib": round(shard_bytes / 2**30, 3),
        "residency_fraction": round(frac, 4),
        "ideal_fraction_plus_halo": round(1.0 / n_dev + 2.0 / nd, 4),
        "owned_planes_per_device": solver.dq,
        "halo_planes_each_side": 1,
        "build_seconds": round(t_build, 1),
    }
    print(json.dumps(summary, indent=2), flush=True)
    # Persist the residency/budget half immediately — the executed slice
    # below runs for tens of minutes on the CPU mesh and a timeout there
    # should not lose the accounting.
    out = os.path.join(os.path.dirname(__file__),
                       "sharded_volume_scale.json")
    with open(out, "w") as f:
        json.dump(summary, f, indent=2)

    # ---- execute at scale: chunked init + greedy color step(s), layer 0 ---
    key = jax.random.PRNGKey(0)
    t0 = time.time()
    lab_m, cost_m = solver._init_state(jax.random.fold_in(key, 1000), 0)
    jax.block_until_ready(cost_m)
    t_init = time.time() - t0
    print(f"sharded init ({ns.init_chunk}-row chunks): {t_init:.1f}s; "
          f"mean cell cost {float(jnp.mean(cost_m)):.4f}", flush=True)

    layer = solver.layers[0]
    plan, active, (oxs, oys, rmasks, coxs, coys, dzs, nrs, keys) = \
        solver._layer_inputs(0, layer, 0, key)
    ncol = max(1, min(ns.colors, oxs.shape[0]))
    t0 = time.time()
    lab_m, cost_m = dsharded_layer_sweep(
        solver.data, solver.cfg, lab_m, cost_m,
        oxs[:ncol], oys[:ncol], rmasks[:ncol], coxs[:ncol], coys[:ncol],
        dzs, nrs, keys[:ncol],
        unit_size=layer.unit_size, nbx=layer.nbx, nby=layer.nby,
        plan=plan, do_gc=False, mode=0, dq=solver.dq,
        d_total=solver.d_total, axis_name="dshard", mesh=solver.mesh,
        step_active=active)
    jax.block_until_ready(cost_m)
    t_color = time.time() - t0
    checksum = float(jnp.sum(cost_m, dtype=jnp.float64))
    print(f"{ncol} greedy color step(s), fine layer (s={layer.unit_size}): "
          f"{t_color:.1f}s; cost checksum {checksum:.3f}", flush=True)
    summary["init_seconds"] = round(t_init, 1)
    summary["greedy_color_steps"] = ncol
    summary["greedy_color_seconds"] = round(t_color, 1)
    summary["cost_checksum"] = checksum

    with open(out, "w") as f:
        json.dump(summary, f, indent=2)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
