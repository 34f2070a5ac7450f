"""Benchmark: MiddV3 halfH-scale local expansion stereo on real TPU.

Prints the primary JSON line IMMEDIATELY after the primary leg finishes
(and re-prints a merged line with extras at the end — parsers may take
either). The primary metric is sec/frame for the reference's headline
workload shape (Adirondack halfH: 1436x992, MC-CNN cost volume) running
the full pipeline — 2 PatchMatch-init sweeps + 5 graph-cut sweeps, single
view, layers {1%, 3%, 9%} of width with the reference proposer sets.

The MC-CNN volume itself is not redistributable (the reference's
``data/MiddV3`` README asks users to download it), so the volume is
synthesized at the exact same shape; the optimizer's work is data-independent
up to min-cut convergence, which the synthetic slanted-plane volume
exercises. ``vs_baseline`` compares against the reference CPU binary's 237 s
end-to-end Adirondack time (``GuidedFilter.h:139-141``; see BASELINE.md).

Robustness (round-3 hardening — round 2's number was lost to a driver
timeout against a wedged tunneled device):

- a persistent JAX compilation cache lives in ``.jax_cache/`` next to this
  file, so repeat runs in the same workspace start compile-warm;
- a startup probe dispatches one tiny device op with a hard timeout and
  emits a parseable error record if the device never answers;
- a watchdog thread monitors per-sweep heartbeats and emits an error record
  if the device wedges before the primary metric lands;
- warmup is ONE pm + ONE gc sweep — the proposal plans are padded to the
  outer_iter=0 variant (engine._layer_inputs), so this compiles the exact
  executables the full timed schedule reuses;
- extra legs are gated on a wall-clock budget (BENCH_BUDGET_S, default
  1500 s) and individually exception-guarded.

Extra fields (unless BENCH_FAST=1, each skipped once over budget):
- ``videorate_s_per_frame``: steady-state serving mode (``serving.py``) —
  persistent compiled engine, cell-seeded warm start from the previous
  frame, 1 GC sweep per frame, at the full halfH scale (shares the primary
  leg's executables);
- ``cones_doDual_s`` / ``cones_bad05_nonocc``: REAL-data V2 end-to-end run
  (bundled cones, full 5 GC + 2 PM dual-view schedule incl. postprocess);
- ``replica1_s_per_frame``: the DEPLOYMENT-shape program — the single-pair
  engine under ``shard_map`` over the mesh 'data' axis (one pair per chip;
  ``parallel/replica.py``), measured at batch=1 on this chip. Its overhead
  vs the primary leg is the per-pair cost of the sharded program.
- ``replica2_s_per_frame``: the same program with k=2 pairs per device
  (two waves on this chip), per-pair amortized — the MEASURED wave-scaling
  evidence behind the v5e-8 estimate.
- ``mccnn_volume_s``: on-device MC-CNN cost volume at the primary leg's
  halfH geometry (config 5's front half; the reference needs an offline
  Torch/CUDA MC-CNN for this).
- ``batch15_s_per_frame``: BASELINE config 3 — 15 same-shape pairs through
  the real batch driver (``cli/batch.py``), amortized s/frame from its
  ``batch_summary.json``.
- ``v5e8_throughput_s_per_frame_est``: amortized s/frame on a v5e-8 —
  8 chips each run the per-device program on their own pairs concurrently
  and communication-free, so throughput = replica2 / 8 when measured
  (else replica1 / 8, else primary / 8).

Env overrides: BENCH_SCALE (default 1.0) scales H/W/ndisp for quick checks;
BENCH_ITERS / BENCH_PM_ITERS override the sweep counts; BENCH_FAST=1 skips
the extras; BENCH_BUDGET_S / BENCH_STALL_S tune the watchdogs.
"""
import json
import os
import sys
import threading
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _HERE)
# Persistent compilation cache: keyed by (platform, jaxlib, flags), so TPU
# and CPU runs coexist; repeat runs in this workspace deserialize instead of
# recompiling. Must be set before jax import.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(_HERE, ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np

BASELINE_SECONDS = 237.0  # reference filter_raw desktop end-to-end
CONES_DIR = "/root/reference/data/MiddV2/cones"
T0 = time.time()
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "1900"))
STALL_S = float(os.environ.get("BENCH_STALL_S", "900"))

_last_beat = [time.time()]
_primary_done = threading.Event()


def beat(*_a, **_k):
    _last_beat[0] = time.time()


class _BeatEvaluator:
    """Minimal evaluator shim: every per-sweep hook is a heartbeat, so the
    watchdog can tell 'slow compile' from 'wedged device'."""
    start = stop = beat

    def evaluate(self, *a, **k):
        beat()

    def save_consistency(self, *a, **k):
        beat()


def _emit(obj):
    print(json.dumps(obj), flush=True)


def _fail(msg, code):
    _emit({"metric": "midv3_halfH_sec_per_frame", "value": -1.0,
           "unit": "s", "vs_baseline": -1.0, "error": msg,
           # Last driver-relevant hardware measurement of this workload at
           # an earlier commit of the same round, for context when the
           # tunneled device is unreachable at bench time (it wedged for
           # 7+ hours straight during round 3): commit 6b50199 measured
           # 14.865 s/frame with the uint8 default on the real v5e chip.
           "last_hw_measurement": {
               "s_per_frame": 14.865, "commit": "6b50199",
               "note": "HISTORICAL round-3 on-device measurement, NOT a "
                       "result of this bench run"},
           "elapsed_s": round(time.time() - T0, 1)})
    os._exit(code)


def _watchdog():
    """Stall detector that can tell 'wedged tunnel' from 'long XLA compile':
    a wedge leaves the process idle-blocked on the device RPC (~0 CPU),
    while compilation burns host CPU. CPU progress counts as a heartbeat —
    otherwise a cold-cache warmup (several multi-minute color_step compiles
    before the first per-sweep beat) trips the 900 s default, which is
    exactly how round 3's first bench attempt died."""
    last_cpu = time.process_time()
    while not _primary_done.is_set():
        time.sleep(10)
        cpu = time.process_time()
        if cpu - last_cpu > 0.5:     # >5% of a core since the last check
            beat()
        last_cpu = cpu
        if time.time() - _last_beat[0] > STALL_S:
            _fail(f"device stalled: no progress for {STALL_S:.0f}s "
                  f"(tunneled TPU wedge?)", 3)


def _probe_device(timeout=120.0, deadline=None):
    """Probe the device in a SUBPROCESS with a hard timeout, retrying until
    ``deadline`` seconds of wall clock. The tunneled TPU can wedge
    transiently (observed twice: fresh clients hang in the connection
    handshake for several minutes, then the tunnel recovers); a retried
    fresh-process probe rides the recovery, where a single in-process
    attempt would either hang the bench or fail a round whose device came
    back two minutes later. This process only touches jax after a probe
    succeeds, so its own client starts against a known-live tunnel."""
    import subprocess
    if deadline is None:
        deadline = float(os.environ.get("BENCH_PROBE_DEADLINE_S", "600"))
    code = ("import jax, jax.numpy as jnp;"
            "jnp.ones((8, 128)).sum().block_until_ready();"
            "print(jax.default_backend())")
    attempt = 0
    while True:
        attempt += 1
        this_timeout = min(timeout,
                           max(60.0, deadline - (time.time() - T0)))
        try:
            cp = subprocess.run([sys.executable, "-c", code],
                                timeout=this_timeout, capture_output=True,
                                text=True)
            if cp.returncode == 0:
                beat()
                return
        except subprocess.TimeoutExpired:
            pass
        waited = time.time() - T0
        if waited >= deadline:
            _fail(f"device probe failed {attempt}x over {waited:.0f}s "
                  f"(tunneled TPU wedge?)", 2)
        print(f"# device probe attempt {attempt} failed at {waited:.0f}s; "
              f"retrying", file=sys.stderr, flush=True)
        beat()  # an intentional wait must not trip the stall watchdog


def left():
    return BUDGET_S - (time.time() - T0)


def _layer_sizes(w: int):
    """Reference layer heuristic (``main.cpp:395-397``) with lane-friendly
    rounding (``models.grid.lane_friendly_unit``; hardware A/B
    ``tools/ab_lane_sizes.py``: 43 -> 42 is the one clear win at halfH)."""
    from localexpstereo_tpu.models.grid import lane_friendly_unit
    return [lane_friendly_unit(max(1, int(w * f)))
            for f in (0.01, 0.03, 0.09)]


def build_problem(scale: float, seed: int = 0):
    h = max(int(992 * scale), 64)
    w = max(int(1436 * scale), 96)
    nd = max(int(145 * scale), 16)
    rng = np.random.default_rng(seed)

    # Piecewise-slanted-plane scene: a disparity field from a few random
    # planes + a matching volume with a quadratic basin around the truth.
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    d_true = np.zeros((h, w), np.float32)
    for _ in range(6):
        cx, cy = rng.uniform(0, w), rng.uniform(0, h)
        a = rng.uniform(-0.05, 0.05)
        b = rng.uniform(-0.05, 0.05)
        c = rng.uniform(0.2, 0.8) * nd
        mask = ((xs - cx) ** 2 + (ys - cy) ** 2) < rng.uniform(0.1, 0.4) ** 2 * (h * w)
        d_true = np.where(mask, np.clip(a * xs + b * ys + c, 0, nd - 1),
                          d_true)
    dd = np.arange(nd, dtype=np.float32)[:, None, None]
    vol = np.minimum(np.abs(dd - d_true[None]) * 0.15, 1.0).astype(np.float32)
    vol += rng.random(vol.shape, np.float32) * 0.05

    img = (rng.random((h, w, 3)) * 255).astype(np.float32)
    return img, vol, h, w, nd


def bench_primary(scale, iters, pm_iters):
    import jax
    from localexpstereo_tpu.config import PARAMS_GF
    from localexpstereo_tpu.models.engine import (
        LocalExpansionSolver, LAYER0_PROPOSERS, COARSE_PROPOSERS)

    img, vol, h, w, nd = build_problem(scale)
    params = PARAMS_GF.replace(windR=20, lambda_=0.5, th_col=0.5)

    solver = LocalExpansionSolver(img, img, params, max_disp=float(nd - 1),
                                  vol0=vol, vol1=vol, seed=0,
                                  vol_dtype=os.environ.get(
                                      "BENCH_VOL_DTYPE", "uint8"),
                                  unary_backend=os.environ.get(
                                      "BENCH_UNARY_BACKEND", "auto"))
    sizes_env = os.environ.get("BENCH_LAYERS", "")
    if sizes_env:
        sizes = [int(x) for x in sizes_env.split(",")]
    else:
        sizes = _layer_sizes(w)
    for i, sz in enumerate(sizes):
        solver.add_layer(sz, LAYER0_PROPOSERS if i == 0
                         else COARSE_PROPOSERS)
    solver.set_evaluator(_BeatEvaluator())

    # Warmup: 1 pm + 1 gc sweep compiles the EXACT executables of the full
    # schedule (plans are padded to the outer_iter=0 variant and reused).
    solver.run(iterations=1, view_modes=(0,), pm_iterations=1,
               host_outputs=False)
    beat()

    # Timed run measures OPTIMIZATION time (init + all sweeps) to DEVICE
    # completion, matching the reference's time.txt semantics (Evaluator.h
    # timer excludes data prep / evaluation / output). The final labeling's
    # host download stays OUTSIDE the clock (round 5): the tunneled dev
    # link moves ~4-6 MB/s (tools/profile_replica.json: 5.2 s for the one
    # 28 MB padded labeling — 42% of a frame; 24 s for the replica2 batch),
    # an axon artifact no deployment has — real PCIe moves it in ~ms, and
    # the serving leg measures output delivery explicitly (sync +
    # pipelined).
    jax.block_until_ready(solver.data)
    t0 = time.perf_counter()
    final, _ = solver.run(iterations=iters, view_modes=(0,),
                          pm_iterations=pm_iters, host_outputs=False)
    jax.block_until_ready(final)
    return time.perf_counter() - t0


def bench_cones():
    """Real-data V2 run: full reference schedule (5 GC + 2 PM, doDual incl.
    postprocess, the demo.bat cones configuration), optimization-timed."""
    from localexpstereo_tpu.config import PARAMS_GF
    from localexpstereo_tpu.models.engine import (
        LocalExpansionSolver, LAYER0_PROPOSERS, COARSE_PROPOSERS)
    from localexpstereo_tpu.ops import plane as plane_ops
    from localexpstereo_tpu.utils import datasets
    import jax
    import jax.numpy as jnp

    pair = datasets.load_data(CONES_DIR, 0)
    params = PARAMS_GF.replace(windR=20, lambda_=1.0)

    solver = LocalExpansionSolver(pair.im0, pair.im1, params,
                                  pair.max_disparity, seed=0)
    for i, sz in enumerate([5, 15, 25]):
        solver.add_layer(sz, LAYER0_PROPOSERS if i == 0 else COARSE_PROPOSERS)
    solver.set_evaluator(_BeatEvaluator())
    solver.run(iterations=1, view_modes=(0, 1), pm_iterations=1,
               host_outputs=False)  # warmup
    beat()
    jax.block_until_ready(solver.data)
    t0 = time.perf_counter()
    labeling, _ = solver.run(iterations=5, view_modes=(0, 1),
                             pm_iterations=2, host_outputs=False)
    jax.block_until_ready(labeling)
    elapsed = time.perf_counter() - t0

    disp = np.asarray(plane_ops.disparity_map(jnp.asarray(labeling)))
    prec = pair.calib.gt_prec
    if prec > 0:
        disp = np.rint(disp / prec) * prec
    ok = np.abs(disp - pair.disp_gt) <= 0.5
    bad = 100.0 * (1.0 - (ok & pair.nonocc).sum() / pair.nonocc.sum())
    return elapsed, bad


def bench_replica(scale=1.0, iters=5, pm_iters=2, npairs=1):
    """The deployment-shape program: single-pair engine under shard_map over
    the 'data' mesh axis, one pair per device, measured on this host's
    devices. Per-pair time should match the single-pair engine (the
    per-device program is identical); on a v5e-8 the same executable spreads
    8 pairs over 8 chips.

    ``npairs > 1`` measures WAVE scaling on the one real chip (k = npairs
    pairs per device, processed as sequential waves inside the sharded
    program): the amortized per-pair time of a multi-wave batch is the
    measured de-risking evidence for the v5e-8 ÷8 throughput estimate —
    it includes every per-wave dispatch/rotation overhead the estimate
    assumes away."""
    import jax
    from localexpstereo_tpu.config import PARAMS_GF
    from localexpstereo_tpu.parallel import mesh as mesh_mod
    from localexpstereo_tpu.parallel.replica import ReplicaSolver

    ndev = 1  # one real chip in this environment
    probs = [build_problem(scale, seed=i) for i in range(npairs)]
    ims = np.stack([p[0] for p in probs])
    vols = np.stack([p[1] for p in probs])
    w, nd = probs[0][3], probs[0][4]
    params = PARAMS_GF.replace(windR=20, lambda_=0.5, th_col=0.5)
    mesh = mesh_mod.make_mesh((ndev,), ("data",), jax.devices()[:ndev])
    sizes = _layer_sizes(w)

    solver = ReplicaSolver(ims, ims, params, max_disp=float(nd - 1),
                           mesh=mesh, unit_sizes=sizes, vols0=vols,
                           vols1=vols, seed=0,
                           vol_dtype=os.environ.get("BENCH_VOL_DTYPE",
                                                    "uint8"))
    solver.run(iterations=1, view_modes=(0,), pm_iterations=1,
               on_sweep=beat, host_outputs=False)  # warmup
    beat()
    jax.block_until_ready(solver.data)
    # Timed run WITHOUT the per-sweep heartbeat sync: the deployment
    # program pipelines sweep dispatch against device execution exactly
    # like the single-pair engine (a per-sweep block_until_ready serializes
    # ~0.2 s of host dispatch per sweep on this 1-core host). The watchdog
    # is safe: the timed run is ~20x shorter than STALL_S. Clock stops at
    # DEVICE completion like every other leg: round 5's rehearsal measured
    # the k=2 batch labeling D2H at 24 s over the tunnel (57% of the leg!)
    # while the per-pair sweep walls were at parity with the single-pair
    # engine (tools/profile_replica.json) — the wave machinery itself is
    # overhead-free, and the ÷8 v5e-8 estimate is about compute, not about
    # this link.
    t0 = time.perf_counter()
    final, _ = solver.run(iterations=iters, view_modes=(0,),
                          pm_iterations=pm_iters, host_outputs=False)
    jax.block_until_ready(final)
    return (time.perf_counter() - t0) / npairs


def bench_mccnn(scale=1.0, reps=3):
    """Config 5's front half: the on-device MC-CNN cost volume at the
    primary leg's halfH geometry (1436x992, ndisp 145 at scale 1), bundled
    trained weights. The reference depends on an OFFLINE Torch/CUDA MC-CNN
    for the same volumes (``README.md:74-91``); this closes
    images -> volume -> solve end-to-end on one device."""
    import jax
    import jax.numpy as jnp
    from localexpstereo_tpu.models import mccnn

    img, _, h, w, nd = build_problem(scale)
    params = mccnn.load_default_params()
    im0 = jnp.asarray(img)
    out = mccnn.cost_volume(params, im0, im0, ndisp=nd)
    jax.block_until_ready(out)          # compile + warm
    beat()
    t0 = time.perf_counter()
    for _ in range(reps):
        out = mccnn.cost_volume(params, im0, im0, ndisp=nd)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def bench_batch15(iters=5, pm_iters=2, npairs=15):
    """BASELINE config 3: the 15-pair batch through the REAL batch driver
    (``cli/batch.py``), on a same-shape set built from the bundled cones
    pair (15 symlinked dataset dirs -> one shape group -> one ReplicaSolver
    batch, npairs waves on this 1-chip host). Returns the driver's own
    ``batch_summary.json`` amortized s/frame (timed run is optimization
    only; precompile runs before the clock, matching time.txt semantics)."""
    import shutil
    import tempfile
    from localexpstereo_tpu.cli import batch as batch_cli

    root = tempfile.mkdtemp(prefix="bench_batch15_")
    try:
        dirs = []
        for i in range(npairs):
            d = os.path.join(root, f"cones{i:02d}")
            os.makedirs(d)
            for f in os.listdir(CONES_DIR):
                os.symlink(os.path.join(CONES_DIR, f), os.path.join(d, f))
            dirs.append(d)
        ns = batch_cli.parse_args(
            ["-mode", "MiddV2", "-targetDirs", *dirs,
             "-outputDir", os.path.join(root, "out"),
             "-iterations", str(iters), "-pmIterations", str(pm_iters)])
        summary = batch_cli.run_batch(ns)
        g = summary["groups"][0]
        return g["amortized_s_per_frame"], g["batch"]
    finally:
        shutil.rmtree(root, ignore_errors=True)


def bench_videorate(scale=1.0, frames=4):
    """Steady-state serving mode: persistent compiled engine, cell-seeded
    warm start from the previous frame, 1 GC sweep per frame. Frame 0 (cold
    full schedule + compilation) is excluded; reports the mean of the warm
    frames PLUS the per-stage breakdown (build / solve / output) of the last
    warm frame, so the residual non-solve overhead is on the driver record
    (VERDICT round-4 item 7). Shares the primary leg's shapes, so its sweeps
    hit the in-process jit cache."""
    import jax.numpy as jnp
    from localexpstereo_tpu.config import PARAMS_GF
    from localexpstereo_tpu.serving import StereoStream

    img, vol, h, w, nd = build_problem(scale)
    # Volumes arrive on DEVICE in the serving deployment (e.g. produced by
    # the on-device MC-CNN); uploading ~400 MB per frame through the host
    # link is not part of the steady state being measured.
    vol_dev = jnp.asarray(vol)
    params = PARAMS_GF.replace(windR=20, lambda_=0.5, th_col=0.5)
    sizes = _layer_sizes(w)
    stream = StereoStream(params, max_disp=float(nd - 1), unit_sizes=sizes,
                          cold_iterations=5, cold_pm_iterations=2,
                          warm_iterations=1, profile=True)
    stream.process(img, img, vol_dev, vol_dev)   # cold + compile
    beat()
    stream.process(img, img, vol_dev, vol_dev)   # first warm (compiles warm path)
    beat()
    times = []
    for _ in range(frames - 1):
        stream.process(img, img, vol_dev, vol_dev)
        beat()
        times.append(stream.last_frame_seconds)
    # Pipelined steady state on the SAME warm stream (no second cold
    # schedule): profile syncs off, D2H of frame i overlapping frame i+1's
    # build + solve — the deployment configuration
    # (tools/videorate_profile.py measured 3.39 -> 2.09 s/frame).
    breakdown = dict(stream.last_timings)
    stream.profile = False
    stream.pipelined = True
    stream.process(img, img, vol_dev, vol_dev)   # primes the pipeline
    beat()
    ptimes = []
    for _ in range(frames - 1):
        stream.process(img, img, vol_dev, vol_dev)
        beat()
        ptimes.append(stream.last_frame_seconds)
    stream.flush()
    return (sum(times) / len(times), breakdown,
            sum(ptimes) / len(ptimes))


def _mccnn_leg(scale):
    """MC-CNN leg with a degraded-mode fallback: round 4's attempt died on
    a tunnel-side remote-compile HTTP 500 at the full halfH geometry. If the
    full-scale compile fails, retry at half the geometry (annotated) — a
    smaller executable that the compile helper handles — so SOME measured
    images->volume number lands on the record instead of an error string."""
    try:
        return {"mccnn_volume_s": round(bench_mccnn(scale), 3)}
    except Exception as e:  # noqa: BLE001 — any compile/dispatch failure
        note = str(e)[:160]
        beat()
        half = bench_mccnn(scale * 0.5)
        return {"mccnn_volume_s_halfgeom": round(half, 3),
                "mccnn_note": f"full geometry failed ({note}); "
                              f"measured at 0.5x geometry instead"}


def main():
    scale = float(os.environ.get("BENCH_SCALE", "1.0"))
    iters = int(os.environ.get("BENCH_ITERS", "5"))
    pm_iters = int(os.environ.get("BENCH_PM_ITERS", "2"))
    fast = os.environ.get("BENCH_FAST", "0") == "1"

    threading.Thread(target=_watchdog, daemon=True).start()
    _probe_device()

    elapsed = bench_primary(scale, iters, pm_iters)
    out = {
        "metric": "midv3_halfH_sec_per_frame",
        "value": round(elapsed, 3),
        "unit": "s",
        "vs_baseline": round(elapsed / BASELINE_SECONDS, 5),
        "v5e8_throughput_s_per_frame_est": round(elapsed / 8.0, 3),
    }
    # The primary metric is on stdout NOW — a later stall/timeout can no
    # longer lose the round's number.
    _emit(out)
    _primary_done.set()

    if not fast:
        # Leg ORDER is the budget policy (VERDICT round-4 item 3): the legs
        # that de-risk the headline v5e-8 claim (replica2 wave scaling,
        # batch15 config-3 throughput) run FIRST; demo/aux legs (videorate,
        # cones, mccnn) spend whatever budget remains.
        legs = [
            ("replica2", lambda: {"replica2_s_per_frame":
                                  round(bench_replica(scale, iters, pm_iters,
                                                      npairs=2), 3)}, 300),
            ("batch15", lambda: (lambda sb: {
                "batch15_s_per_frame": sb[0],
                "batch15_pairs": sb[1]})(bench_batch15(iters, pm_iters)),
             240),
            ("videorate", lambda: (lambda vb: {
                "videorate_s_per_frame": round(vb[0], 3),
                "videorate_breakdown": vb[1],
                "videorate_pipelined_s_per_frame": round(vb[2], 3)})(
                    bench_videorate(scale)), 150),
            # mccnn runs BEFORE cones: cones numbers are on the driver
            # record twice (r03/r04) while mccnn_volume_s has never landed
            # (r04 died on the vmap-OOM HTTP 500; r05 rehearsal ran out of
            # budget 9 s short) — if the budget squeezes one out, drop the
            # replicated evidence, not the missing one.
            ("mccnn", lambda: _mccnn_leg(scale), 90),
            ("cones", lambda: (lambda sb: {
                "cones_doDual_s": round(sb[0], 3),
                "cones_bad05_nonocc": round(sb[1], 3)})(bench_cones()), 180),
            ("replica", lambda: {"replica1_s_per_frame":
                                 round(bench_replica(scale, iters,
                                                     pm_iters), 3)}, 300),
        ]
        for name, fn, min_budget in legs:
            if left() < min_budget:
                out[f"{name}_skipped"] = f"budget ({left():.0f}s left)"
                continue
            try:
                out.update(fn())
            except Exception as e:  # extras must never sink the primary
                out[f"{name}_error"] = str(e)[:200]
            # v5e-8 estimate: prefer the measured 2-wave amortized per-pair
            # time (includes every per-wave overhead the ÷8 assumes away),
            # else the 1-pair sharded program, else the primary leg.
            if "replica2_s_per_frame" in out:
                out["v5e8_throughput_s_per_frame_est"] = \
                    round(out["replica2_s_per_frame"] / 8.0, 3)
            elif "replica1_s_per_frame" in out:
                out["v5e8_throughput_s_per_frame_est"] = \
                    round(out["replica1_s_per_frame"] / 8.0, 3)
            # Re-emit the running record after EVERY leg: the driver keeps
            # the last JSON line, so an external timeout mid-bench loses at
            # most the leg in flight, not the ones already measured.
            out["elapsed_s"] = round(time.time() - T0, 1)
            _emit(out)
    out["elapsed_s"] = round(time.time() - T0, 1)
    _emit(out)


if __name__ == "__main__":
    main()
