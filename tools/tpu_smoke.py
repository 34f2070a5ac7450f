"""Hardware smoke suite for the real (tunneled) TPU.

CI runs on a forced CPU mesh, where Pallas kernels execute in interpret
mode — a Mosaic miscompile on real hardware is invisible to it (round 1's
DMA unary kernel miscompiled exactly this way and only surfaced as wrong
BENCH numbers). This tool validates every hardware kernel on the actual
device and a tiny end-to-end solve, printing one JSON line per check plus
a summary line, and survives a wedged tunnel with a parseable failure
record (same failure mode bench.py hardens against).

Checks:
  probe        tiny dispatch in a subprocess with timeout + retry
  dma_f32/bf16 ``ops/unary_pallas.sample_windows_dma`` vs interpret mode
  dma_fused_gf the in-kernel guided-filter variant vs interpret mode
  mincut_fused ``ops/mincut_pallas.expansion_accept_pallas`` vs the split
               XLA pipeline (energy-equality; both are exact min-cuts)
  engine_tiny  64x96/nd16 solve: energy monotone under GC sweeps and the
               uint8-volume energy within tolerance of float32's

Usage: python tools/tpu_smoke.py           (exit 0 iff all checks pass)
Env:   SMOKE_SKIP_ENGINE=1 skips the (compile-heavy) engine_tiny check.
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))

T0 = time.time()
RESULTS = []


def emit(name, ok, **extra):
    rec = {"check": name, "ok": bool(ok),
           "elapsed_s": round(time.time() - T0, 1), **extra}
    RESULTS.append(rec)
    print(json.dumps(rec), flush=True)


def probe(deadline=240.0):
    code = ("import jax, jax.numpy as jnp;"
            "jnp.ones((8, 128)).sum().block_until_ready();"
            "print(jax.default_backend())")
    attempt = 0
    while True:
        attempt += 1
        try:
            cp = subprocess.run([sys.executable, "-c", code], timeout=90,
                                capture_output=True, text=True)
            if cp.returncode == 0 and "tpu" in cp.stdout:
                emit("probe", True, attempts=attempt)
                return True
        except subprocess.TimeoutExpired:
            pass
        if time.time() - T0 > deadline:
            emit("probe", False, attempts=attempt,
                 error="device never answered (tunneled TPU wedge?)")
            return False


def check_dma():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import check_dma_kernel as cdk
    import jax.numpy as jnp
    for name, fn in (("dma_f32", lambda: cdk.check(jnp.float32)),
                     ("dma_bf16", lambda: cdk.check(jnp.bfloat16)),
                     ("dma_uint8", cdk.check_uint8),
                     ("dma_fused_gf", cdk.check_fused_gf)):
        try:
            fn()
            emit(name, True)
        except Exception as e:
            emit(name, False, error=str(e)[:300])


def check_mincut_fused():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from localexpstereo_tpu.ops import mincut, mincut_pallas, pairwise

    rng = np.random.default_rng(0)
    n, s, lam, tau = 6, 6, 0.7, 1.0
    halo = rng.normal(size=(n, s + 2, s + 2, 4)).astype(np.float32)
    halo[..., 0:2] *= 0.1
    halo[..., 2] = rng.uniform(0, 8, (n, s + 2, s + 2))
    halo[..., 3] = 0.0
    props = np.stack([rng.uniform(-0.1, 0.1, n), rng.uniform(-0.1, 0.1, n),
                      rng.uniform(0, 8, n), np.zeros(n)], -1).astype(np.float32)
    coeff8 = rng.uniform(0.01, 1.0, (n, 8, s, s)).astype(np.float32)
    ccost = rng.uniform(0, 2, (n, s, s)).astype(np.float32)
    pcost = rng.uniform(0, 2, (n, s, s)).astype(np.float32)
    tox = rng.integers(-3, 10, n).astype(np.float32)
    toy = rng.integers(-3, 10, n).astype(np.float32)
    args = tuple(jnp.asarray(a) for a in
                 (halo, props, tox, toy, coeff8, ccost, pcost))

    coeff_fwd = args[4][:, list(pairwise.FORWARD)]
    c00, c01, c10 = jax.vmap(
        lambda hl, pr, cf, x0, y0: pairwise.expansion_tables(
            hl, pr, cf, x0, y0, lam, tau))(args[0], args[1], coeff_fwd,
                                           args[2], args[3])
    t0b, t1b = jax.vmap(
        lambda hl, pr, cf, x0, y0: pairwise.boundary_tlinks(
            hl, pr, cf, x0, y0, lam, tau))(args[0], args[1], args[4],
                                           args[2], args[3])
    t0, t1 = args[5] + t0b, args[6] + t1b
    want = mincut.mincut_accept(t0, t1, c00, c01, c10)
    e_want = np.asarray(mincut.move_energy_delta(want, t0, t1, c00, c01, c10))
    got = mincut_pallas.expansion_accept_pallas(*args, lam=lam, tau=tau)
    e_got = np.asarray(mincut.move_energy_delta(got, t0, t1, c00, c01, c10))
    diff = float(np.abs(e_got - np.minimum(e_want, 0.0)).max())
    ok = np.allclose(e_got, np.minimum(e_want, 0.0), rtol=1e-5, atol=1e-3) \
        and bool(np.all(e_got <= 1e-5))
    emit("mincut_fused", ok, max_energy_diff=diff)


def check_engine_tiny():
    import numpy as np
    from localexpstereo_tpu.config import PARAMS_GF
    from localexpstereo_tpu.models.engine import (
        LocalExpansionSolver, LAYER0_PROPOSERS, COARSE_PROPOSERS,
        energy_audit)

    rng = np.random.default_rng(0)
    h, w, nd = 64, 96, 16
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    d_true = np.clip(0.02 * xs + 0.01 * ys + 4.0, 0, nd - 1)
    dd = np.arange(nd, dtype=np.float32)[:, None, None]
    vol = np.minimum(np.abs(dd - d_true[None]) * 0.2, 1.0).astype(np.float32)
    vol += rng.random(vol.shape, np.float32) * 0.05
    img = (rng.random((h, w, 3)) * 255).astype(np.float32)
    params = PARAMS_GF.replace(windR=8, lambda_=0.5, th_col=0.5)

    energies = {}
    for dtype in ("float32", "uint8"):
        solver = LocalExpansionSolver(img, img, params, max_disp=float(nd - 1),
                                      vol0=vol, vol1=vol, seed=0,
                                      vol_dtype=dtype)
        solver.add_layer(3, LAYER0_PROPOSERS)
        solver.add_layer(9, COARSE_PROPOSERS)
        audit = []

        class Ev:
            def start(self):
                pass

            def stop(self):
                pass

            def evaluate(self, sv, labeling_m, cost_m, mode, index):
                # TOTAL energy: the GC guard only guarantees data+smooth
                # monotonicity (a move may raise the unary sum while the
                # pairwise term falls more).
                audit.append(float(energy_audit(sv.data, sv.cfg,
                                                labeling_m, cost_m,
                                                mode)[0]))

            def save_consistency(self, *a, **k):
                pass

        solver.set_evaluator(Ev())
        solver.run(iterations=2, view_modes=(0,), pm_iterations=1)
        energies[dtype] = audit
    mono = all(b <= a * (1 + 1e-5) for a, b in
               zip(energies["float32"][1:-1], energies["float32"][2:]))
    rel = abs(energies["uint8"][-1] - energies["float32"][-1]) / max(
        abs(energies["float32"][-1]), 1.0)
    emit("engine_tiny", mono and rel < 0.05,
         data_cost_monotone=mono, uint8_vs_f32_rel=round(rel, 4))


def main():
    if not probe():
        print(json.dumps({"smoke": "fail", "passed": 0,
                          "failed": ["probe"]}), flush=True)
        sys.exit(2)
    import jax
    assert jax.default_backend() == "tpu", "needs the real TPU"
    check_dma()
    try:
        check_mincut_fused()
    except Exception as e:
        emit("mincut_fused", False, error=str(e)[:300])
    if os.environ.get("SMOKE_SKIP_ENGINE", "0") != "1":
        try:
            check_engine_tiny()
        except Exception as e:
            emit("engine_tiny", False, error=str(e)[:300])
    failed = [r["check"] for r in RESULTS if not r["ok"]]
    print(json.dumps({"smoke": "ok" if not failed else "fail",
                      "passed": len(RESULTS) - len(failed),
                      "failed": failed,
                      "elapsed_s": round(time.time() - T0, 1)}), flush=True)
    sys.exit(0 if not failed else 1)


if __name__ == "__main__":
    main()
