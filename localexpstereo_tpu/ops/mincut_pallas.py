"""Pallas TPU kernels: VMEM-resident push-relabel min-cut.

Two kernels share one solver core (global-relabel BFS rounds + push/relabel
sweeps + residual-BFS cut extraction), all state VMEM-resident so HBM sees
each plane exactly once per solve:

- :func:`mincut_accept_pallas`: drop-in replacement for
  :func:`mincut.mincut_accept` — takes prebuilt (t0, t1, c00, c01, c10).
- :func:`expansion_accept_pallas`: the FUSED expansion move. Pairwise-table
  construction (``StereoEnergy.h:398-453``), boundary t-link absorption
  (``FastGCStereo.h:440-477``), submodular graph build
  (``FastGCStereo.h:479-551``), the min-cut solve, AND the exact
  energy-delta guard all run inside one kernel invocation: inputs are just
  the halo disparity/slope maps, per-region proposal planes, pairwise
  coefficients, and the two unary cost planes. This removes ~26 HBM plane
  round-trips per proposal that the split XLA pipeline paid.

The backward residual capacity is reconstructed as ``fw0 - cap_fw`` (initial
reverse caps are 0), which removes 4 carried planes.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import mincut as mincut_xla
from . import pairwise

_INF = 3e38  # python literal: Pallas kernels cannot capture array constants


def _shift2d(x: jnp.ndarray, dx: int, dy: int, fill) -> jnp.ndarray:
    """Value at p + (dx, dy) on a [B, S, S] tile batch, `fill` outside."""
    b, s0, s1 = x.shape
    out = x
    if dy:
        pad = jnp.full((b, abs(dy), s1), fill, x.dtype)
        if dy > 0:
            out = jnp.concatenate([out[:, dy:], pad], axis=1)
        else:
            out = jnp.concatenate([pad, out[:, :dy]], axis=1)
    if dx:
        pad = jnp.full((b, s0, abs(dx)), fill, x.dtype)
        if dx > 0:
            out = jnp.concatenate([out[:, :, dx:], pad], axis=2)
        else:
            out = jnp.concatenate([pad, out[:, :, :dx]], axis=2)
    return out


def _solver_core(s: int, max_global_rounds: int, sweeps_per_round: int):
    """Returns (solve, bfs): the push-relabel fixpoint machinery on
    [B, S, S] blocks, shared by both kernels."""
    hmax = float(s * s + 2)
    eps = 1e-7
    dirs = mincut_xla.EDGE_DIRS

    def out_caps(capfw, capbw):
        outs = []
        for k, (dx, dy) in enumerate(dirs):
            outs.append((capfw[k], dx, dy))
        for k, (dx, dy) in enumerate(dirs):
            outs.append((_shift2d(capbw[k], -dx, -dy, 0.0), -dx, -dy))
        return outs

    def bfs(capt, capfw, capbw):
        d0 = jnp.where(capt > eps, 1.0, _INF).astype(jnp.float32)

        def relax(d):
            best = d
            for cap_out, dx, dy in out_caps(capfw, capbw):
                nb = _shift2d(d, dx, dy, _INF)
                best = jnp.minimum(best,
                                   jnp.where(cap_out > eps, nb + 1.0, _INF))
            return best

        def cond(c):
            return c[1]

        def body(c):
            d, _ = c
            # Two relaxations per convergence check halves the cross-lane
            # `any` reductions on the fixpoint path.
            best = relax(relax(d))
            return best, jnp.any(best < d)

        d, _ = jax.lax.while_loop(cond, body, (d0, jnp.bool_(True)))
        return jnp.where(d >= _INF, hmax, d)

    def sweep(fw0, e, h, capt, capfw):
        capbw = tuple(f0 - f for f0, f in zip(fw0, capfw))
        active = (e > eps) & (h < hmax)

        taken = jnp.zeros_like(active)
        adm = active & (capt > eps) & (h == 1.0)
        f_sink = jnp.where(adm, jnp.minimum(e, capt), 0.0)
        taken |= adm
        flows = []
        for cap_out, dx, dy in out_caps(capfw, capbw):
            nb_h = _shift2d(h, dx, dy, hmax)
            adm = active & (~taken) & (cap_out > eps) & (h == nb_h + 1.0)
            flows.append(jnp.where(adm, jnp.minimum(e, cap_out), 0.0))
            taken |= adm

        capt = capt - f_sink
        outflow = f_sink
        inflow = jnp.zeros_like(e)
        new_fw = list(capfw)
        for k, (dx, dy) in enumerate(dirs):
            f = flows[k]
            new_fw[k] = new_fw[k] - f
            outflow = outflow + f
            inflow = inflow + _shift2d(f, -dx, -dy, 0.0)
        for k, (dx, dy) in enumerate(dirs):
            f = flows[4 + k]
            fr = _shift2d(f, dx, dy, 0.0)
            new_fw[k] = new_fw[k] + fr
            outflow = outflow + f
            inflow = inflow + fr
        e = e - outflow + inflow
        capfw = tuple(new_fw)
        capbw = tuple(f0 - f for f0, f in zip(fw0, capfw))

        active = (e > eps) & (h < hmax)
        best = jnp.where(capt > eps, 0.0, _INF).astype(jnp.float32)
        for cap_out, dx, dy in out_caps(capfw, capbw):
            nb_h = _shift2d(h, dx, dy, hmax)
            best = jnp.minimum(best, jnp.where(cap_out > eps, nb_h, _INF))
        could_push = best <= h - 1.0
        new_h = jnp.where(best >= _INF, hmax, jnp.minimum(best + 1.0, hmax))
        h = jnp.where(active & (~could_push), jnp.maximum(h, new_h), h)
        return e, h, capt, capfw

    def solve(e0, capt0, fw0):
        """Runs the preflow to termination; returns the accept mask (source
        side: cannot reach the sink in the final residual graph), bool."""

        def round_body(carry):
            e, h, capt, capfw, _, rounds = carry
            capbw = tuple(f0 - f for f0, f in zip(fw0, capfw))
            h = bfs(capt, capfw, capbw)
            live = jnp.any((e > eps) & (h < hmax))

            def inner_cond(c):
                e, h, capt, capfw, k = c
                return (k < sweeps_per_round) & jnp.any((e > eps)
                                                        & (h < hmax))

            def inner_body(c):
                e, h, capt, capfw, k = c
                e, h, capt, capfw = sweep(fw0, e, h, capt, capfw)
                return e, h, capt, capfw, k + 1

            e, h, capt, capfw, _ = jax.lax.while_loop(
                inner_cond, inner_body, (e, h, capt, capfw, jnp.int32(0)))
            return e, h, capt, capfw, live, rounds + 1

        def round_cond(carry):
            _, _, _, _, live, rounds = carry
            return live & (rounds < max_global_rounds)

        h0 = jnp.zeros_like(e0)
        e, h, capt, capfw, _, _ = jax.lax.while_loop(
            round_cond, round_body,
            (e0, h0, capt0, tuple(fw0), jnp.bool_(True), jnp.int32(0)))

        capbw = tuple(f0 - f for f0, f in zip(fw0, capfw))
        dist = bfs(capt, capfw, capbw)
        return dist >= hmax

    return solve


def _edge_masks_iota(s: int):
    """[4][1, S, S] f32: edge (p, p + dir) lies inside the window. Built from
    iota so Pallas kernels don't capture array constants."""
    iy = jax.lax.broadcasted_iota(jnp.int32, (1, s, s), 1)
    ix = jax.lax.broadcasted_iota(jnp.int32, (1, s, s), 2)
    masks = []
    for dx, dy in mincut_xla.EDGE_DIRS:
        m = ((ix + dx >= 0) & (ix + dx < s) & (iy + dy >= 0)
             & (iy + dy < s))
        masks.append(m.astype(jnp.float32))
    return masks


def _make_kernel(s: int, max_global_rounds: int, sweeps_per_round: int):
    solve = _solver_core(s, max_global_rounds, sweeps_per_round)

    def kernel(e0_ref, capt0_ref, fw0_ref, accept_ref):
        e0 = e0_ref[...]
        capt0 = capt0_ref[...]
        fw0 = tuple(fw0_ref[:, k] for k in range(4))
        accept = solve(e0, capt0, fw0)
        accept_ref[...] = accept.astype(jnp.int8)

    return kernel


def _make_expansion_kernel(s: int, lam: float, tau: float,
                           max_global_rounds: int, sweeps_per_round: int):
    """Fused kernel: tables + boundary t-links + graph + solve + guard.

    Block inputs (leading dim b = regions packed per program):
      d0h, ah, bh: [b, S+2, S+2] current-label disparity / slope maps on the
        haloed window (d0h[q] = disparity of label at q, evaluated at q).
      props: [b, 4] proposal planes; orig: [b, 2] window origins (x, y).
      coeff8: [b, 8, S, S]; ccost, pcost: [b, S, S].
    Output: accept int8 [b, S, S], already zeroed for regions whose exact
    energy delta would be positive (the monotonicity guard,
    cf. ``FastGCStereo.h:561-594``).
    """
    solve = _solver_core(s, max_global_rounds, sweeps_per_round)
    dirs = mincut_xla.EDGE_DIRS       # forward table order (GE, EG, LG, GG)
    fwd_idx = pairwise.FORWARD

    def kernel(d0h_ref, d1h_ref, ah_ref, bh_ref, coeff_ref,
               ccost_ref, pcost_ref, accept_ref, rl_ref):
        emasks = _edge_masks_iota(s)

        def at_off(ref, dx, dy):
            # Shifted window reads carry a lane-offset layout that Mosaic
            # propagates through arithmetic and cannot reconcile in the
            # concatenates `_shift2d` emits; a VMEM scratch round-trip
            # normalizes to the standard layout (VMEM-local, ~free).
            rl_ref[...] = ref[:, 1 + dy:1 + dy + s, 1 + dx:1 + dx + s]
            return rl_ref[...]

        d0 = at_off(d0h_ref, 0, 0)
        d1 = at_off(d1h_ref, 0, 0)
        a0 = at_off(ah_ref, 0, 0)
        b0 = at_off(bh_ref, 0, 0)

        # ---- pairwise tables for the 4 forward neighbors ------------------
        c00s, c01s, c10s = [], [], []
        for i, k in enumerate(fwd_idx):
            dx, dy = pairwise.NEIGHBORS[k]
            d0q = at_off(d0h_ref, dx, dy)
            aq = at_off(ah_ref, dx, dy)
            bq = at_off(bh_ref, dx, dy)
            d_le_ee = d0q - (aq * dx + bq * dy)   # lab(q)'s disparity at p
            d_ee_le = d0 + a0 * dx + b0 * dy      # lab(p)'s disparity at q
            d1q = at_off(d1h_ref, dx, dy)
            w = coeff_ref[:, k] * lam
            c00s.append(jnp.minimum(jnp.abs(d0 - d_le_ee)
                                    + jnp.abs(d_ee_le - d0q), tau) * w)
            c01s.append(jnp.minimum(jnp.abs(d0 - d1)
                                    + jnp.abs(d_ee_le - d1q), tau) * w)
            c10s.append(jnp.minimum(jnp.abs(d1 - d_le_ee)
                                    + jnp.abs(d1q - d0q), tau) * w)

        # ---- boundary t-links over all 8 neighbors -------------------------
        t0b = jnp.zeros_like(d0)
        t1b = jnp.zeros_like(d0)
        for k, (dx, dy) in enumerate(pairwise.NEIGHBORS):
            iy_i = jax.lax.broadcasted_iota(jnp.int32, (1, s, s), 1)
            ix_i = jax.lax.broadcasted_iota(jnp.int32, (1, s, s), 2)
            outside = ((ix_i + dx < 0) | (ix_i + dx >= s) | (iy_i + dy < 0)
                       | (iy_i + dy >= s))
            d0q = at_off(d0h_ref, dx, dy)
            aq = at_off(ah_ref, dx, dy)
            bq = at_off(bh_ref, dx, dy)
            dq_p = d0q - (aq * dx + bq * dy)
            d0_q = d0 + a0 * dx + b0 * dy
            d1_q = at_off(d1h_ref, dx, dy)
            w = jnp.where(outside, coeff_ref[:, k], 0.0) * lam
            t0b += jnp.minimum(jnp.abs(d0 - dq_p) + jnp.abs(d0_q - d0q),
                               tau) * w
            t1b += jnp.minimum(jnp.abs(d1 - dq_p) + jnp.abs(d1_q - d0q),
                               tau) * w

        t0 = ccost_ref[...] + t0b
        t1 = pcost_ref[...] + t1b

        # ---- submodular graph build (FastGCStereo.h:479-551) --------------
        sigma = t0
        fw0 = []
        for i, k in enumerate(fwd_idx):
            dx, dy = pairwise.NEIGHBORS[k]
            em = emasks[i]
            c = c01s[i] * em
            d_minus_c = (c00s[i] - c01s[i]) * em
            sigma = sigma + c + _shift2d(d_minus_c, -dx, -dy, 0.0)
            cap = jnp.maximum(0.0, c10s[i] + c01s[i] - c00s[i])
            fw0.append(cap * em)
        nu = sigma - t1
        e0 = jnp.maximum(nu, 0.0)
        capt0 = jnp.maximum(-nu, 0.0)

        accept = solve(e0, capt0, tuple(fw0))

        # ---- exact per-region energy-delta guard ---------------------------
        xm = accept.astype(jnp.float32)
        contrib = (t1 - t0) * xm
        for i, k in enumerate(fwd_idx):
            dx, dy = pairwise.NEIGHBORS[k]
            em = emasks[i]
            xq = _shift2d(xm, dx, dy, 0.0)
            pair = (c00s[i] * (1 - xm) * (1 - xq) + c01s[i] * (1 - xm) * xq
                    + c10s[i] * xm * (1 - xq))
            contrib = contrib + (pair - c00s[i]) * em
        # Sequential single-axis keepdims sums: Mosaic crashes on the
        # multi-axis form (layout_rank check) and on rank-1 vectors.
        delta = jnp.sum(jnp.sum(contrib, axis=2, keepdims=True), axis=1,
                        keepdims=True)
        ok = delta <= 0.0
        accept_ref[...] = (accept & ok).astype(jnp.int8)

    return kernel


# --------------------------------------------------------------------------
# Region-on-lanes ("rl") layout: planes are [y, x, B] with the REGION axis on
# the 128 TPU lanes. For small windows (S <= ~64) the [b, S, S] layout wastes
# most of the vector unit (S = 42 pads to 128 lanes = 29% utilization); with
# regions on lanes every vreg is full and the x/y shifts become cheap
# major-axis slices. Used by the fused expansion kernel at the fine layer,
# which dominates the GC sweep cost.
# --------------------------------------------------------------------------


def _shift2d_rl(x: jnp.ndarray, dx: int, dy: int, fill) -> jnp.ndarray:
    """Value at p + (dx, dy) on a [S, S, B] tile batch (y, x, region)."""
    s0, s1, b = x.shape
    out = x
    if dy:
        pad = jnp.full((abs(dy), s1, b), fill, x.dtype)
        if dy > 0:
            out = jnp.concatenate([out[dy:], pad], axis=0)
        else:
            out = jnp.concatenate([pad, out[:dy]], axis=0)
    if dx:
        pad = jnp.full((out.shape[0], abs(dx), b), fill, x.dtype)
        if dx > 0:
            out = jnp.concatenate([out[:, dx:], pad], axis=1)
        else:
            out = jnp.concatenate([pad, out[:, :dx]], axis=1)
    return out


def _solver_core_rl(s: int, max_global_rounds: int, sweeps_per_round: int):
    """:func:`_solver_core` for the region-on-lanes layout (same algorithm;
    shifts act on the leading spatial axes)."""
    hmax = float(s * s + 2)
    eps = 1e-7
    dirs = mincut_xla.EDGE_DIRS

    def out_caps(capfw, capbw):
        outs = []
        for k, (dx, dy) in enumerate(dirs):
            outs.append((capfw[k], dx, dy))
        for k, (dx, dy) in enumerate(dirs):
            outs.append((_shift2d_rl(capbw[k], -dx, -dy, 0.0), -dx, -dy))
        return outs

    def bfs(capt, capfw, capbw):
        d0 = jnp.where(capt > eps, 1.0, _INF).astype(jnp.float32)

        def relax(d):
            best = d
            for cap_out, dx, dy in out_caps(capfw, capbw):
                nb = _shift2d_rl(d, dx, dy, _INF)
                best = jnp.minimum(best,
                                   jnp.where(cap_out > eps, nb + 1.0, _INF))
            return best

        def cond(c):
            return c[1]

        def body(c):
            d, _ = c
            best = relax(relax(d))
            return best, jnp.any(best < d)

        d, _ = jax.lax.while_loop(cond, body, (d0, jnp.bool_(True)))
        return jnp.where(d >= _INF, hmax, d)

    def sweep(fw0, e, h, capt, capfw):
        capbw = tuple(f0 - f for f0, f in zip(fw0, capfw))
        active = (e > eps) & (h < hmax)

        taken = jnp.zeros_like(active)
        adm = active & (capt > eps) & (h == 1.0)
        f_sink = jnp.where(adm, jnp.minimum(e, capt), 0.0)
        taken |= adm
        flows = []
        for cap_out, dx, dy in out_caps(capfw, capbw):
            nb_h = _shift2d_rl(h, dx, dy, hmax)
            adm = active & (~taken) & (cap_out > eps) & (h == nb_h + 1.0)
            flows.append(jnp.where(adm, jnp.minimum(e, cap_out), 0.0))
            taken |= adm

        capt = capt - f_sink
        outflow = f_sink
        inflow = jnp.zeros_like(e)
        new_fw = list(capfw)
        for k, (dx, dy) in enumerate(dirs):
            f = flows[k]
            new_fw[k] = new_fw[k] - f
            outflow = outflow + f
            inflow = inflow + _shift2d_rl(f, -dx, -dy, 0.0)
        for k, (dx, dy) in enumerate(dirs):
            f = flows[4 + k]
            fr = _shift2d_rl(f, dx, dy, 0.0)
            new_fw[k] = new_fw[k] + fr
            outflow = outflow + f
            inflow = inflow + fr
        e = e - outflow + inflow
        capfw = tuple(new_fw)
        capbw = tuple(f0 - f for f0, f in zip(fw0, capfw))

        active = (e > eps) & (h < hmax)
        best = jnp.where(capt > eps, 0.0, _INF).astype(jnp.float32)
        for cap_out, dx, dy in out_caps(capfw, capbw):
            nb_h = _shift2d_rl(h, dx, dy, hmax)
            best = jnp.minimum(best, jnp.where(cap_out > eps, nb_h, _INF))
        could_push = best <= h - 1.0
        new_h = jnp.where(best >= _INF, hmax, jnp.minimum(best + 1.0, hmax))
        h = jnp.where(active & (~could_push), jnp.maximum(h, new_h), h)
        return e, h, capt, capfw

    def solve(e0, capt0, fw0):
        def round_body(carry):
            e, h, capt, capfw, _, rounds = carry
            capbw = tuple(f0 - f for f0, f in zip(fw0, capfw))
            h = bfs(capt, capfw, capbw)
            live = jnp.any((e > eps) & (h < hmax))

            def inner_cond(c):
                e, h, capt, capfw, k = c
                return (k < sweeps_per_round) & jnp.any((e > eps)
                                                        & (h < hmax))

            def inner_body(c):
                e, h, capt, capfw, k = c
                e, h, capt, capfw = sweep(fw0, e, h, capt, capfw)
                return e, h, capt, capfw, k + 1

            e, h, capt, capfw, _ = jax.lax.while_loop(
                inner_cond, inner_body, (e, h, capt, capfw, jnp.int32(0)))
            return e, h, capt, capfw, live, rounds + 1

        def round_cond(carry):
            _, _, _, _, live, rounds = carry
            return live & (rounds < max_global_rounds)

        h0 = jnp.zeros_like(e0)
        e, h, capt, capfw, _, _ = jax.lax.while_loop(
            round_cond, round_body,
            (e0, h0, capt0, tuple(fw0), jnp.bool_(True), jnp.int32(0)))

        capbw = tuple(f0 - f for f0, f in zip(fw0, capfw))
        dist = bfs(capt, capfw, capbw)
        return dist >= hmax

    return solve


def _edge_masks_iota_rl(s: int):
    """[4][S, S, 1] f32 in-window edge masks for the rl layout."""
    iy = jax.lax.broadcasted_iota(jnp.int32, (s, s, 1), 0)
    ix = jax.lax.broadcasted_iota(jnp.int32, (s, s, 1), 1)
    masks = []
    for dx, dy in mincut_xla.EDGE_DIRS:
        m = ((ix + dx >= 0) & (ix + dx < s) & (iy + dy >= 0)
             & (iy + dy < s))
        masks.append(m.astype(jnp.float32))
    return masks


def _make_expansion_kernel_rl(s: int, lam: float, tau: float,
                              max_global_rounds: int, sweeps_per_round: int):
    """Fused expansion kernel in region-on-lanes layout (see
    :func:`_make_expansion_kernel` for the semantics; block inputs are
    [S+2, S+2, b] / [8, S, S, b] / [S, S, b])."""
    solve = _solver_core_rl(s, max_global_rounds, sweeps_per_round)
    fwd_idx = pairwise.FORWARD

    def kernel(d0h_ref, d1h_ref, ah_ref, bh_ref, coeff_ref,
               ccost_ref, pcost_ref, accept_ref, rl_ref):
        emasks = _edge_masks_iota_rl(s)

        def at_off(ref, dx, dy):
            rl_ref[...] = ref[1 + dy:1 + dy + s, 1 + dx:1 + dx + s, :]
            return rl_ref[...]

        d0 = at_off(d0h_ref, 0, 0)
        d1 = at_off(d1h_ref, 0, 0)
        a0 = at_off(ah_ref, 0, 0)
        b0 = at_off(bh_ref, 0, 0)

        c00s, c01s, c10s = [], [], []
        for i, k in enumerate(fwd_idx):
            dx, dy = pairwise.NEIGHBORS[k]
            d0q = at_off(d0h_ref, dx, dy)
            aq = at_off(ah_ref, dx, dy)
            bq = at_off(bh_ref, dx, dy)
            d_le_ee = d0q - (aq * dx + bq * dy)
            d_ee_le = d0 + a0 * dx + b0 * dy
            d1q = at_off(d1h_ref, dx, dy)
            w = coeff_ref[k] * lam
            c00s.append(jnp.minimum(jnp.abs(d0 - d_le_ee)
                                    + jnp.abs(d_ee_le - d0q), tau) * w)
            c01s.append(jnp.minimum(jnp.abs(d0 - d1)
                                    + jnp.abs(d_ee_le - d1q), tau) * w)
            c10s.append(jnp.minimum(jnp.abs(d1 - d_le_ee)
                                    + jnp.abs(d1q - d0q), tau) * w)

        t0b = jnp.zeros_like(d0)
        t1b = jnp.zeros_like(d0)
        for k, (dx, dy) in enumerate(pairwise.NEIGHBORS):
            iy_i = jax.lax.broadcasted_iota(jnp.int32, (s, s, 1), 0)
            ix_i = jax.lax.broadcasted_iota(jnp.int32, (s, s, 1), 1)
            outside = ((ix_i + dx < 0) | (ix_i + dx >= s) | (iy_i + dy < 0)
                       | (iy_i + dy >= s))
            d0q = at_off(d0h_ref, dx, dy)
            aq = at_off(ah_ref, dx, dy)
            bq = at_off(bh_ref, dx, dy)
            dq_p = d0q - (aq * dx + bq * dy)
            d0_q = d0 + a0 * dx + b0 * dy
            d1_q = at_off(d1h_ref, dx, dy)
            w = jnp.where(outside, coeff_ref[k], 0.0) * lam
            t0b += jnp.minimum(jnp.abs(d0 - dq_p) + jnp.abs(d0_q - d0q),
                               tau) * w
            t1b += jnp.minimum(jnp.abs(d1 - dq_p) + jnp.abs(d1_q - d0q),
                               tau) * w

        t0 = ccost_ref[...] + t0b
        t1 = pcost_ref[...] + t1b

        sigma = t0
        fw0 = []
        for i, k in enumerate(fwd_idx):
            dx, dy = pairwise.NEIGHBORS[k]
            em = emasks[i]
            c = c01s[i] * em
            d_minus_c = (c00s[i] - c01s[i]) * em
            sigma = sigma + c + _shift2d_rl(d_minus_c, -dx, -dy, 0.0)
            cap = jnp.maximum(0.0, c10s[i] + c01s[i] - c00s[i])
            fw0.append(cap * em)
        nu = sigma - t1
        e0 = jnp.maximum(nu, 0.0)
        capt0 = jnp.maximum(-nu, 0.0)

        accept = solve(e0, capt0, tuple(fw0))

        xm = accept.astype(jnp.float32)
        contrib = (t1 - t0) * xm
        for i, k in enumerate(fwd_idx):
            dx, dy = pairwise.NEIGHBORS[k]
            em = emasks[i]
            xq = _shift2d_rl(xm, dx, dy, 0.0)
            pair = (c00s[i] * (1 - xm) * (1 - xq) + c01s[i] * (1 - xm) * xq
                    + c10s[i] * xm * (1 - xq))
            contrib = contrib + (pair - c00s[i]) * em
        delta = jnp.sum(jnp.sum(contrib, axis=1, keepdims=True), axis=0,
                        keepdims=True)                       # [1, 1, b]
        ok = delta <= 0.0
        accept_ref[...] = (accept & ok).astype(jnp.int8)

    return kernel


#: Use the region-on-lanes layout when the window is small enough that the
#: [b, S, S] layout would waste most lanes AND enough regions exist to fill
#: them.
_RL_MAX_S = 64
_RL_B = 128


def _pack(s: int, n: int, budget_bytes: int, planes: int, cap: int = 16):
    """Regions per kernel program under a VMEM budget."""
    lanes = -(-s // 128) * 128
    sublanes = -(-s // 8) * 8
    per_region = planes * sublanes * lanes * 4
    b = int(max(1, min(cap, budget_bytes // max(per_region, 1))))
    n_pad = -(-n // b) * b
    return b, n_pad


@functools.partial(jax.jit, static_argnames=("max_global_rounds",
                                             "sweeps_per_round",
                                             "interpret"))
def mincut_accept_pallas(t0: jnp.ndarray, t1: jnp.ndarray, c00: jnp.ndarray,
                         c01: jnp.ndarray, c10: jnp.ndarray,
                         max_global_rounds: int = 64,
                         sweeps_per_round: int = 0,
                         interpret: bool = False) -> jnp.ndarray:
    """Drop-in replacement for :func:`mincut.mincut_accept` (TPU Pallas)."""
    n, s = t0.shape[0], t0.shape[-1]
    if sweeps_per_round == 0:
        # Tuned on real expansion problems: frequent global relabels beat
        # long push phases (16 is 1.5-2x faster than S at the coarse layers).
        sweeps_per_round = 16

    e, cap_t, cap_fw = mincut_xla.build_graph(t0, t1, c00, c01, c10)

    b, n_pad = _pack(s, n, 4 << 20, planes=11)
    if n_pad != n:
        padw = [(0, n_pad - n)] + [(0, 0)] * 2
        e = jnp.pad(e, padw)
        cap_t = jnp.pad(cap_t, padw)
        cap_fw = jnp.pad(cap_fw, [(0, n_pad - n)] + [(0, 0)] * 3)

    kernel = _make_kernel(s, max_global_rounds, sweeps_per_round)
    accept = pl.pallas_call(
        kernel,
        grid=(n_pad // b,),
        in_specs=[
            pl.BlockSpec((b, s, s), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, s, s), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 4, s, s), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b, s, s), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, s, s), jnp.int8),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(e, cap_t, cap_fw)
    return accept[:n] > 0


@functools.partial(jax.jit, static_argnames=("lam", "tau",
                                             "max_global_rounds",
                                             "sweeps_per_round",
                                             "interpret"))
def expansion_accept_pallas(halo: jnp.ndarray, props: jnp.ndarray,
                            tox: jnp.ndarray, toy: jnp.ndarray,
                            coeff8: jnp.ndarray, ccost: jnp.ndarray,
                            pcost: jnp.ndarray, *, lam: float, tau: float,
                            max_global_rounds: int = 64,
                            sweeps_per_round: int = 0,
                            interpret: bool = False) -> jnp.ndarray:
    """Fused expansion move: pairwise tables, boundary t-links, graph build,
    min-cut solve, and the exact energy guard in ONE kernel.

    Args:
      halo: [N, S+2, S+2, 4] current labels of the move window + 1-px halo.
      props: [N, 4] proposal planes.
      tox, toy: [N] global coords of each window's (0, 0) pixel.
      coeff8: [N, 8, S, S] pairwise weights at p for all 8 directions.
      ccost, pcost: [N, S, S] current / proposal unary (with validity).
    Returns:
      accept: [N, S, S] bool, guarded so applying it never increases the
      region energy.
    """
    n = halo.shape[0]
    s = halo.shape[1] - 2
    if sweeps_per_round == 0:
        sweeps_per_round = 16

    # Halo disparity / slope maps (cheap XLA elementwise, fused upstream).
    hx = (tox[:, None, None].astype(jnp.float32) - 1.0
          + jax.lax.broadcasted_iota(jnp.float32, (1, s + 2, s + 2), 2))
    hy = (toy[:, None, None].astype(jnp.float32) - 1.0
          + jax.lax.broadcasted_iota(jnp.float32, (1, s + 2, s + 2), 1))
    d0h = halo[..., 0] * hx + halo[..., 1] * hy + halo[..., 2]
    d1h = (props[:, 0, None, None] * hx + props[:, 1, None, None] * hy
           + props[:, 2, None, None])
    ah = halo[..., 0]
    bh = halo[..., 1]

    if s <= _RL_MAX_S and n >= _RL_B // 2:
        # Region-on-lanes layout: full vector-lane utilization at small S.
        b = _RL_B
        n_pad = -(-n // b) * b

        def padn(x, extra_dims):
            return jnp.pad(x, [(0, n_pad - n)] + [(0, 0)] * extra_dims)

        h2 = s + 2
        d0h_t = jnp.moveaxis(padn(d0h, 2), 0, -1)       # [S+2, S+2, Np]
        d1h_t = jnp.moveaxis(padn(d1h, 2), 0, -1)
        ah_t = jnp.moveaxis(padn(ah, 2), 0, -1)
        bh_t = jnp.moveaxis(padn(bh, 2), 0, -1)
        coeff_t = jnp.transpose(padn(coeff8, 3), (1, 2, 3, 0))
        ccost_t = jnp.moveaxis(padn(ccost, 2), 0, -1)
        pcost_t = jnp.moveaxis(padn(pcost, 2), 0, -1)

        kernel = _make_expansion_kernel_rl(s, float(lam), float(tau),
                                           max_global_rounds,
                                           sweeps_per_round)
        halo_spec = pl.BlockSpec((h2, h2, b), lambda i: (0, 0, i),
                                 memory_space=pltpu.VMEM)
        win_spec = pl.BlockSpec((s, s, b), lambda i: (0, 0, i),
                                memory_space=pltpu.VMEM)
        accept = pl.pallas_call(
            kernel,
            grid=(n_pad // b,),
            in_specs=[halo_spec, halo_spec, halo_spec, halo_spec,
                      pl.BlockSpec((8, s, s, b), lambda i: (0, 0, 0, i),
                                   memory_space=pltpu.VMEM),
                      win_spec, win_spec],
            out_specs=win_spec,
            out_shape=jax.ShapeDtypeStruct((s, s, n_pad), jnp.int8),
            scratch_shapes=[pltpu.VMEM((s, s, b), jnp.float32)],
            interpret=interpret,
            compiler_params=None if interpret else pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
        )(d0h_t, d1h_t, ah_t, bh_t, coeff_t, ccost_t, pcost_t)
        return jnp.moveaxis(accept, -1, 0)[:n] > 0

    # ~36 live planes: 3 halo + 8 coeff + 2 cost + 12 tables + 11 solver.
    b, n_pad = _pack(s, n, 24 << 20, planes=36)
    if n_pad != n:
        def padn(x, extra_dims):
            return jnp.pad(x, [(0, n_pad - n)] + [(0, 0)] * extra_dims)
        d0h, ah, bh = padn(d0h, 2), padn(ah, 2), padn(bh, 2)
        d1h = padn(d1h, 2)
        coeff8 = padn(coeff8, 3)
        ccost, pcost = padn(ccost, 2), padn(pcost, 2)

    kernel = _make_expansion_kernel(s, float(lam), float(tau),
                                    max_global_rounds, sweeps_per_round)
    h2 = s + 2
    accept = pl.pallas_call(
        kernel,
        grid=(n_pad // b,),
        in_specs=[
            pl.BlockSpec((b, h2, h2), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, h2, h2), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, h2, h2), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, h2, h2), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 8, s, s), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, s, s), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, s, s), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b, s, s), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, s, s), jnp.int8),
        scratch_shapes=[pltpu.VMEM((b, s, s), jnp.float32)],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(d0h, d1h, ah, bh, coeff8, ccost, pcost)
    return accept[:n] > 0
