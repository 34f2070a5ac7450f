"""Batched binary submodular min-cut on grid regions (parallel push-relabel).

Replaces the reference's serial BK maxflow (``maxflow/`` +
``FastGCStereo::expansionMoveBK``, ``FastGCStereo.h:411-597``). BK augments
paths one at a time and is inherently sequential; on TPU we instead run
Goldberg-Tarjan push-relabel *data-parallel over every pixel of every region
of a color set at once*:

- the graph is implicit: 4 forward-neighbor edge-capacity planes + their
  reverse residuals, terminal capacities folded into per-node excess
  (``e = max(sigma - tau, 0)``, ``cap_t = max(tau - sigma, 0)``);
- pushes and relabels alternate in separate Jacobi phases (each node pushes
  along at most one admissible direction per phase, so capacity and excess
  invariants hold without atomics);
- a periodic GLOBAL RELABEL recomputes exact residual distances to the sink
  by min-plus BFS run to fixpoint, which both accelerates convergence and
  certifies termination: the loop only exits when no node with excess can
  reach the sink in the residual graph — at that point the preflow saturates
  a minimum cut (standard max-preflow/min-cut argument);
- the accepted set is the source side = nodes that CANNOT reach the sink,
  matching BK's ``what_segment == SOURCE => accept`` convention
  (``FastGCStereo.h:553-559``).

Graph construction follows the reference's submodular decomposition
(``FastGCStereo.h:479-551``): for each forward edge with pairwise table
(D, C, B, 0) = (cost00, cost01, cost10, cost11):
  edge p->q capacity ``max(0, B + C - D)``, source-cap shifts ``C`` at p and
  ``D - C`` at q. Terminal capacities start from (current, proposal) unary
  costs plus the boundary t-links.

An exact per-region energy-delta guard (:func:`move_energy_delta`) rejects
any move that would increase the region energy, so the engine's energy is
monotone non-increasing even if the iteration cap is ever hit.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import pairwise

#: (dx, dy) of the 4 forward edge directions, in table order (GE, EG, LG, GG).
EDGE_DIRS = tuple(pairwise.NEIGHBORS[k] for k in pairwise.FORWARD)

# Plain Python float, NOT jnp.float32: a module-level device constant would
# initialize the JAX backend at import time, which (a) defeats the CLI's
# -platform escape hatch and (b) hangs every import when the tunneled TPU
# is wedged. jnp ops coerce it identically under trace.
_INF = float(3e38)


def _shift(x: jnp.ndarray, dx: int, dy: int, fill):
    """[N, S, S] -> value at p + (dx, dy), `fill` outside the window."""
    n, s = x.shape[0], x.shape[1]
    pad_width = ((0, 0), (1, 1), (1, 1))
    padded = jnp.pad(x, pad_width, constant_values=fill)
    return jax.lax.dynamic_slice(padded, (0, 1 + dy, 1 + dx), (n, s, s))


def _edge_masks(s: int):
    """[4, S, S] bool: edge (p, p + dir) lies inside the window."""
    iy = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
    ix = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
    masks = []
    for dx, dy in EDGE_DIRS:
        masks.append((ix + dx >= 0) & (ix + dx < s) & (iy + dy >= 0)
                     & (iy + dy < s))
    return jnp.stack(masks)


def build_graph(t0: jnp.ndarray, t1: jnp.ndarray, c00: jnp.ndarray,
                c01: jnp.ndarray, c10: jnp.ndarray):
    """Folds unary + pairwise tables into (excess, sink-cap, edge-caps).

    Args:
      t0, t1: [N, S, S] total cost of keeping / switching each pixel
        (unary + boundary absorption).
      c00, c01, c10: [N, 4, S, S] pairwise tables (:func:`pairwise.expansion_tables`).
    Returns:
      e, cap_t: [N, S, S]; cap_fw: [N, 4, S, S] (reverse residuals start 0).
    """
    s = t0.shape[-1]
    emask = _edge_masks(s)[None]              # [1, 4, S, S]
    sigma = t0
    cap_fw = []
    for k, (dx, dy) in enumerate(EDGE_DIRS):
        c = jnp.where(emask[:, k], c01[:, k], 0.0)
        d_minus_c = jnp.where(emask[:, k], c00[:, k] - c01[:, k], 0.0)
        sigma = sigma + c + _shift(d_minus_c, -dx, -dy, 0.0)
        cap = jnp.maximum(0.0, c10[:, k] + c01[:, k] - c00[:, k])
        cap_fw.append(jnp.where(emask[:, k], cap, 0.0))
    tau = t1
    nu = sigma - tau
    e = jnp.maximum(nu, 0.0)
    cap_t = jnp.maximum(-nu, 0.0)
    return e, cap_t, jnp.stack(cap_fw, axis=1)


def build_fusion_graph(t0: jnp.ndarray, t1: jnp.ndarray, c00: jnp.ndarray,
                       c01: jnp.ndarray, c10: jnp.ndarray,
                       c11: jnp.ndarray):
    """Graph for the FUSION move (cost11 != 0; ``fusionMoveBK``,
    ``FastGCStereo.h:241-410``).

    Per edge with table (D, C, B, E) = (c00, c01, c10, c11):
    source-caps ``C - E`` at p and ``D - C + E`` at q, sink-cap ``E`` at q,
    edge capacity ``max(0, B + C - D - E)`` — the reference's same
    non-submodular clamp. Returns (e, cap_t, cap_fw).
    """
    s = t0.shape[-1]
    emask = _edge_masks(s)[None]
    sigma = t0
    tau = t1
    cap_fw = []
    for k, (dx, dy) in enumerate(EDGE_DIRS):
        cme = jnp.where(emask[:, k], c01[:, k] - c11[:, k], 0.0)
        dce = jnp.where(emask[:, k], c00[:, k] - c01[:, k] + c11[:, k], 0.0)
        ee = jnp.where(emask[:, k], c11[:, k], 0.0)
        sigma = sigma + cme + _shift(dce, -dx, -dy, 0.0)
        tau = tau + _shift(ee, -dx, -dy, 0.0)
        cap = jnp.maximum(0.0, c10[:, k] + c01[:, k] - c00[:, k]
                          - c11[:, k])
        cap_fw.append(jnp.where(emask[:, k], cap, 0.0))
    nu = sigma - tau
    e = jnp.maximum(nu, 0.0)
    cap_t = jnp.maximum(-nu, 0.0)
    return e, cap_t, jnp.stack(cap_fw, axis=1)


def _residual_caps_to(cap_fw, cap_bw):
    """Residual capacity from p OUTWARD along each of 8 directions:
    4 forward (cap_fw at p) and 4 backward (cap_bw at p - dir)."""
    outs = []
    for k, (dx, dy) in enumerate(EDGE_DIRS):
        outs.append((cap_fw[:, k], dx, dy))
    for k, (dx, dy) in enumerate(EDGE_DIRS):
        outs.append((_shift(cap_bw[:, k], -dx, -dy, 0.0), -dx, -dy))
    return outs


def _bfs_distance(cap_t, cap_fw, cap_bw, hmax: int, eps: float):
    """Exact residual distance-to-sink by min-plus relaxation to fixpoint."""
    d0 = jnp.where(cap_t > eps, 1.0, _INF)

    def cond(carry):
        d, changed, it = carry
        return changed & (it < hmax)

    def body(carry):
        d, _, it = carry
        best = d
        for cap_out, dx, dy in _residual_caps_to(cap_fw, cap_bw):
            nb = _shift(d, dx, dy, _INF)
            best = jnp.minimum(best, jnp.where(cap_out > eps, nb + 1.0, _INF))
        changed = jnp.any(best < d)
        return best, changed, it + 1

    d, _, _ = jax.lax.while_loop(cond, body,
                                 (d0, jnp.bool_(True), jnp.int32(0)))
    return jnp.where(d >= _INF, jnp.float32(hmax), d)


def _solve_preflow(e, cap_t, cap_fw, max_global_rounds: int,
                   sweeps_per_round: int):
    """Shared push-relabel core: runs the preflow to termination and returns
    (accept, rounds, active_left). See the module docstring."""
    s = e.shape[-1]
    hmax = s * s + 2
    eps = jnp.float32(1e-7)
    if sweeps_per_round == 0:
        # Tuned on real expansion problems: frequent global relabels beat
        # long push phases (16 is 1.5-2x faster than S at the coarse layers).
        sweeps_per_round = 16

    cap_bw = jnp.zeros_like(cap_fw)
    h = jnp.zeros_like(e)

    def push_relabel_sweep(_, st):
        e, h, cap_t, cap_fw, cap_bw = st
        active = (e > eps) & (h < hmax)

        # ---- choose one admissible outgoing direction per node ----------
        taken = jnp.zeros_like(active)
        flows = []
        # Priority 0: direct sink push (admissible iff h == 1).
        adm = active & (cap_t > eps) & (h == 1.0)
        f_sink = jnp.where(adm, jnp.minimum(e, cap_t), 0.0)
        taken |= adm
        # Grid pushes, forward then backward directions.
        caps_out = _residual_caps_to(cap_fw, cap_bw)
        for cap_out, dx, dy in caps_out:
            nb_h = _shift(h, dx, dy, jnp.float32(hmax))
            adm = active & (~taken) & (cap_out > eps) & (h == nb_h + 1.0)
            flows.append(jnp.where(adm, jnp.minimum(e, cap_out), 0.0))
            taken |= adm

        # ---- apply flows -------------------------------------------------
        cap_t = cap_t - f_sink
        outflow = f_sink
        inflow = jnp.zeros_like(e)
        new_fw = list(jnp.moveaxis(cap_fw, 1, 0))
        new_bw = list(jnp.moveaxis(cap_bw, 1, 0))
        for k, (dx, dy) in enumerate(EDGE_DIRS):
            f = flows[k]                       # push p -> p+dir
            new_fw[k] = new_fw[k] - f
            new_bw[k] = new_bw[k] + f
            outflow = outflow + f
            inflow = inflow + _shift(f, -dx, -dy, 0.0)
        for k, (dx, dy) in enumerate(EDGE_DIRS):
            f = flows[4 + k]                   # push p -> p-dir
            fr = _shift(f, dx, dy, 0.0)        # seen from the edge's p-side
            new_bw[k] = new_bw[k] - fr
            new_fw[k] = new_fw[k] + fr
            outflow = outflow + f
            inflow = inflow + fr
        cap_fw = jnp.stack(new_fw, axis=1)
        cap_bw = jnp.stack(new_bw, axis=1)
        e = e - outflow + inflow

        # ---- relabel phase (only nodes that could not push) --------------
        active = (e > eps) & (h < hmax)
        best = jnp.where(cap_t > eps, jnp.float32(0.0), _INF)
        for cap_out, dx, dy in _residual_caps_to(cap_fw, cap_bw):
            nb_h = _shift(h, dx, dy, jnp.float32(hmax))
            best = jnp.minimum(best, jnp.where(cap_out > eps, nb_h, _INF))
        could_push = best <= h - 1.0
        new_h = jnp.where(best >= _INF, jnp.float32(hmax),
                          jnp.minimum(best + 1.0, hmax))
        h = jnp.where(active & (~could_push), jnp.maximum(h, new_h), h)
        return e, h, cap_t, cap_fw, cap_bw

    def round_body(carry):
        st, _, rounds = carry
        e, h, cap_t, cap_fw, cap_bw = st
        # Global relabel: exact residual distances (certifies progress).
        h = _bfs_distance(cap_t, cap_fw, cap_bw, hmax, eps)
        live = jnp.any((e > eps) & (h < hmax))

        def run(st):
            # Inner sweeps exit as soon as no node is active, so a round
            # never burns its full budget after local convergence.
            def cond(c):
                st, k = c
                e, h = st[0], st[1]
                return (k < sweeps_per_round) & jnp.any((e > eps)
                                                        & (h < hmax))

            def body(c):
                st, k = c
                return push_relabel_sweep(k, st), k + 1

            (st, _) = jax.lax.while_loop(cond, body, (st, jnp.int32(0)))
            return st

        st = jax.lax.cond(live, run, lambda st: st,
                          (e, h, cap_t, cap_fw, cap_bw))
        return st, live, rounds + 1

    def round_cond(carry):
        _, live, rounds = carry
        return live & (rounds < max_global_rounds)

    st = (e, h, cap_t, cap_fw, cap_bw)
    st, _, rounds = jax.lax.while_loop(round_cond, round_body,
                                       (st, jnp.bool_(True), jnp.int32(0)))
    e, h, cap_t, cap_fw, cap_bw = st

    # Cut extraction: sink side = can reach t in the residual graph.
    dist = _bfs_distance(cap_t, cap_fw, cap_bw, hmax, eps)
    accept = dist >= hmax
    active_left = jnp.sum((e > eps) & (dist < hmax))
    return accept, rounds, active_left


@functools.partial(jax.jit, static_argnames=("max_global_rounds",
                                             "sweeps_per_round",
                                             "with_stats"))
def mincut_accept(t0: jnp.ndarray, t1: jnp.ndarray, c00: jnp.ndarray,
                  c01: jnp.ndarray, c10: jnp.ndarray,
                  max_global_rounds: int = 64,
                  sweeps_per_round: int = 0,
                  with_stats: bool = False):
    """Solves the batched expansion move; returns accept mask [N, S, S] bool.

    accept[p] == True means pixel p takes the proposal (source side).
    With ``with_stats`` also returns (rounds_used, active_nodes_left).
    """
    e, cap_t, cap_fw = build_graph(t0, t1, c00, c01, c10)
    accept, rounds, left = _solve_preflow(e, cap_t, cap_fw,
                                          max_global_rounds,
                                          sweeps_per_round)
    if with_stats:
        return accept, rounds, left
    return accept


@functools.partial(jax.jit, static_argnames=("max_global_rounds",
                                             "sweeps_per_round"))
def fusion_accept(t0: jnp.ndarray, t1: jnp.ndarray, c00: jnp.ndarray,
                  c01: jnp.ndarray, c10: jnp.ndarray, c11: jnp.ndarray,
                  max_global_rounds: int = 64, sweeps_per_round: int = 0):
    """Fusion move between two labelings: accept[p] == True takes labeling 1.

    The reference implements (but never invokes) this as ``fusionMoveBK``;
    it is the hook for fusion-move extensions. Non-submodular edges are
    truncated exactly like the reference's clamp, so the move is approximate
    there but still energy-checked by the engine's guard.
    """
    e, cap_t, cap_fw = build_fusion_graph(t0, t1, c00, c01, c10, c11)
    accept, _, _ = _solve_preflow(e, cap_t, cap_fw, max_global_rounds,
                                  sweeps_per_round)
    return accept


def move_energy_delta(accept: jnp.ndarray, t0, t1, c00, c01, c10):
    """Exact region energy change of applying ``accept`` ([N, S, S] bool).

    Used as the monotonicity guard: ``delta <= 0`` for every move an exact
    solver returns; the engine zeroes any region where delta > 0. This is the
    always-on version of the reference's compiled-out flow-vs-energy audit
    (``FastGCStereo.h:561-594``).
    """
    s = t0.shape[-1]
    emask = _edge_masks(s)[None]
    x = accept.astype(jnp.float32)
    delta = jnp.sum((t1 - t0) * x, axis=(-2, -1))
    for k, (dx, dy) in enumerate(EDGE_DIRS):
        xq = _shift(x, dx, dy, 0.0)
        pair = (c00[:, k] * (1 - x) * (1 - xq) + c01[:, k] * (1 - x) * xq
                + c10[:, k] * x * (1 - xq))
        base = c00[:, k]
        m = emask[:, k].astype(jnp.float32)
        delta = delta + jnp.sum((pair - base) * m, axis=(-2, -1))
    return delta


def fusion_move_energy_delta(accept: jnp.ndarray, t0, t1, c00, c01, c10,
                             c11):
    """Exact region energy change of a FUSION accept mask (c11 not
    identically zero, unlike expansion — ``StereoEnergy.h:331-394``). Used
    as the engine's monotonicity guard on fusion sweeps; the truncated
    non-submodular edges make the solve approximate, so the guard is the
    correctness backstop."""
    s = t0.shape[-1]
    emask = _edge_masks(s)[None]
    x = accept.astype(jnp.float32)
    delta = jnp.sum((t1 - t0) * x, axis=(-2, -1))
    for k, (dx, dy) in enumerate(EDGE_DIRS):
        xq = _shift(x, dx, dy, 0.0)
        pair = (c00[:, k] * (1 - x) * (1 - xq) + c01[:, k] * (1 - x) * xq
                + c10[:, k] * x * (1 - xq) + c11[:, k] * x * xq)
        base = c00[:, k]
        m = emask[:, k].astype(jnp.float32)
        delta = delta + jnp.sum((pair - base) * m, axis=(-2, -1))
    return delta


def greedy_accept(current_cost: jnp.ndarray,
                  proposal_cost: jnp.ndarray) -> jnp.ndarray:
    """PatchMatch-style per-pixel acceptance used by the pm-init sweeps:
    ``updateMask = current > proposal`` (``FastGCStereo.h:57``)."""
    return proposal_cost < current_cost
