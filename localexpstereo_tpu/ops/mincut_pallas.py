"""Pallas TPU kernel: VMEM-resident push-relabel min-cut.

The XLA implementation in :mod:`mincut` re-reads its 11 state planes from HBM
on every push/relabel sweep (~1000 sweeps per solve); this kernel keeps the
entire region state in VMEM scratch and runs the full solve — global-relabel
BFS rounds + push/relabel sweeps + final cut extraction — inside ONE kernel
invocation per region, so HBM sees each plane exactly once. Memory footprint
per region: 6 input planes + 7 state planes at [S, lanes], which fits VMEM up
to the largest layer the MiddV3 schedule produces (S = 3 * 0.09 * W).

Same semantics as :func:`mincut.mincut_accept`: accept = source side = nodes
that cannot reach the sink in the final residual graph. The backward residual
capacity is reconstructed as ``fw0 - cap_fw`` (initial reverse caps are 0),
which removes 4 carried planes.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import mincut as mincut_xla

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


def _make_kernel(s: int, max_global_rounds: int, sweeps_per_round: int):
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

    def kernel(e0_ref, capt0_ref, fw0_ref, accept_ref):
        e0 = e0_ref[...]
        capt0 = capt0_ref[...]
        fw0 = tuple(fw0_ref[:, k] for k in range(4))

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
        capfw0 = fw0
        e, h, capt, capfw, _, _ = jax.lax.while_loop(
            round_cond, round_body,
            (e0, h0, capt0, capfw0, jnp.bool_(True), jnp.int32(0)))

        capbw = tuple(f0 - f for f0, f in zip(fw0, capfw))
        dist = bfs(capt, capfw, capbw)
        accept_ref[...] = (dist >= hmax).astype(jnp.int8)

    return kernel


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

    # Pack several regions per kernel program: amortizes loop overhead and
    # fills the VPU at small S. Budget ~4 MB of VMEM for the solver state
    # (11 planes + double-buffered inputs).
    lanes = -(-s // 128) * 128
    sublanes = -(-s // 8) * 8
    per_region = 11 * sublanes * lanes * 4
    b = int(max(1, min(16, (4 << 20) // max(per_region, 1))))
    n_pad = -(-n // b) * b
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
