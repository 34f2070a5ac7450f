"""Pallas TPU kernel: fused volume-window gather + tent-weight reduction.

The V3 raw unary (``CostVolumeEnergy.h:69-98``) needs, per region and
proposal, the plane-sampled volume over the filter window. The XLA path
hoists per-color slab windows with reshape/concat extraction
(``ops/windows.py``) — measured ~20 ms/color of pure relayout on the tiled
bf16 volume at the fine layer. This kernel removes the hoist entirely:

- the padded volume stays in HBM (``memory_space=ANY``);
- each grid program DMAs the [D, F, F] slabs of ``RB`` regions directly from
  their (dynamic) window origins, double-buffered so the next region's DMA
  overlaps the current tent reduction;
- the tent reduction ``sum_d slab[d] * max(0, 1 - |d_grid - d(x,y)|)``
  (exact linear interpolation incl. end-slice clamping, same math as
  :func:`unary_volume.sample_slabs_aligned`) runs in VMEM and writes the
  [F, F] raw cost window.

Per proposal step the traffic is exactly the window bytes — no intermediate
slab array ever exists in HBM.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import COST_FOR_INVALID

#: Regions per grid program (double-buffered DMA pipeline depth is 2).
_RB = 8


def _slab_f32(x: jnp.ndarray) -> jnp.ndarray:
    """Cast a VMEM slab to f32 for the tent contraction.

    Mosaic on real TPU hardware rejects a direct uint8 -> float32 cast
    ("Unsupported cast"); widen the quantized volume through int32 first
    (int32 -> f32 is a native VPU conversion). Interpret mode accepts both,
    so this path is hardware-verified by tools/tpu_smoke.py.
    """
    if x.dtype == jnp.uint8:
        x = x.astype(jnp.int32)
    return x.astype(jnp.float32)


# ------------------------------------------------------------ VMEM box sums
# Static-shift prefix sums on 2D [F, F] tiles (axis 0 = sublanes, axis 1 =
# lanes). Mosaic lowers static concatenate-shifts to plain vector ops; the
# box filter then reproduces ops/boxfilter.boxsum2d's zero-pad semantics.


def _shift_zero(x: jnp.ndarray, k: int, axis: int) -> jnp.ndarray:
    """out[i] = x[i - k] (static k > 0), zero fill."""
    pad_shape = list(x.shape)
    pad_shape[axis] = k
    sl = [slice(None)] * x.ndim
    sl[axis] = slice(0, x.shape[axis] - k)
    return jnp.concatenate([jnp.zeros(pad_shape, x.dtype), x[tuple(sl)]],
                           axis)


def _shift_edge(x: jnp.ndarray, k: int, axis: int) -> jnp.ndarray:
    """out[i] = x[min(i + k, n - 1)] (static k > 0), edge replicate."""
    n = x.shape[axis]
    sl = [slice(None)] * x.ndim
    sl[axis] = slice(k, n)
    last = [slice(None)] * x.ndim
    last[axis] = slice(n - 1, n)
    edge_shape = list(x.shape)
    edge_shape[axis] = k
    return jnp.concatenate(
        [x[tuple(sl)], jnp.broadcast_to(x[tuple(last)], edge_shape)], axis)


def _cumsum_static(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    n = x.shape[axis]
    k = 1
    while k < n:
        x = x + _shift_zero(x, k, axis)
        k *= 2
    return x


def _box1d(x: jnp.ndarray, r: int, axis: int) -> jnp.ndarray:
    c = _cumsum_static(x, axis)
    return _shift_edge(c, r, axis) - _shift_zero(c, r + 1, axis)


def _box2d(x: jnp.ndarray, r: int) -> jnp.ndarray:
    return _box1d(_box1d(x, r, 0), r, 1)


def _make_kernel(d_: int, f: int, fr: int, fc: int, hv: int, wv: int,
                 rb: int, d0_off: float, th_col: float,
                 height: int, width: int, r_gf: int = 0,
                 sub: int = 8, scale: float = 1.0, zero: float = 0.0):
    """Kernel factory. ``r_gf = 0``: raw tent-sampled cost windows.
    ``r_gf > 0``: additionally guided-filters each window in VMEM using the
    DMA'd global-stats slab (guide 3 + mean 3 + inv-cov 6 channels), fusing
    ``guided.filter_windows`` into the same pass — no stats hoist, no
    per-step GF round trip through HBM."""

    def kernel(oyv_ref, oxv_ref, pa_ref, pb_ref, pc_ref, gx0_ref, gy0_ref,
               vol_ref, *rest):
        if r_gf > 0:
            stats_ref, out_ref, slab, sslab, sem, ssem = rest
        else:
            out_ref, slab, sem = rest
            stats_ref = sslab = ssem = None
        pid = pl.program_id(0)
        base = pid * rb

        def aligned(ridx):
            # HBM slices must start/extend on (8, 128) tile boundaries: DMA
            # the aligned superset [fr, fc] and offset-slice in VMEM. The
            # clamps keep the superset inside the (alignment-padded) volume;
            # dy <= fr - f and dx <= fc - f hold by construction.
            oy = oyv_ref[base + ridx]
            ox = oxv_ref[base + ridx]
            # The trailing multiply keeps the sub/128-divisibility of the
            # DMA start provable for Mosaic (hv % sub == 0 and fr % sub ==
            # 0, so (hv - fr) // sub is exact; likewise for lanes). ``sub``
            # is the sublane tile of the volume dtype: 8 for f32/bf16, 32
            # for the uint8-quantized volume ((32, 128) tiling).
            oy_al = jnp.minimum(oy // sub, (hv - fr) // sub) * sub
            ox_al = jnp.minimum(ox // 128, (wv - fc) // 128) * 128
            return oy_al, ox_al, oy - oy_al, ox - ox_al

        def get_dma(slot, ridx):
            oy_al, ox_al, _, _ = aligned(ridx)
            return pltpu.make_async_copy(
                vol_ref.at[:, pl.ds(oy_al, fr), pl.ds(ox_al, fc)],
                slab.at[slot], sem.at[slot])

        def get_stats_dma(slot, ridx):
            # gf_stack shares the volume's base offset and alignment padding
            # (build_energy), so the SAME aligned origins and dy/dx serve
            # both slabs.
            oy_al, ox_al, _, _ = aligned(ridx)
            return pltpu.make_async_copy(
                stats_ref.at[:, pl.ds(oy_al, fr), pl.ds(ox_al, fc)],
                sslab.at[slot], ssem.at[slot])

        get_dma(0, 0).start()
        if r_gf > 0:
            get_stats_dma(0, 0).start()

        # Mosaic's tpu.iota is integer-only; cast after.
        iy_r = jax.lax.broadcasted_iota(jnp.int32, (fr, f), 0
                                        ).astype(jnp.float32)
        ix_r = jax.lax.broadcasted_iota(jnp.int32, (fr, f), 1
                                        ).astype(jnp.float32)
        iy = jax.lax.broadcasted_iota(jnp.int32, (f, f), 0
                                      ).astype(jnp.float32)
        ix = jax.lax.broadcasted_iota(jnp.int32, (f, f), 1
                                      ).astype(jnp.float32)
        dgrid = jax.lax.broadcasted_iota(jnp.int32, (d_, 1, 1), 0
                                         ).astype(jnp.float32)

        def body(r, carry):
            slot = jax.lax.rem(r, 2)

            @pl.when(r + 1 < rb)
            def _():
                get_dma(jax.lax.rem(r + 1, 2), r + 1).start()
                if r_gf > 0:
                    get_stats_dma(jax.lax.rem(r + 1, 2), r + 1).start()

            get_dma(slot, r).wait()
            if r_gf > 0:
                get_stats_dma(slot, r).wait()
            i = base + r
            dy, dx = aligned(r)[2:]
            # Mosaic cannot offset-slice VMEM at runtime offsets, and its
            # dynamic SUBLANE rotate miscompiles for >2-tile extents (lane
            # rotates are exact — verified against interpret mode). So:
            # columns realign with one lane roll; rows are handled by
            # evaluating the tent contraction over ALL fr rows at their true
            # image coordinates (row j of the superset is image row
            # gy0 - dy + j) and selecting the f-row window [dy, dy + f)
            # with a static where-chain (dy <= fr - f < 16 by construction).
            # f32 cast BEFORE the roll: Mosaic's rotate only handles 32-bit
            # data (the tent contraction needs f32 anyway).
            full = pltpu.roll(_slab_f32(slab[slot]), -dx, 2)
            win = full[:, :, :f]                         # [d, fr, f]
            xs_r = gx0_ref[i] + ix_r
            ys_r = (gy0_ref[i] - dy.astype(jnp.float32)) + iy_r
            d_r = pa_ref[i] * xs_r + pb_ref[i] * ys_r + pc_ref[i]
            dv = jnp.clip(d_r + d0_off, 0.0, float(d_ - 1))
            tent = jnp.maximum(0.0, 1.0 - jnp.abs(dgrid - dv[None]))
            cost_r = jnp.sum(win * tent, axis=0)
            if scale != 1.0 or zero != 0.0:
                # Quantized (uint8) volume decode, folded AFTER the tent
                # contraction: the reduction is linear in the slab and the
                # tent weights sum to 1 (incl. clamped end slices), so
                # sum((q*s + z) * tent) == s * sum(q * tent) + z exactly.
                cost_r = cost_r * scale + zero
            cost = cost_r[0:f]
            for k in range(1, fr - f + 1):
                cost = jnp.where(dy == k, cost_r[k:k + f], cost)
            xs = gx0_ref[i] + ix
            ys = gy0_ref[i] + iy
            d = pa_ref[i] * xs + pb_ref[i] * ys + pc_ref[i]
            cost = jnp.where(jnp.isfinite(d), cost, COST_FOR_INVALID)
            cost = jnp.minimum(cost, th_col)
            in_im = ((xs >= 0) & (xs < width) & (ys >= 0) & (ys < height))
            p = jnp.where(in_im, cost, 0.0)
            if r_gf == 0:
                out_ref[r] = p
                return carry

            # ---- fused guided filter (guided.filter_windows semantics) ----
            sfull = pltpu.roll(sslab[slot], -dx, 2)
            swin_r = sfull[:, :, :f]                     # [12, fr, f]
            sw = swin_r[:, 0:f]
            for k in range(1, fr - f + 1):
                sw = jnp.where(dy == k, swin_r[:, k:k + f], sw)
            g0, g1, g2 = sw[0], sw[1], sw[2]
            m0, m1, m2 = sw[3], sw[4], sw[5]
            i0, i1, i2, i3, i4, i5 = (sw[6], sw[7], sw[8], sw[9], sw[10],
                                      sw[11])
            maskf = in_im.astype(jnp.float32)
            nbox = _box2d(maskf, r_gf)
            inv_n = 1.0 / jnp.maximum(nbox, 1e-8)
            s_p = _box2d(p, r_gf)
            s0 = _box2d(p * g0, r_gf)
            s1 = _box2d(p * g1, r_gf)
            s2 = _box2d(p * g2, r_gf)
            mean_p = s_p * inv_n
            c0 = s0 * inv_n - m0 * mean_p
            c1 = s1 * inv_n - m1 * mean_p
            c2 = s2 * inv_n - m2 * mean_p
            a_r = i0 * c0 + i1 * c1 + i2 * c2
            a_g = i1 * c0 + i3 * c1 + i4 * c2
            a_b = i2 * c0 + i4 * c1 + i5 * c2
            b = mean_p - a_r * m0 - a_g * m1 - a_b * m2
            ab0 = _box2d(a_r * maskf, r_gf)
            ab1 = _box2d(a_g * maskf, r_gf)
            ab2 = _box2d(a_b * maskf, r_gf)
            ab3 = _box2d(b * maskf, r_gf)
            out_ref[r] = (ab0 * g0 + ab1 * g1 + ab2 * g2 + ab3) * inv_n
            return carry

        jax.lax.fori_loop(0, rb, body, None, unroll=False)

    return kernel


@functools.partial(jax.jit, static_argnames=("f", "height", "width",
                                             "min_disp", "th_col", "r_gf",
                                             "rb", "scale", "zero",
                                             "interpret"))
def sample_windows_dma(vol: jnp.ndarray, proposals: jnp.ndarray,
                       fox: jnp.ndarray, foy: jnp.ndarray, row_base,
                       col_base, *, f: int, height: int, width: int,
                       min_disp: float, th_col: float,
                       stats: jnp.ndarray = None, r_gf: int = 0,
                       rb: int = _RB, scale: float = 1.0,
                       zero: float = 0.0,
                       interpret: bool = False) -> jnp.ndarray:
    """Unary cost windows sampled straight from the HBM volume — raw, or
    guided-filtered in the same VMEM pass when ``stats``/``r_gf`` are given.

    Args:
      vol: [D, Hv, Wv] PADDED volume (image pixel (x, y) at array
        [y + row_base, x + col_base]); any float dtype, or uint8 with
        ``scale``/``zero`` quantization (decode is folded after the tent
        contraction; uint8 needs Hv % 32 == 0 for its (32, 128) tiling —
        ``build_energy`` pads accordingly).
      proposals: [N, 4] planes; fox, foy: [N] window origins in IMAGE coords
        (may be negative — the padding guarantees array-coord slices are
        in bounds, ``grid.required_volume_padding``).
      row_base, col_base: traced image->array offsets (``cfg.vol_pad``).
      stats: optional [12, Hv, Wv] float32 guided-filter global stats
        (guide 3, mean 3, inverse covariance 6) sharing the volume's base
        offset and alignment padding (``EnergyData.gf_stack[mode]``).
      r_gf: guided-filter radius; 0 disables the fused filter.
    Returns:
      [N, F, F] float32 — raw masked costs (identical semantics to
      :func:`unary_volume.sample_slabs_aligned`), or, with ``r_gf > 0``,
      the guided-filtered windows (``guided.filter_windows`` semantics).
    """
    d_ = vol.shape[0]
    n = proposals.shape[0]
    n_pad = -(-n // rb) * rb

    def padn(x):
        return jnp.pad(x, (0, n_pad - n))

    oyv = padn(foy + row_base).astype(jnp.int32)
    oxv = padn(fox + col_base).astype(jnp.int32)
    pa = padn(proposals[:, 0])
    pb = padn(proposals[:, 1])
    pc = padn(proposals[:, 2])
    gx0 = padn(fox.astype(jnp.float32))
    gy0 = padn(foy.astype(jnp.float32))

    hv, wv = vol.shape[1], vol.shape[2]
    sub = 32 if jnp.dtype(vol.dtype) == jnp.uint8 else 8
    fr = min((f + sub - 1) // sub * sub + sub, hv)
    fc = min((f + 127) // 128 * 128 + 128, wv)
    assert hv % sub == 0 and wv % 128 == 0, \
        "volume needs DMA alignment padding (build_energy appends it)"
    kernel = _make_kernel(d_, f, fr, fc, hv, wv, rb, float(-min_disp),
                          float(th_col), height, width, r_gf=r_gf,
                          sub=sub, scale=float(scale), zero=float(zero))
    in_specs = [pl.BlockSpec(memory_space=pl.ANY)]
    scratch = [pltpu.VMEM((2, d_, fr, fc), vol.dtype)]
    operands = [vol]
    if r_gf > 0:
        assert stats is not None and stats.shape[1:] == (hv, wv), \
            "gf_stack must share the volume's padded geometry"
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        scratch.append(pltpu.VMEM((2, stats.shape[0], fr, fc), stats.dtype))
        operands.append(stats)
        scratch.append(pltpu.SemaphoreType.DMA((2,)))
        scratch.append(pltpu.SemaphoreType.DMA((2,)))
    else:
        scratch.append(pltpu.SemaphoreType.DMA((2,)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,
        grid=(n_pad // rb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((rb, f, f), lambda i, *_: (i, 0, 0)),
        scratch_shapes=scratch,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, f, f), jnp.float32),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(oyv, oxv, pa, pb, pc, gx0, gy0, *operands)
    return out[:n]

