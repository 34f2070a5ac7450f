"""Energy construction and the fused unary pipeline.

Functional equivalents of the reference's ``StereoEnergy`` /
``NaiveStereoEnergy`` / ``CostVolumeEnergy`` objects: all mutable C++ state
becomes two pytrees —

- :class:`EnergyData`: per-problem constant tensors (guide statistics,
  pairwise weights, feature images / cost volumes), padded where windows are
  sliced from them;
- :class:`SolverState`: the evolving ``(labeling, cost)`` per view
  (``PMStereoBase.h:44-49``).

Everything is fixed-shape: windows are dynamic slices from margin-padded
arrays; out-of-image pixels are handled by masks, never by clipping.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import COST_FOR_INVALID, Parameters
from ..ops import (guided, pairwise, unary_pallas, unary_volume, unary_warp,
                   validity, windows)

#: Test hook: when True, the engine's DMA-backend gates accept non-TPU
#: backends (the samplers then run in interpret mode because interpret is
#: derived from ``jax.default_backend() != "tpu"``). CI (CPU) uses it to
#: exercise the "dma" integration end-to-end. CAVEAT: the flag
#: is read at TRACE time and is not part of any jit cache key — set it
#: before the first solver with a DMA-backend cfg is traced in the
#: process, and do not toggle it between same-cfg solvers. Tests only;
#: production leaves it False.
DMA_INTERPRET = False


class EnergyData(NamedTuple):
    """Constant tensors; leading axis V = views (L, R). Spatial arrays that
    feed window slices are padded with margin ``pad`` on each side."""

    guide: jnp.ndarray     # [V, Hp, Wp, 3] scaled guide (padded)
    gf_mean: jnp.ndarray   # [V, Hp, Wp, 3]
    gf_inv: jnp.ndarray    # [V, Hp, Wp, 6]
    coeff8: jnp.ndarray    # [V, 8, Hp, Wp] pairwise weights (padded, 0 margin)
    exi: Optional[jnp.ndarray]   # [V, He, We, 4] V2 feature images, spatially
                                 # zero-padded by cfg.exi_pad on each side
    vol: Optional[jnp.ndarray]   # [V, D, Hv, Wv] V3 cost volumes, spatially
                                 # zero-padded by cfg.vol_pad on each side so
                                 # regular-grid slab blocks slice densely
    #: [V, 12, Hv, Wv] channel-major GF stats (guide 3, mean 3, inv-cov 6)
    #: sharing vol's base offset + DMA alignment — feeds the fused
    #: gather+tent+GF kernel (ops/unary_pallas.py). None off the DMA path.
    gf_stack: Optional[jnp.ndarray] = None


class SolverState(NamedTuple):
    """Mutable optimization state (cf. ``currentLabeling_m_``/``currentCost_``)."""

    labeling: jnp.ndarray  # [V, Hp, Wp, 4] padded, zero margin
    cost: jnp.ndarray      # [V, Hp, Wp] padded, zero margin


@dataclasses.dataclass(frozen=True)
class EnergyConfig:
    """Static (hashable) energy configuration."""

    kind: str              # "naive" (V2 warp) or "volume" (V3)
    width: int
    height: int
    pad: int
    params: Parameters
    min_disp: float
    max_disp: float
    max_vdisp: float = 0.0
    interp: int = 1        # volume d-interpolation (CostVolumeEnergy.h:45-48)
    mincut_backend: str = "auto"  # "auto" | "pallas" | "xla"
    #: V3 raw-sampling backend: "auto" (= "blk" where eligible — volume
    #: kind, interp 1, full color grid — else the "xla" slabs) | "blk"
    #: (block-major tent contraction on the un-exploded bounding block;
    #: won its full-scale hardware A/B 1.18-1.40x at every layer) | "xla"
    #: (dense slab hoist; general fallback) | "dma" (opt-in per-region
    #: fused Pallas DMA kernel). The pruned alternates (block layout,
    #: region-on-lanes, strip-mined dma_rows) lost their hardware A/Bs —
    #: ARCHITECTURE.md round-4 log has the table.
    unary_backend: str = "auto"
    vol_pad: int = 0       # spatial zero padding of EnergyData.vol
    #: Dequantization of a uint8-stored cost volume (vol_dtype="uint8"):
    #: cost_f32 = q * vol_scale + vol_zero. 1.0/0.0 = unquantized storage.
    #: Static floats on the config so XLA constant-folds the decode into
    #: the tent contraction (no extra HBM traffic).
    vol_scale: float = 1.0
    vol_zero: float = 0.0
    exi_pad: int = 0       # spatial zero padding of EnergyData.exi
    #: HBM budget for the hoisted per-color volume slabs; the batched solver
    #: divides this by the vmapped pair count (the hoist materializes once
    #: PER PAIR inside the vmap).
    slab_budget: int = 2 << 30
    #: Min-cut round structure (engine._color_body). gc_rounds caps the
    #: global-relabel rounds of the push-relabel solve; gc_sweeps is the
    #: push-sweep count between relabels. 0 = auto: the fused Pallas path
    #: uses the hardware-tuned (16, 64-if-region>=256-else-16) values
    #: (tools/ab_mincut_knobs.py — bit-identical accepts, -16-18% solve
    #: time on the bench problem); the XLA fallback keeps the conservative
    #: (64, auto) so CPU-generated parity pins are unaffected. Set both
    #: explicitly to force one structure on EITHER backend (e.g.
    #: gc_rounds=64 restores the conservative cap on TPU for
    #: accuracy-critical runs where 16 rounds might truncate convergence —
    #: the in-kernel energy guard keeps truncation monotonic either way).
    gc_rounds: int = 0
    gc_sweeps: int = 0


def build_energy(im0_bgr: np.ndarray, im1_bgr: np.ndarray,
                 params: Parameters, max_disp: float, pad: int,
                 min_disp: float = 0.0, max_vdisp: float = 0.0,
                 vol0: Optional[np.ndarray] = None,
                 vol1: Optional[np.ndarray] = None,
                 interp: int = 1, vol_pad: int = 0,
                 vol_dtype: str = "float32", vol_transform=None,
                 stats_backend: str = "host", dma_align: bool = False):
    """Builds (EnergyData, EnergyConfig) for one stereo pair.

    Passing cost volumes selects the V3 ``CostVolumeEnergy`` data term
    (``main.cpp:386``); otherwise the V2 ``NaiveStereoEnergy`` warp term.

    ``stats_backend="device"`` assembles everything with jnp ops (f32 GF
    stats, on-device padding) so per-frame rebuilds move no bulk data over
    the host link — the serving path. "host" (default) computes GF stats
    in float64 numpy for reference parity (``StereoEnergy.h:673-681``).

    ``dma_align`` widens the volume's trailing padding to the DMA sampler's
    uint8 tile alignment ((32, 128) + a lane tile of clamp slack). Only the
    opt-in "dma" unary backend needs it — solvers set it from
    their backend choice. It must NOT be on by default: the wider row pitch
    taxes every slab gather of the default XLA path (+0.7 s/frame on the
    halfH bench — the round-4 HEAD-vs-6b50199 bisect, ARCHITECTURE.md).
    """
    if stats_backend == "device":
        return _build_energy_device(
            im0_bgr, im1_bgr, params, max_disp, pad, min_disp, max_vdisp,
            vol0, vol1, interp, vol_pad, vol_dtype, vol_transform,
            dma_align)
    h, w = im0_bgr.shape[:2]
    kind = "volume" if vol0 is not None else "naive"
    r = params.guided_radius

    def pad_hw(arr, axes):
        widths = [(0, 0)] * arr.ndim
        for ax in axes:
            widths[ax] = (pad, pad)
        return np.pad(arr, widths)

    guides, means, invs, coeffs, stacks = [], [], [], [], []
    for im in (im0_bgr, im1_bgr):
        stats = guided.compute_stats(im, r, params.filter_param1)
        guides.append(pad_hw(np.asarray(stats.guide), (0, 1)))
        means.append(pad_hw(np.asarray(stats.mean), (0, 1)))
        invs.append(pad_hw(np.nan_to_num(np.asarray(stats.inv)), (0, 1)))
        c8 = np.asarray(pairwise.smoothness_coeffs(
            jnp.asarray(im), params.omega, params.epsilon))
        coeffs.append(pad_hw(c8, (1, 2)))
        stacks.append(np.concatenate([
            np.moveaxis(np.asarray(stats.guide), -1, 0),
            np.moveaxis(np.asarray(stats.mean), -1, 0),
            np.moveaxis(np.nan_to_num(np.asarray(stats.inv)), -1, 0),
        ]).astype(np.float32))                            # [12, H, W]

    exi = vol = None
    exi_pad = 0
    if kind == "naive":
        # Pad so per-color slab blocks (windows + the other view's
        # disparity-reach margin) always slice in-bounds (ops/windows.py).
        exi_pad = int(vol_pad) + int(np.ceil(max_disp)) + 1
        ep = exi_pad
        exi = jnp.asarray(np.pad(np.stack([
            unary_warp.build_feature_image(im0_bgr, params.alpha),
            unary_warp.build_feature_image(im1_bgr, params.alpha)]),
            ((0, 0), (ep, ep), (ep, ep), (0, 0))))
    else:
        vp = int(vol_pad)
        # Volume storage dtype: bf16 halves HBM residency and slab bandwidth
        # (the unary's dominant traffic); sampling/aggregation stay f32. The
        # cast happens HERE, once, so sharded placements slice the exact
        # same bytes (bit-parity between sharded and single-device engines).
        # "uint8" quantizes to 256 levels over [vol_zero, 2*th_col] —
        # costs are truncated at th_col after interpolation anyway
        # (CostVolumeEnergy.h:98), so only values below tau and their
        # immediate interpolation partners matter; the 2*tau headroom keeps
        # basin-wall interpolation faithful (see _quantize_vol).
        vol_scale, vol_zero = 1.0, 0.0
        if vol_dtype == "uint8":
            stacked, vol_scale, vol_zero = _quantize_vol(
                np.stack([vol0, vol1]), params.th_col)
        else:
            stacked = np.stack([vol0, vol1]).astype(jnp.dtype(vol_dtype))
        vol_host = np.pad(stacked, ((0, 0), (0, 0), (vp, vp), (vp, vp)))
        if vol_transform is None:
            # Trailing alignment padding for the DMA sampler
            # (ops/unary_pallas.py): HBM slice starts/shapes must align to
            # the dtype's VMEM tiling — (8, 128) for f32/bf16, (32, 128)
            # for uint8 — so clamped aligned-superset windows need
            # H % sub == 0 (+1 tile) and W % 128 == 0 (+1 tile) of slack.
            sub = 32 if dma_align and vol_host.dtype == np.uint8 else 8
            hv, wv = vol_host.shape[2:]
            vol_host = np.pad(vol_host,
                              ((0, 0), (0, 0), (0, (-hv) % sub + sub),
                               (0, (-wv) % 128 + 128)))
        if vol_transform is not None:
            # Sharded placement hook (parallel/volume.py): receives the
            # padded host volume, returns the device layout (e.g. overlapped
            # H shards placed across a mesh).
            vol = vol_transform(vol_host)
        else:
            vol = jnp.asarray(vol_host)

    gf_stack = None
    if (kind == "volume" and vol_transform is None and dma_align
            and params.filter_name in ("GF", "GFfloat")):
        # Channel-major stats stack for the fused DMA gather+tent+GF kernel,
        # with the volume's exact base offset and alignment padding so one
        # set of window origins serves both slabs.
        vp = int(vol_pad)
        stack_host = np.stack(stacks)                     # [2, 12, H, W]
        stack_host = np.pad(stack_host,
                            ((0, 0), (0, 0), (vp, vp), (vp, vp)))
        stack_host = np.pad(
            stack_host,
            ((0, 0), (0, 0),
             (0, vol.shape[2] - stack_host.shape[2]),
             (0, vol.shape[3] - stack_host.shape[3])))
        gf_stack = jnp.asarray(stack_host)

    data = EnergyData(
        guide=jnp.asarray(np.stack(guides)),
        gf_mean=jnp.asarray(np.stack(means)),
        gf_inv=jnp.asarray(np.stack(invs)),
        coeff8=jnp.asarray(np.stack(coeffs)),
        exi=exi,
        vol=vol,
        gf_stack=gf_stack,
    )
    cfg = EnergyConfig(kind=kind, width=w, height=h, pad=pad, params=params,
                       min_disp=min_disp, max_disp=max_disp,
                       max_vdisp=max_vdisp, interp=interp,
                       vol_pad=int(vol_pad) if kind == "volume" else 0,
                       exi_pad=exi_pad,
                       vol_scale=vol_scale if kind == "volume" else 1.0,
                       vol_zero=vol_zero if kind == "volume" else 0.0)
    return data, cfg


def _quantize_vol(stacked: np.ndarray, th_col: float):
    """uint8 linear quantization of a cost-volume pair.

    Range [zero, 2*th_col]: values are truncated at tau = th_col after
    d-interpolation (``CostVolumeEnergy.h:98``), so exact representation
    above tau only matters through interpolation with a sub-tau neighbor —
    one tau of headroom bounds that error by the quantization step while
    keeping 128+ levels below tau. zero = min(0, volume min) handles
    volumes with negative costs (quantized padding then decodes to `zero`,
    which stays don't-care behind the in-image masks). Deviation from the
    f32 reference is bounded by scale/2 ~= th_col/255 per sample; the V2/V3
    parity pins gate the end-to-end effect (PARITY.md)."""
    zero = float(min(0.0, np.nanmin(stacked)))
    hi = max(2.0 * float(th_col), zero + 1e-6)
    scale = (hi - zero) / 255.0
    q = np.rint((np.clip(stacked, zero, hi) - zero) / scale)
    return q.astype(np.uint8), scale, zero


def _build_energy_device(im0_bgr, im1_bgr, params: Parameters,
                         max_disp: float, pad: int, min_disp: float,
                         max_vdisp: float, vol0, vol1, interp: int,
                         vol_pad: int, vol_dtype: str, vol_transform,
                         dma_align: bool = False):
    """jnp-only :func:`build_energy` (stats_backend="device").

    The config is frame-independent (shapes + params only — the uint8
    quantization range is static from tau, see below), so the whole tensor
    assembly is ONE jitted dispatch: a serving stream rebuilding the energy
    every frame pays a single async device program instead of dozens of
    eager dispatches over the (slow, tunneled) host link."""
    assert vol_transform is None, \
        "sharded volume placement needs the host build path"
    h, w = (int(im0_bgr.shape[0]), int(im0_bgr.shape[1]))
    kind = "volume" if vol0 is not None else "naive"
    vol_scale = 1.0
    if kind == "volume" and vol_dtype == "uint8":
        # Static quantization range from tau only (no data-dependent min:
        # this path rebuilds per frame under jit, and device volumes from
        # the MC-CNN are non-negative).
        vol_scale = 2.0 * float(params.th_col) / 255.0
    cfg = EnergyConfig(kind=kind, width=w, height=h, pad=pad, params=params,
                       min_disp=min_disp, max_disp=max_disp,
                       max_vdisp=max_vdisp, interp=interp,
                       vol_pad=int(vol_pad) if kind == "volume" else 0,
                       exi_pad=(int(vol_pad) + int(np.ceil(max_disp)) + 1
                                if kind == "naive" else 0),
                       vol_scale=vol_scale)
    data = _device_energy_tensors(
        jnp.asarray(im0_bgr, jnp.float32), jnp.asarray(im1_bgr, jnp.float32),
        None if vol0 is None else jnp.asarray(vol0),
        None if vol1 is None else jnp.asarray(vol1),
        cfg=cfg, vol_dtype=vol_dtype, dma_align=dma_align)
    return data, cfg


@functools.partial(jax.jit, static_argnames=("cfg", "vol_dtype",
                                             "dma_align"))
def _device_energy_tensors(im0_bgr, im1_bgr, vol0, vol1, *,
                           cfg: EnergyConfig, vol_dtype: str,
                           dma_align: bool = False) -> EnergyData:
    """Assembles the per-frame EnergyData tensors on device (one program)."""
    params = cfg.params
    pad = cfg.pad
    kind = cfg.kind
    vol_pad = cfg.vol_pad
    h, w = cfg.height, cfg.width
    max_disp = cfg.max_disp
    r = params.guided_radius

    def pad_hw(arr, axes):
        widths = [(0, 0)] * arr.ndim
        for ax in axes:
            widths[ax] = (pad, pad)
        return jnp.pad(arr, widths)

    guides, means, invs, coeffs, stacks = [], [], [], [], []
    for im in (im0_bgr, im1_bgr):
        im = jnp.asarray(im, jnp.float32)
        stats = guided.compute_stats_device(im, r, params.filter_param1)
        guides.append(pad_hw(stats.guide, (0, 1)))
        means.append(pad_hw(stats.mean, (0, 1)))
        invs.append(pad_hw(stats.inv, (0, 1)))
        coeffs.append(pad_hw(pairwise.smoothness_coeffs(
            im, params.omega, params.epsilon), (1, 2)))
        stacks.append(jnp.concatenate([
            jnp.moveaxis(stats.guide, -1, 0),
            jnp.moveaxis(stats.mean, -1, 0),
            jnp.moveaxis(stats.inv, -1, 0)]))

    exi = vol = gf_stack = None
    if kind == "naive":
        ep = cfg.exi_pad
        exi = jnp.pad(jnp.stack([
            unary_warp.build_feature_image(jnp.asarray(im0_bgr), params.alpha),
            unary_warp.build_feature_image(jnp.asarray(im1_bgr), params.alpha)]),
            ((0, 0), (ep, ep), (ep, ep), (0, 0)))
    else:
        vp = int(vol_pad)
        if vol_dtype == "uint8":
            # cfg.vol_scale carries the static range (set by the caller).
            vol = jnp.stack([jnp.asarray(vol0), jnp.asarray(vol1)])
            vol = jnp.clip(jnp.rint(vol / cfg.vol_scale), 0, 255).astype(
                jnp.uint8)
        else:
            vol = jnp.stack([jnp.asarray(vol0), jnp.asarray(vol1)]).astype(
                jnp.dtype(vol_dtype))
        hv0, wv0 = h + 2 * vp, w + 2 * vp
        sub = 32 if dma_align and vol.dtype == jnp.uint8 else 8
        vol = jnp.pad(vol, ((0, 0), (0, 0),
                            (vp, vp + (-hv0) % sub + sub),
                            (vp, vp + (-wv0) % 128 + 128)))
        if dma_align and params.filter_name in ("GF", "GFfloat"):
            st = jnp.stack(stacks)
            gf_stack = jnp.pad(st, ((0, 0), (0, 0),
                                    (vp, vol.shape[2] - h - vp),
                                    (vp, vol.shape[3] - w - vp)))

    return EnergyData(
        guide=jnp.stack(guides), gf_mean=jnp.stack(means),
        gf_inv=jnp.stack(invs), coeff8=jnp.stack(coeffs),
        exi=exi, vol=vol, gf_stack=gf_stack)


def init_state(cfg: EnergyConfig, num_views: int = 2) -> SolverState:
    hp = cfg.height + 2 * cfg.pad
    wp = cfg.width + 2 * cfg.pad
    return SolverState(
        labeling=jnp.zeros((num_views, hp, wp, 4), jnp.float32),
        cost=jnp.zeros((num_views, hp, wp), jnp.float32),
    )


# ------------------------------------------------------------ windowing ----

def slice_windows(arr: jnp.ndarray, ox: jnp.ndarray, oy: jnp.ndarray,
                  pad: int, off: int, size: int) -> jnp.ndarray:
    """[N, size, size, ...] windows of a padded [Hp, Wp, ...] array whose
    top-left sits at unpadded coords (ox + off, oy + off)."""
    trailing = arr.shape[2:]

    def one(o):
        start = (o[1] + pad + off, o[0] + pad + off) + (0,) * len(trailing)
        return jax.lax.dynamic_slice(arr, start, (size, size) + trailing)

    return jax.vmap(one)(jnp.stack([ox, oy], -1))


def slice_windows_leading(arr: jnp.ndarray, ox: jnp.ndarray, oy: jnp.ndarray,
                          pad: int, off: int, size: int) -> jnp.ndarray:
    """Like :func:`slice_windows` for [C, Hp, Wp] arrays -> [N, C, size, size]."""
    c = arr.shape[0]

    def one(o):
        return jax.lax.dynamic_slice(
            arr, (0, o[1] + pad + off, o[0] + pad + off), (c, size, size))

    return jax.vmap(one)(jnp.stack([ox, oy], -1))


def in_image_windows(cfg: EnergyConfig, ox: jnp.ndarray, oy: jnp.ndarray,
                     off: int, size: int) -> jnp.ndarray:
    """[N, size, size] float32 in-image mask of windows at (o + off)."""
    iy = jax.lax.broadcasted_iota(jnp.int32, (size, size), 0)
    ix = jax.lax.broadcasted_iota(jnp.int32, (size, size), 1)
    ys = oy[:, None, None] + off + iy[None]
    xs = ox[:, None, None] + off + ix[None]
    inside = ((xs >= 0) & (xs < cfg.width) & (ys >= 0) & (ys < cfg.height))
    return inside.astype(jnp.float32)


# ---------------------------------------------------------------- unary ----

def slice_filter_windows(data: EnergyData, cfg: EnergyConfig, mode: int,
                         ox: jnp.ndarray, oy: jnp.ndarray, target_off: int,
                         target_size: int):
    """Pre-slices the guided-filter stat windows for :func:`unary_windows`.

    These depend only on the region geometry, not on the proposal, so the
    engine hoists this out of its per-proposal loop (the reference's
    ``Reusable`` caching struct, ``StereoEnergy.h:616-626``)."""
    r = cfg.params.guided_radius
    fsize = target_size + 2 * r
    foff = target_off - r
    gwin = slice_windows(data.guide[mode], ox, oy, cfg.pad, foff, fsize)
    mwin = slice_windows(data.gf_mean[mode], ox, oy, cfg.pad, foff, fsize)
    iwin = slice_windows(data.gf_inv[mode], ox, oy, cfg.pad, foff, fsize)
    fmask = in_image_windows(cfg, ox, oy, foff, fsize)
    return gwin, mwin, iwin, fmask


def dense_filter_windows(data: EnergyData, cfg: EnergyConfig, mode: int,
                         ox: jnp.ndarray, oy: jnp.ndarray, coy, cox,
                         s: int, nby: int, nbx: int, target_off: int,
                         target_size: int):
    """:func:`slice_filter_windows` for a regular color grid, extracted
    densely (ox/oy are still needed for the in-image mask)."""
    r = cfg.params.guided_radius
    fsize = target_size + 2 * r
    foff = target_off - r
    oy0 = coy + (s + foff + cfg.pad)
    ox0 = cox + (s + foff + cfg.pad)
    t = 4 * s
    gwin = windows.dense_windows(data.guide[mode], oy0, ox0, nby, nbx, t,
                                 fsize)
    mwin = windows.dense_windows(data.gf_mean[mode], oy0, ox0, nby, nbx, t,
                                 fsize)
    iwin = windows.dense_windows(data.gf_inv[mode], oy0, ox0, nby, nbx, t,
                                 fsize)
    fmask = in_image_windows(cfg, ox, oy, foff, fsize)
    return gwin, mwin, iwin, fmask


def slice_volume_slabs(data: EnergyData, cfg: EnergyConfig, mode: int,
                       ox: jnp.ndarray, oy: jnp.ndarray, target_off: int,
                       target_size: int):
    """Pre-slices per-region volume slabs for the filter windows (hoisted out
    of the proposal loop when the transient fits in memory).

    Returns ALIGNED slabs [N, D, F, F] whose (0, 0) pixel sits at the true
    window origin ``(o + target_off - r)`` (reads into the zero margin of the
    padded volume are don't-care: masked downstream)."""
    r = cfg.params.guided_radius
    fsize = target_size + 2 * r
    vp = cfg.vol_pad
    fox = ox + (target_off - r + vp)
    foy = oy + (target_off - r + vp)

    def one(o):
        return jax.lax.dynamic_slice(
            data.vol[mode], (0, o[1], o[0]),
            (data.vol.shape[1], fsize, fsize))

    return jax.vmap(one)(jnp.stack([fox, foy], -1))


def dense_volume_slabs(data: EnergyData, cfg: EnergyConfig, mode: int,
                       coy, cox, s: int, nby: int, nbx: int,
                       target_off: int, target_size: int,
                       vol_row_base=None, stride: int = 0):
    """Aligned per-region volume slabs for a regular color grid, extracted
    densely (see :mod:`..ops.windows`). Region (m, k)'s window origin is
    ``(coy + s + target_off - r + m * 4s, ...)`` in image coords.

    ``vol_row_base`` overrides the image-row -> volume-array-row offset
    (default ``cfg.vol_pad``); the spatially sharded engine passes
    ``halo - shard_row0`` so slabs resolve from the local overlapped volume
    shard (``parallel/volume.py``)."""
    r = cfg.params.guided_radius
    fsize = target_size + 2 * r
    if vol_row_base is None:
        vol_row_base = cfg.vol_pad
    oy0 = coy + (s + target_off - r) + vol_row_base
    ox0 = cox + (s + target_off - r + cfg.vol_pad)
    return windows.dense_windows_leading(data.vol[mode], oy0, ox0, nby, nbx,
                                         stride or 4 * s, fsize)


def dense_volume_block(data: EnergyData, cfg: EnergyConfig, mode: int,
                       coy, cox, s: int, nby: int, nbx: int,
                       target_off: int, target_size: int,
                       vol_row_base=None):
    """Un-exploded volume coverage of a regular color grid for the
    block-major unary backend (``ops.windows.dense_block_parts``): one
    bounding-block ``dynamic_slice`` + reshape strips instead of the
    [N, D, F, F] slab explosion of :func:`dense_volume_slabs`. Same origin
    convention as that function."""
    r = cfg.params.guided_radius
    fsize = target_size + 2 * r
    if vol_row_base is None:
        vol_row_base = cfg.vol_pad
    oy0 = coy + (s + target_off - r) + vol_row_base
    ox0 = cox + (s + target_off - r + cfg.vol_pad)
    return windows.dense_block_parts(data.vol[mode], oy0, ox0, nby, nbx,
                                     4 * s, fsize)


def dense_exi_slabs(data: EnergyData, cfg: EnergyConfig, mode: int,
                    coy, cox, s: int, nby: int, nbx: int,
                    target_off: int, target_size: int):
    """Aligned V2 feature slabs for a regular color grid (hoisted per color
    step): self-view windows + other-view slabs wide enough for the full
    disparity reach (``src_x = x - sign * d``, d in [0, max_disp])."""
    r = cfg.params.guided_radius
    fsize = target_size + 2 * r
    ep = cfg.exi_pad
    m = int(np.ceil(cfg.max_disp)) + 1
    t = 4 * s
    oy0 = coy + (s + target_off - r + ep)
    ox0 = cox + (s + target_off - r + ep)
    f_self = windows.dense_windows(data.exi[mode], oy0, ox0, nby, nbx, t,
                                   fsize)
    ox0s = ox0 - (m if mode == 0 else 0)
    f_other = windows.dense_windows(data.exi[1 - mode], oy0, ox0s, nby, nbx,
                                    t, fsize, fx=fsize + m)
    return f_self, f_other


def volume_slab_bytes(data: EnergyData, n_regions: int, target_size: int,
                      guided_radius: int) -> int:
    d_ = data.vol.shape[1]
    fsize = target_size + 2 * guided_radius
    return 4 * n_regions * d_ * fsize * fsize


def unary_windows(data: EnergyData, cfg: EnergyConfig, mode: int,
                  proposals: jnp.ndarray, ox: jnp.ndarray, oy: jnp.ndarray,
                  target_off: int, target_size: int,
                  stat_windows=None, vol_slabs=None,
                  exi_slabs=None, vol_dma: bool = False,
                  dshard=None, vol_block=None) -> jnp.ndarray:
    """Filtered unary costs of ``proposals`` over target windows.

    Implements ``ComputeUnaryPotential`` (``CostVolumeEnergy.h:55-183`` /
    ``StereoEnergy.h:694-753``): raw matching cost on the filter window
    (target + R margin), guided-filter aggregation, extraction of the target
    portion, and the validity clamp to ``COST_FOR_INVALID``.

    Args:
      mode: 0 = left view, 1 = right (static).
      ox, oy: [N] global coords of the regions' UNIT origin.
      target_off: target window offset from the unit origin (-s for shared
        windows, 0 for init-time unit windows).
      target_size: side of the target window (3s or s).
      dshard: D-axis volume sharding (``parallel/dvolume.py``):
        ``(d_base, d_owned, d_total, axis_name)`` — the raw sampling runs
        as a per-device owned-pixel partial over the local plane shard and
        a ``psum`` over ``axis_name`` reassembles the exact raw cost before
        filtering (must be called inside the corresponding ``shard_map``).
      vol_block: block-major backend ("blk"): ``(parts, nby, nbx, t)``
        from :func:`dense_volume_block` — requires ox/oy to be the
        row-major regular color grid (window (m, k) origin =
        (oy[0] + m*t, ox[0] + k*t)), which every engine color step is.
    Returns:
      [N, T, T] float32 costs (0 outside the image).
    """
    r = cfg.params.guided_radius
    fsize = target_size + 2 * r
    foff = target_off - r
    fox = ox + foff
    foy = oy + foff

    fused_gf = (vol_dma and data.gf_stack is not None
                and cfg.params.filter_name in ("GF", "GFfloat"))
    if cfg.kind == "volume":
        if vol_dma:
            # Fused HBM-window-gather + tent kernel (ops/unary_pallas.py):
            # no hoisted slab array, traffic = exactly the window bytes.
            # With fused_gf the guided filter runs in the same VMEM pass,
            # so no stats hoist or per-step GF round trip exists either.
            raw = unary_pallas.sample_windows_dma(
                data.vol[mode], proposals, fox, foy, cfg.vol_pad,
                cfg.vol_pad, f=fsize, height=cfg.height, width=cfg.width,
                min_disp=cfg.min_disp, th_col=cfg.params.th_col,
                stats=data.gf_stack[mode] if fused_gf else None,
                r_gf=r if fused_gf else 0,
                scale=cfg.vol_scale, zero=cfg.vol_zero,
                interpret=jax.default_backend() != "tpu")
        elif vol_block is not None:
            parts, nby_b, nbx_b, t_b = vol_block
            # NOTE on cross-shape determinism: on XLA:CPU the tail-quadrant
            # contractions (narrow [*, nbx*E] arrays) compile with
            # shape-dependent reassociation — a row-sliced program (the
            # H-sharded engine's nby_loc rows) differs from the full-grid
            # program by 1-2 ulp at a few pixels, which can flip near-tie
            # accepts. Fusion barriers do NOT fix it (measured). This is
            # why "auto" resolves to blk only on TPU, where the full-scale
            # interleaved A/B showed bit-identical labelings
            # (tools/ab_block_unary.py); see engine._color_body's routing
            # matrix and tests/test_backend_consistency.py.
            raw = unary_volume.sample_block_aligned(
                parts, proposals, fox[0], foy[0], nby_b, nbx_b, t_b, fsize,
                cfg.height, cfg.width, min_disp=cfg.min_disp,
                th_col=cfg.params.th_col,
                scale=cfg.vol_scale, zero=cfg.vol_zero)
        elif vol_slabs is not None:
            if dshard is not None:
                d_base, d_owned, d_total, ax = dshard
                part = unary_volume.sample_slabs_dshard(
                    vol_slabs, proposals, fox, foy, cfg.height, cfg.width,
                    min_disp=cfg.min_disp, max_disp=cfg.max_disp,
                    th_col=cfg.params.th_col, method=cfg.interp,
                    d_base=d_base, d_owned=d_owned, d_total=d_total,
                    scale=cfg.vol_scale, zero=cfg.vol_zero)
                raw = jax.lax.psum(part, ax)
            elif cfg.interp == 1:
                raw = unary_volume.sample_slabs_aligned(
                    vol_slabs, proposals, fox, foy, cfg.height, cfg.width,
                    min_disp=cfg.min_disp, th_col=cfg.params.th_col,
                    scale=cfg.vol_scale, zero=cfg.vol_zero)
            else:
                # Nearest/quadratic over the same slabs (the spatially
                # sharded engine reaches here for interp != 1: its devices
                # hold only their volume rows, so the full-volume gather
                # below is not available).
                raw = unary_volume.sample_slabs_method(
                    vol_slabs, proposals, fox, foy, cfg.height, cfg.width,
                    min_disp=cfg.min_disp, max_disp=cfg.max_disp,
                    th_col=cfg.params.th_col, method=cfg.interp,
                    scale=cfg.vol_scale, zero=cfg.vol_zero)
        else:
            vp = cfg.vol_pad
            vol_un = (data.vol[mode] if vp == 0 else
                      jax.lax.slice(data.vol[mode],
                                    (0, vp, vp),
                                    (data.vol.shape[1], vp + cfg.height,
                                     vp + cfg.width)))
            if cfg.interp == 1:
                # Fast slab-based linear interpolation (same semantics).
                raw = unary_volume.sample_windows_slab(
                    vol_un, proposals, fox, foy, fsize,
                    cfg.min_disp, cfg.max_disp, cfg.params.th_col,
                    budget_bytes=cfg.slab_budget,
                    scale=cfg.vol_scale, zero=cfg.vol_zero)
            else:
                raw = unary_volume.sample_windows(
                    vol_un, proposals, fox, foy, fsize,
                    cfg.min_disp, cfg.max_disp, cfg.params.th_col,
                    cfg.interp, scale=cfg.vol_scale, zero=cfg.vol_zero)
    elif exi_slabs is not None:
        f_self, f_other = exi_slabs
        raw = unary_warp.sample_exi_slabs_aligned(
            f_self, f_other, proposals, fox, foy, cfg.height, cfg.width,
            sign=1.0 if mode == 0 else -1.0, th_col=cfg.params.th_col,
            th_grad=cfg.params.th_grad, alpha=cfg.params.alpha,
            m=int(np.ceil(cfg.max_disp)) + 1)
    else:
        ep = cfg.exi_pad
        exi_un = (data.exi if ep == 0 else
                  data.exi[:, ep:ep + cfg.height, ep:ep + cfg.width])
        if cfg.max_vdisp == 0.0:
            # Slab fast path (v-perturbation disabled, the demo config).
            raw = unary_warp.sample_windows_slab(
                exi_un[mode], exi_un[1 - mode], proposals, fox, foy, fsize,
                1.0 if mode == 0 else -1.0, cfg.params.th_col,
                cfg.params.th_grad, cfg.params.alpha, cfg.max_disp)
        else:
            raw = unary_warp.sample_windows(
                exi_un[mode], exi_un[1 - mode], proposals, fox, foy, fsize,
                1.0 if mode == 0 else -1.0, cfg.params.th_col,
                cfg.params.th_grad, cfg.params.alpha)

    if fused_gf:
        q = raw                      # already guided-filtered in the kernel
    elif cfg.params.filter_name in ("GF", "GFfloat"):
        if stat_windows is None:
            stat_windows = slice_filter_windows(data, cfg, mode, ox, oy,
                                                target_off, target_size)
        gwin, mwin, iwin, fmask = stat_windows
        q = guided.filter_windows(raw, gwin, mwin, iwin, fmask, r)
    elif cfg.params.filter_name in ("BF", "BL"):
        # Joint bilateral aggregation (paramsBF): full windR radius, raw
        # 0..255 guide (GuidedFilter.h:329-374). Reuses the sliced scaled
        # guide windows, un-scaling them.
        from ..ops import bilateral
        if stat_windows is None:
            stat_windows = slice_filter_windows(data, cfg, mode, ox, oy,
                                                target_off, target_size)
        gwin, _, _, fmask = stat_windows
        q = bilateral.filter_windows(raw, gwin * 255.0, fmask,
                                     cfg.params.windR,
                                     cfg.params.filter_param1)
    else:
        q = raw

    q = q[:, r:r + target_size, r:r + target_size]

    tox = ox + target_off
    toy = oy + target_off
    valid = validity.valid_windows(proposals, tox, toy, target_size,
                                   cfg.min_disp, cfg.max_disp)
    tmask = in_image_windows(cfg, ox, oy, target_off, target_size)
    q = jnp.where(valid, q, COST_FOR_INVALID)
    return q * tmask
