"""Run and energy configuration.

Mirrors the reference's two config layers: ``Options`` (run-level CLI flags,
reference ``main.cpp:14-70``) and ``Parameters`` (energy hyper-parameters,
reference ``StereoEnergy.h:13-40``), including the three named presets from
``main.cpp:72-74`` and the mode-conditional defaults from ``main.cpp:37-40``.
"""
from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass(frozen=True)
class Parameters:
    """Energy hyper-parameters (reference ``StereoEnergy.h:13-40``).

    Attributes:
      alpha: color/gradient blend of the V2 data term.
      omega: bandwidth of the pairwise (and patch) color weights, on 0..255
        intensities.
      th_grad / th_col: truncation of the V2 gradient / color terms. For the
        cost-volume (V3) energy, ``th_col`` is reused as tau_CNN
        (``main.cpp:351``).
      lambda_: smoothness weight (lambda in the paper).
      th_smooth: truncation of the pairwise curvature term.
      epsilon: lower bound of the pairwise weight.
      filter_param1: guided-filter eps (or bilateral sigma).
      windR: window radius; the guided filter uses radius ``windR // 2``
        (``StereoEnergy.h:674``).
      neighbor_num: 4 or 8 neighborhood.
      filter_name: "GF", "GFfloat", "BF" or "" (no filtering).
    """

    alpha: float = 0.9
    omega: float = 10.0
    th_grad: float = 2.0
    th_col: float = 10.0
    lambda_: float = 1.0
    th_smooth: float = 1.0
    epsilon: float = 0.01
    filter_param1: float = 1e-4
    windR: int = 20
    neighbor_num: int = 8
    filter_name: str = "GF"

    @property
    def guided_radius(self) -> int:
        return self.windR // 2

    def replace(self, **kw) -> "Parameters":
        return dataclasses.replace(self, **kw)


#: Presets from ``main.cpp:72-74``. The constructor order there is
#: Parameters(lambda, windR, filterName, filter_param1).
PARAMS_GF = Parameters(lambda_=1.0, windR=20, filter_name="GF",
                       filter_param1=1e-4)
PARAMS_GF_FLOAT = PARAMS_GF.replace(filter_name="GFfloat")
PARAMS_BF = Parameters(lambda_=20.0, windR=20, filter_name="BF",
                       filter_param1=10.0)

#: Unary cost assigned to invalid labels (``StereoEnergy.h:45``).
COST_FOR_INVALID = 1e6


@dataclasses.dataclass
class Options:
    """Run-level options (reference ``main.cpp:14-70``)."""

    mode: str = ""  # "MiddV2" or "MiddV3"
    output_dir: str = ""
    target_dir: str = ""
    iterations: int = 5
    pm_iterations: int = 2
    do_dual: bool = False
    ndisp: int = 0
    smooth_weight: Optional[float] = None  # resolved by mode preset
    mc_threshold: float = 0.5
    filter_radius: int = 20
    thread_num: int = -1  # accepted for CLI parity; no-op on TPU
    seed: int = 0
    volume: str = "acrt"  # V3 volume source: "acrt" file or "mccnn" on-device
    #: V3 on-device volume storage; "uint8" (default) = 256-level
    #: quantization over [0, 2*mc_threshold], -17% s/frame vs bf16 on the
    #: halfH bench with a tau/255 per-sample bound (-volPrecision).
    vol_precision: str = "uint8"
    #: V3 unary sampling backend (-unaryBackend): "auto" (XLA slab hoist) |
    #: "xla" | "dma" (per-region fused Pallas DMA kernel). "dma" only
    #: engages on the real TPU and falls back to XLA when its VMEM gate
    #: fails.
    unary_backend: str = "auto"
    warmup: int = 1  # precompile executables before the timed run (time.txt
                     # then measures pure optimization, TimeStamper semantics)
    #: N > 1 runs N - 1 extra solves (seed+1 .. seed+N-1) and fusion-moves
    #: their labelings into the primary solution before post-processing
    #: (-fuseSeeds; energy-best-of-N — beyond the reference, whose
    #: fusionMoveBK hook is never wired up). Serial on one chip; a mesh
    #: runs the extra seeds as a one-pair-per-chip batch.
    fuse_seeds: int = 0
    #: "" = jax default; "cpu"/"tpu" force the backend via jax.config
    #: (the env's axon TPU plugin ignores the JAX_PLATFORMS env var, so a
    #: config-level force is the only reliable CPU opt-out when the
    #: tunneled device is busy or wedged).
    platform: str = ""
    #: Live progress display (-show): the reference's cv::imshow windows
    #: (Evaluator.h:145-160) become constantly-overwritten live_D/live_E
    #: preview files under outputDir/debug (headless TPU hosts).
    show: bool = False
    #: -laneFriendly 1 rounds the V3 layer sizes down a few pixels where
    #: that makes the 3s x 3s move window fit the TPU's (8, 128) f32 VMEM
    #: tile (models.grid.lane_friendly_unit; e.g. halfH 43 -> 42 speeds
    #: the layer's GC sweep 1.22x on v5e). Default OFF: the exact
    #: reference sizing (``main.cpp:395-397``) is kept for parity runs.
    lane_friendly: bool = False

    def resolve_smooth_weight(self) -> float:
        """Mode presets (``main.cpp:37-40``): MiddV2 -> 1.0, MiddV3 -> 0.5,
        unless overridden on the CLI (override wins, as in the reference where
        the flag is read after the preset)."""
        if self.smooth_weight is not None:
            return self.smooth_weight
        if self.mode == "MiddV3":
            return 0.5
        return 1.0
