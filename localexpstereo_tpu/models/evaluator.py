"""Evaluation / observability hook (reference ``Evaluator.h``).

Reproduces the injected-observer contract: after every sweep it audits the
energy (smoothness recomputed from scratch + stored unary sum), computes
bad-pixel rates against ground truth at the configured threshold, appends a
TSV row ``Time  Eng  Data  Smooth  all  nonocc`` to ``log_output.txt``
(``Evaluator.h:60-65,168-172``), optionally saves disparity / normal / error
debug images, and keeps the pausable optimization timer excluded from its own
run time (``Evaluator.h:113-116,185-186``).
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np

from ..ops import plane as plane_ops
from ..utils.timing import TimeStamper


class Evaluator:
    def __init__(self, disp_gt: Optional[np.ndarray],
                 nonocc_mask: Optional[np.ndarray],
                 disparity_factor: float, header: str = "result",
                 save_dir: str = "./", show: bool = False, save: bool = True,
                 print_progress: bool = True):
        self.timer = TimeStamper()
        self.disparity_factor = disparity_factor
        self.header = header
        self.save_dir = save_dir
        self.save_progress = save
        #: Live progress display (``Evaluator.h:145-160``'s ``cv::imshow``
        #: windows). This build runs headless (TPU hosts have no display
        #: server), so the "windows" are two constantly-overwritten files —
        #: ``live_D.png`` / ``live_E.png`` in ``save_dir`` — which any
        #: auto-refreshing image viewer (``feh -R``, VS Code, a browser)
        #: turns back into live windows.
        self.show = show
        self.print_progress = print_progress
        self.error_threshold = 0.5
        self.qprecision = 1.0 / disparity_factor if disparity_factor else -1.0
        self.last_accuracy = float("nan")
        self._fp = None

        self.disp_gt = (np.asarray(disp_gt, np.float32)
                        if disp_gt is not None else None)
        if self.disp_gt is not None:
            self.valid_mask = (self.disp_gt > 0) & np.isfinite(self.disp_gt)
            self.valid_pixels = int(self.valid_mask.sum())
            self.nonocc = (np.asarray(nonocc_mask, bool)
                           if nonocc_mask is not None
                           else np.ones_like(self.valid_mask))
            self.nonocc_pixels = int(self.nonocc.sum())
        else:
            self.valid_mask = None

        if save:
            os.makedirs(save_dir, exist_ok=True)
            self._fp = open(os.path.join(save_dir, "log_output.txt"), "w")
            self._fp.write("Time\tEng\tData\tSmooth\tall\tnonocc\n")
            self._fp.flush()

    def set_precision(self, precision: float):
        """V2 GT quantization precision; <= 0 disables (``main.cpp:292,381``)."""
        self.qprecision = precision

    def set_error_threshold(self, t: float):
        self.error_threshold = t

    # ------------------------------------------------------------------ --

    def evaluate(self, solver, labeling_m, cost_m, mode: int, index: int):
        """cf. ``Evaluator::evaluate`` (``Evaluator.h:113-187``)."""
        was_ticking = self.timer.is_ticking()
        # Exclude evaluation (and pending device work) from optimization time.
        jax.block_until_ready(cost_m)
        self.stop()

        from . import engine as engine_mod
        cfg = solver.cfg
        total, dc, sc = engine_mod.energy_audit(solver.data, cfg, labeling_m,
                                                cost_m, mode)
        total, dc, sc = float(total), float(dc), float(sc)

        p = cfg.pad
        lab = np.asarray(labeling_m[p:p + cfg.height, p:p + cfg.width])
        disp = np.asarray(plane_ops.disparity_map(lab))
        if self.qprecision > 0:
            # Reference quantize() uses convertTo(CV_32S) = cvRound =
            # round-half-to-even (Evaluator.h:106-111); np.rint matches.
            disp = np.rint(disp / self.qprecision) * self.qprecision

        all_pct = nonocc_pct = float("nan")
        if self.valid_mask is not None and self.valid_pixels > 0:
            err_ok = np.abs(disp - self.disp_gt) <= self.error_threshold
            all_pct = 100.0 * (1.0 - (err_ok & self.valid_mask).sum()
                               / max(self.valid_pixels, 1))
            nonocc_pct = 100.0 * (1.0 - (err_ok & self.nonocc).sum()
                                  / max(self.nonocc_pixels, 1))
        if mode == 0:
            self.last_accuracy = all_pct

        if self.show and mode == 0:
            self._show_live(disp)
        if self.save_progress:
            self._save_images(lab, disp, mode, index)
            if self._fp is not None and mode == 0:
                self._fp.write(f"{self.get_current_time():f}\t{total:f}\t"
                               f"{dc:f}\t{sc:f}\t{all_pct:f}\t{nonocc_pct:f}\n")
                self._fp.flush()

        if self.print_progress and mode == 0:
            print(f"{index:2d} {self.get_current_time():5.1f}\t{total:.0f}\t"
                  f"{dc:.0f}\t{sc:.0f}\t{all_pct:4.2f}\t{nonocc_pct:4.2f}",
                  flush=True)

        if was_ticking:
            self.start()

    def _show_live(self, disp):
        """Headless ``cv::imshow``: overwrite the live preview files
        (atomic rename so a watching viewer never reads a torn frame)."""
        try:
            import cv2
        except ImportError:
            return
        os.makedirs(self.save_dir, exist_ok=True)
        vis = np.clip(disp * self.disparity_factor, 0, 255).astype(np.uint8)
        frames = {"live_D.png": vis}
        if self.valid_mask is not None:
            err_ok = np.abs(disp - self.disp_gt) <= self.error_threshold
            frames["live_E.png"] = np.where(
                err_ok | (~self.valid_mask), 255, 0).astype(np.uint8)
        for name, img in frames.items():
            tmp = os.path.join(self.save_dir, "." + name + ".tmp.png")
            cv2.imwrite(tmp, img)
            os.replace(tmp, os.path.join(self.save_dir, name))

    def _save_images(self, lab, disp, mode, index):
        try:
            import cv2
        except ImportError:
            return
        vis = np.clip(disp * self.disparity_factor, 0, 255).astype(np.uint8)
        cv2.imwrite(os.path.join(
            self.save_dir, f"{self.header}{mode}D{index:02d}.png"), vis)
        nmap = np.asarray(plane_ops.normal_map(np.asarray(lab)))
        cv2.imwrite(os.path.join(
            self.save_dir, f"{self.header}{mode}N{index:02d}.png"),
            np.clip(nmap * 255, 0, 255).astype(np.uint8))
        if self.valid_mask is not None:
            err_ok = np.abs(disp - self.disp_gt) <= self.error_threshold
            err_vis = np.where(err_ok | (~self.valid_mask), 255, 0)
            occ = self.valid_mask & (~self.nonocc)
            err_vis = np.where(occ & (err_vis == 0), 200, err_vis)
            cv2.imwrite(os.path.join(
                self.save_dir, f"{self.header}{mode}E{index:02d}.png"),
                err_vis.astype(np.uint8))

    def save_consistency(self, solver, state, index: int):
        """Red/blue consistency visualizations (``viewConsistencyCheck``,
        ``PMStereoBase.h:87-108``; saved per iteration at
        ``FastGCStereo.h:160-168``): blue channel marks mismatches (255),
        red marks out-of-view reprojections (128)."""
        if not self.save_progress or 0 not in state or 1 not in state:
            return
        was_ticking = self.timer.is_ticking()
        self.stop()
        try:
            import cv2
            import jax.numpy as jnp
            from ..ops import plane as plane_ops
            from . import postprocess

            cfg = solver.cfg
            p = cfg.pad
            disps = []
            for mode in (0, 1):
                lab = state[mode][0][p:p + cfg.height, p:p + cfg.width]
                disps.append(plane_ops.disparity_map(jnp.asarray(lab)))
            fail0, fail1 = postprocess.consistency_check(disps[0], disps[1],
                                                         1.5)
            for mode, (disp, fail) in enumerate(zip(disps, (fail0, fail1))):
                vis8 = np.clip(np.asarray(disp) * self.disparity_factor, 0,
                               255).astype(np.uint8)
                img = np.stack([vis8] * 3, -1)
                f = np.asarray(fail)
                img[f == 128, 0] = 255
                img[f == 255, 2] = 255
                cv2.imwrite(os.path.join(
                    self.save_dir,
                    f"{self.header}{mode}C{index:02d}.png"), img)
        except ImportError:
            pass
        finally:
            if was_ticking:
                self.start()

    # ------------------------------------------------------------- timer --

    def start(self):
        self.timer.start()

    def stop(self):
        self.timer.stop()

    def get_current_time(self) -> float:
        return self.timer.get_current_time()

    def close(self):
        if self._fp is not None:
            self._fp.close()
            self._fp = None
