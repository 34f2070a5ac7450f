"""Solver stack: engine, energies, proposals, grid, post-processing."""
from .engine import (COARSE_PROPOSERS, LAYER0_PROPOSERS,  # noqa: F401
                     LocalExpansionSolver)
