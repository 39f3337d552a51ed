"""belief_planning_tpu — TPU-native branch-MPC / belief-planning engine.

A from-scratch JAX/XLA implementation of scenario-tree stochastic MPC with the
capability surface of the reference `Gavinli-lgf/belief-planning` (see SURVEY.md):
backup-policy scenario trees, probability-weighted trajectory-tree QPs (plain /
proximal / robust variants), nested-CVaR SOCPs, HMM belief filtering, and the
highway / merge / quadruped closed-loop environments — batched and jit-compiled
for TPU, scaling over device meshes.
"""

__version__ = "0.1.0"

from belief_planning_tpu.utils.config import (
    BranchConstants,
    QuadConstants,
    BranchMPCParams,
    HMMConstants,
    MPCParams,
)

__all__ = [
    "BranchConstants",
    "QuadConstants",
    "BranchMPCParams",
    "HMMConstants",
    "MPCParams",
]
