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
