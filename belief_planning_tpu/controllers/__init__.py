from belief_planning_tpu.controllers.branch_mpc import (
    BranchMPC,
    BranchMPCProx,
    MPCCarry,
    SolveResult,
    make_branch_mpc_step,
)

__all__ = [
    "BranchMPC",
    "BranchMPCProx",
    "MPCCarry",
    "SolveResult",
    "make_branch_mpc_step",
]
