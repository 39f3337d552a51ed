from belief_planning_tpu.controllers.branch_mpc import (
    BranchMPC,
    BranchMPCProx,
    MPCCarry,
    SolveResult,
    make_branch_mpc_step,
)
from belief_planning_tpu.controllers.cvar_mpc import BranchMPCCVaR, make_cvar_mpc_step
from belief_planning_tpu.controllers.robust_mpc import RobustMPC, make_robust_mpc_step
from belief_planning_tpu.controllers.hmm_mpc import HMMMPC, make_hmm_mpc_step

__all__ = [
    "BranchMPC",
    "BranchMPCProx",
    "BranchMPCCVaR",
    "RobustMPC",
    "HMMMPC",
    "MPCCarry",
    "SolveResult",
    "make_branch_mpc_step",
    "make_cvar_mpc_step",
    "make_robust_mpc_step",
    "make_hmm_mpc_step",
]
