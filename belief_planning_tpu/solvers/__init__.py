from belief_planning_tpu.solvers.tree_qp import (
    StagePlan,
    StageCost,
    ADMMConfig,
    build_stage_plan,
    assemble_stage_cost,
    tree_lqr_factor,
    tree_lqr_linear,
    tree_lqr_forward,
    admm_solve,
)
from belief_planning_tpu.solvers.cvar import CVaRConfig, CVaRPlan, build_cvar_plan, cvar_solve
from belief_planning_tpu.solvers.cvar_ipm import CVaRIPMConfig, cvar_ipm_solve

__all__ = [
    "StagePlan",
    "StageCost",
    "ADMMConfig",
    "build_stage_plan",
    "assemble_stage_cost",
    "tree_lqr_factor",
    "tree_lqr_linear",
    "tree_lqr_forward",
    "admm_solve",
    "CVaRConfig",
    "CVaRPlan",
    "build_cvar_plan",
    "cvar_solve",
    "CVaRIPMConfig",
    "cvar_ipm_solve",
]
