from belief_planning_tpu.solvers.tree_qp import (
    StagePlan,
    build_stage_plan,
    assemble_stage_cost,
    tree_lqr_factor,
    tree_lqr_linear,
    tree_lqr_forward,
    admm_solve,
    ADMMConfig,
)

__all__ = [
    "StagePlan",
    "build_stage_plan",
    "assemble_stage_cost",
    "tree_lqr_factor",
    "tree_lqr_linear",
    "tree_lqr_forward",
    "admm_solve",
    "ADMMConfig",
]
