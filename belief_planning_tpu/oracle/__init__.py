"""NumPy oracle of the reference semantics — parity fixture only.

This subpackage is NOT part of the TPU execution path. It re-implements the
reference's tree construction and dense QP/SOCP assembly faithfully (including
observed quirks) and solves the resulting programs with a dense interior-point
method to optimality, standing in for OSQP(+polish)/ECOS which are not available
in this environment. Tests compare the JAX engine against it at the BASELINE.md
1e-3 gate (and much tighter at intermediate stages).
"""

from belief_planning_tpu.oracle.qp import solve_qp, QPSolution
from belief_planning_tpu.oracle.reference_tree import (
    OracleModelAdapter,
    OracleBranchController,
)

__all__ = [
    "solve_qp",
    "QPSolution",
    "OracleModelAdapter",
    "OracleBranchController",
]
