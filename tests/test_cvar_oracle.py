"""Oracle SOCP solver sanity + reference-CVaR oracle self-consistency."""

import numpy as np
import pytest

from belief_planning_tpu.oracle.socp import solve_socp
from belief_planning_tpu.oracle.qp import solve_qp
from belief_planning_tpu.oracle.reference_cvar import OracleCVaRController
from belief_planning_tpu.oracle.reference_tree import OracleModelAdapter
from belief_planning_tpu.models.policies import highway_policy_set
from belief_planning_tpu.models.predictive import highway_model

from tests.test_tree_qp import overtake_setup


def test_socp_solver_simple_cone():
    # min x + y  s.t. ‖(u1,u2)‖ ≤ t, t = 2, u = (x−1, y−1)
    # → minimize x+y on a disc of radius 2 centered (1,1): optimum (1,1)−2/√2
    # vars v = (x, y). cone rows: s = h − Fv ∈ SOC with s0 = 2, s1 = x−1, s2 = y−1
    q = np.array([1.0, 1.0])
    F = np.array([
        [0.0, 0.0],
        [-1.0, 0.0],
        [0.0, -1.0],
    ])
    b = np.array([2.0, -1.0, -1.0])
    dims = {"l": 0, "q": [3]}
    sol = solve_socp(q, F, b, dims, tol=1e-8)
    assert sol.status == "optimal"
    expect = 1.0 - 2.0 / np.sqrt(2.0)
    assert np.allclose(sol.v, [expect, expect], atol=1e-6)


def test_socp_plateau_exit_stops_stalled_runs():
    """A program the ADMM cannot drive to tol (here: an INFEASIBLE LP, whose
    residual plateaus at the infeasibility measure) must exit via the plateau
    detector in a small fraction of the iteration budget with
    status='stalled', instead of burning max_iter (the ~8 min/step cost that
    blocked the 100-step overtake gate, evidence/gate_overtake_2026-08-22.log).
    A solvable program with the same settings must still reach 'optimal'."""
    # x >= 1 and -x >= 0 — empty feasible set; ADMM residual plateaus.
    q = np.array([1.0, 0.0])
    F = np.array([[-1.0, 0.0], [1.0, 0.0]])
    b = np.array([-1.0, 0.0])
    dims = {"l": 2, "q": []}
    sol = solve_socp(q, F, b, dims, tol=1e-9, max_iter=120000)
    assert sol.status == "stalled"
    assert sol.iterations < 30000, sol.iterations
    # plateau detection must not fire on a convergent run (tol within reach
    # of the ADMM's floating-point floor; at tol=1e-9 the same program stalls
    # at dr≈4.7e-9 and the detector correctly fires — same final iterate the
    # old code burned the full max_iter to reach, graded by residuals either
    # way)
    sol2 = solve_socp(q, np.vstack([np.eye(2), -np.eye(2)]),
                      np.array([2.0, 2.0, 2.0, 2.0]), {"l": 4, "q": []},
                      tol=1e-8)
    assert sol2.status == "optimal"


def test_socp_solver_matches_qp_on_lp_part():
    # random strictly-feasible LP solved by both oracles (SOCP with l-rows only
    # and a quadratic epigraph-free objective is an LP)
    rng = np.random.default_rng(1)
    nv, ml, me = 8, 12, 3
    A = rng.normal(size=(ml, nv))
    v0 = rng.normal(size=nv)
    b = A @ v0 + rng.uniform(0.5, 1.0, ml)
    G = rng.normal(size=(me, nv))
    g = G @ v0
    q = rng.normal(size=nv)
    # bound the LP with a box (as linear rows) to keep it finite
    A2 = np.vstack([A, np.eye(nv), -np.eye(nv)])
    b2 = np.concatenate([b, v0 + 5.0, -(v0 - 5.0)])
    sol = solve_socp(q, A2, b2, {"l": A2.shape[0], "q": []}, G=G, g=g, tol=1e-8)
    assert sol.status == "optimal"
    # compare against the QP oracle with a tiny quadratic regularizer
    eps = 1e-8
    qp = solve_qp(eps * np.eye(nv), q, A=A2, b=b2, G=G, g=g, tol=1e-8)
    assert np.allclose(sol.v, qp.z, atol=1e-4)


@pytest.mark.parametrize("quirks", [True, False])
def test_cvar_oracle_solves_and_is_consistent(quirks):
    cons, pset, model, params = overtake_setup(N=3, NB=1)
    adapter = OracleModelAdapter(model, pset.params)
    ctrl = OracleCVaRController(params, adapter, ralpha=0.9, replicate_quirks=quirks)
    x = np.array([0.0, 1.8, 20.0, 0.0])
    z = np.array([9.0, 1.8, 17.0, 0.0])
    u0 = ctrl.solve(x, z, xRef=params.xRef, max_iter=60000, tol=1e-8)
    assert ctrl.feasible == 1
    sol = ctrl.solution
    v = sol.v
    n, d, m = params.n, params.d, model.m
    # dynamics equality holds
    res_eq = ctrl.G @ v - (ctrl.E @ x + ctrl.L)
    assert np.abs(res_eq).max() < 1e-5
    # linear cone rows hold: F v ≤ b on the 'l' block (up to slack, already in rows)
    lin = (ctrl.F @ v - ctrl.b)[: ctrl.dims["l"]]
    assert lin.max() < 1e-5
    # SOC rows: s = b − Fv cone-feasible
    s = ctrl.b - ctrl.F @ v
    off = ctrl.dims["l"]
    for qd in ctrl.dims["q"]:
        blk = s[off:off + qd]
        assert blk[0] >= np.linalg.norm(blk[1:]) - 1e-5
        off += qd
    # objective value J ≥ 0 and first input within bounds
    assert v[-1] > 0
    assert abs(u0[0]) <= 6.0 + 1e-6 and abs(u0[1]) <= 0.3 + 1e-6
    # warm second solve runs
    u1 = ctrl.solve(x + 0.1, z + 0.1, xRef=params.xRef, max_iter=60000, tol=1e-8)
    assert ctrl.feasible == 1
