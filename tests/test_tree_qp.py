"""Solver parity: tree-Riccati + ADMM vs the oracle's dense assembly + IPM."""

import numpy as np
import pytest

from belief_planning_tpu.models.policies import highway_policy_set, quadruped_policy_set
from belief_planning_tpu.models.predictive import highway_model, quadruped_model
from belief_planning_tpu.oracle.qp import solve_qp
from belief_planning_tpu.oracle.reference_tree import OracleModelAdapter, OracleBranchController
from belief_planning_tpu.tree.topology import build_topology
from belief_planning_tpu.tree.engine import build_tree
from belief_planning_tpu.solvers.tree_qp import (
    ADMMConfig,
    admm_solve,
    assemble_stage_cost,
    build_stage_plan,
    tree_lqr_factor,
    tree_lqr_forward,
    tree_lqr_linear,
)
from belief_planning_tpu.utils.config import BranchConstants, QuadConstants, BranchMPCParams


def overtake_setup(N=4, NB=2):
    cons = BranchConstants()
    xt = np.array([0.5, 1.8, 15.0, 0.0])
    pset = highway_policy_set(cons, xt)
    model = highway_model(cons, pset, N=N, dt=0.1)
    Fx = np.array([[0., 1, 0, 0], [0., -1, 0, 0], [0., 0, 0, 1], [0., 0, 0, -1]])
    bx = np.array([4 * 3.6 - 1.25, -1.25, 0.25, 0.25])
    Fu = np.kron(np.eye(2), np.array([1., -1])).T
    bu = np.array([6.0, 6.0, 0.3, 0.3])
    params = BranchMPCParams(
        n=4, d=2, N=N, NB=NB,
        Q=np.diag([0., 3, 3, 10.]), R=np.diag([1., 100.]),
        Qslack=np.array([0., 300.]), Fx=Fx, bx=bx, Fu=Fu, bu=bu, xRef=xt,
    )
    return cons, pset, model, params


def quad_setup(N=5, NB=2):
    cons = QuadConstants()
    pset = quadruped_policy_set(v0=0.2)
    model = quadruped_model(cons, pset, N=N, dt=0.2)
    Fx = np.empty((0, 3))
    bx = np.empty((0,))
    Fu = np.kron(np.eye(3), np.array([1., -1])).T
    bu = np.array([0.2, 0.0, 0.1, 0.1, 0.5, 0.5])
    params = BranchMPCParams(
        n=3, d=3, N=N, NB=NB,
        Q=np.diag([1., 1., 1.]), R=np.diag([1., 100., 1.]), dR=np.array([0.9, 5, 1.]),
        Qslack=np.array([0., 300.]), Fx=Fx, bx=bx, Fu=Fu, bu=bu,
        xRef=np.array([5., 5., 0.]),
    )
    return cons, pset, model, params


def make_shared_tree(model, pset, params, x, z, u_lin=None, variant="prox"):
    adapter = OracleModelAdapter(model, pset.params)
    ctrl = OracleBranchController(params, adapter, variant)
    ctrl.inittree(x, z)
    topo = build_topology(params.N, params.NB, model.m, params.n, params.d)
    if u_lin is None:
        u_lin = np.zeros((topo.totalu, params.d))
    ts = build_tree(model, topo, x, z, u_lin, pset.params)
    return ctrl, topo, ts


def oracle_eq_solution(ctrl, x):
    """Oracle equality-constrained optimum (no inequality rows, no slacks)."""
    ctrl.slacks = False
    ctrl.buildCost()
    ctrl.buildEqConstr()
    P = np.triu(ctrl.H) + np.triu(ctrl.H, 1).T
    beq = ctrl.E @ x + ctrl.L
    sol = solve_qp(P, ctrl.q, G=ctrl.G, g=beq)
    nx = ctrl.totalx * ctrl.n
    nu = ctrl.totalu * ctrl.d
    return sol.z[:nx].reshape(-1, ctrl.n), sol.z[nx:nx + nu].reshape(-1, ctrl.d)


@pytest.mark.parametrize("variant", ["prox", "branch"])
def test_equality_lqr_parity_highway(variant):
    cons, pset, model, params = overtake_setup(N=4, NB=2)
    x = np.array([0.0, 1.8, 20.0, 0.0])
    z = np.array([6.0, 5.4, 19.0, 0.0])
    ctrl, topo, ts = make_shared_tree(model, pset, params, x, z, variant=variant)
    x_o, u_o = oracle_eq_solution(ctrl, x)

    plan = build_stage_plan(topo)
    old_u = np.zeros(params.d)
    cost = assemble_stage_cost(
        topo, ts, params.Q, params.R, params.Qf, params.dR, params.Qslack,
        params.xRef, old_u, variant=variant,
    )
    fac = tree_lqr_factor(plan, cost, ts)
    kff = tree_lqr_linear(plan, fac, cost.qx, cost.qu, cost.qterm)
    x_nodes, u = tree_lqr_forward(plan, fac, kff, x, old_u)
    assert np.allclose(np.asarray(u), u_o, atol=1e-7), (
        np.abs(np.asarray(u) - u_o).max()
    )
    assert np.allclose(np.asarray(x_nodes), x_o, atol=1e-6)


def test_equality_lqr_parity_quadruped_with_dR():
    # exercises the rate-coupling edges, the leaf-overwrite quirk, the dR
    # broadcast quirk, and a nonzero OldInput
    cons, pset, model, params = quad_setup(N=5, NB=2)
    x = np.array([0.0, 1.8, 0.0])
    z = np.array([2.5, 2.5, -np.pi / 2])
    ctrl, topo, ts = make_shared_tree(model, pset, params, x, z, variant="prox")
    old_u = np.array([0.1, -0.02, 0.05])
    ctrl.OldInput = old_u.copy()
    x_o, u_o = oracle_eq_solution(ctrl, x)

    plan = build_stage_plan(topo)
    cost = assemble_stage_cost(
        topo, ts, params.Q, params.R, params.Qf, params.dR, params.Qslack,
        params.xRef, old_u, variant="prox",
    )
    fac = tree_lqr_factor(plan, cost, ts)
    kff = tree_lqr_linear(plan, fac, cost.qx, cost.qu, cost.qterm)
    x_nodes, u = tree_lqr_forward(plan, fac, kff, x, old_u)
    assert np.allclose(np.asarray(u), u_o, atol=1e-7), (
        np.abs(np.asarray(u) - u_o).max()
    )
    assert np.allclose(np.asarray(x_nodes), x_o, atol=1e-6)


def oracle_full_solution(ctrl, x):
    ctrl.buildIneqConstr()
    ctrl.buildCost()
    ctrl.buildEqConstr()
    P = np.triu(ctrl.H) + np.triu(ctrl.H, 1).T
    beq = ctrl.E @ x + ctrl.L
    sol = solve_qp(P, ctrl.q, A=ctrl.F, b=ctrl.b, G=ctrl.G, g=beq)
    assert sol.status == "optimal"
    nx = ctrl.totalx * ctrl.n
    nu = ctrl.totalu * ctrl.d
    return sol.z[:nx].reshape(-1, ctrl.n), sol.z[nx:nx + nu].reshape(-1, ctrl.d)


@pytest.mark.parametrize("NB", [1, 2])
def test_admm_parity_highway(NB):
    cons, pset, model, params = overtake_setup(N=4, NB=NB)
    # obstacle close ahead → collision constraints genuinely active
    x = np.array([0.0, 1.8, 20.0, 0.0])
    z = np.array([9.0, 1.8, 17.0, 0.0])
    ctrl, topo, ts = make_shared_tree(model, pset, params, x, z, variant="prox")
    x_o, u_o = oracle_full_solution(ctrl, x)

    plan = build_stage_plan(topo)
    old_u = np.zeros(params.d)
    cost = assemble_stage_cost(
        topo, ts, params.Q, params.R, params.Qf, params.dR, params.Qslack,
        params.xRef, old_u, variant="prox",
    )
    cfg = ADMMConfig(iters=400)
    x_nodes, u, s, st, info = admm_solve(
        plan, cost, ts, params.Fx, params.bx, params.Fu, params.bu,
        x, old_u, cfg,
    )
    err_u = np.abs(np.asarray(u) - u_o).max()
    err_x = np.abs(np.asarray(x_nodes) - x_o).max()
    assert err_u < 2e-4, (err_u, err_x)
    assert err_x < 2e-3, (err_u, err_x)
    # first input (the applied control) should be tighter
    assert np.abs(np.asarray(u)[0] - u_o[0]).max() < 1e-4
