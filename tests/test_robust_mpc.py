"""robustMPC benchmark controller: behavior and constraint-satisfaction tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from belief_planning_tpu.controllers.robust_mpc import RobustMPC
from belief_planning_tpu.models.policies import highway_policy_set
from belief_planning_tpu.models.predictive import highway_model
from belief_planning_tpu.presets import init_branch_mpc
from belief_planning_tpu.solvers.tree_qp import ADMMConfig
from belief_planning_tpu.utils.config import BranchConstants


def make_robust(N=4, NB=2):
    cons = BranchConstants()
    xt = np.array([0.5, 1.8, 15.0, 0.0])
    pset = highway_policy_set(cons, xt)
    model = highway_model(cons, pset, N=N, dt=0.1)
    params = init_branch_mpc(4, 2, N, NB, xt, am=6.0, rm=0.3, N_lane=4, W=cons.W)
    mpc = RobustMPC(params, model, pset.params,
                    admm=ADMMConfig(iters=300, polish_iters=30),
                    dtype=jnp.float64)
    return cons, model, params, mpc


def test_robust_sizes_match_reference():
    # Nx = N·NB+2, Nu = N·NB+1 (MPC_branch.py:1301-1302)
    _, _, params, mpc = make_robust(N=4, NB=2)
    assert mpc.topo.totalx == 4 * 2 + 2
    assert mpc.topo.totalu == 4 * 2 + 1


def test_robust_avoids_all_branches():
    cons, model, params, mpc = make_robust(N=4, NB=2)
    x = np.array([0.0, 1.8, 20.0, 0.0])
    z = np.array([10.0, 1.8, 16.0, 0.0])   # slower car ahead, same lane
    u0 = mpc.solve(x, z)
    assert mpc.feasible == 1
    res = mpc.last
    xP = np.asarray(res.xPred)
    zP = np.asarray(res.zPred)
    valid = np.asarray(res.zvalid)
    # linearized collision rows hold up to slack: h_raw at the *linearization*
    # trajectory is the constraint's anchor; check the planned trajectory keeps
    # the (linearized) margin non-negative up to slack
    s = np.asarray(res.slack)
    from belief_planning_tpu.models.safety import veh_col
    viol = 0.0
    for t in range(zP.shape[0]):
        for j in range(zP.shape[1]):
            if valid[t, j]:
                h = float(veh_col(xP[t], zP[t, j], (cons.L + 1, cons.W + 0.2)))
                viol = min(viol, h + s[t].max() + 0.3)
    assert viol > -0.5   # planned trajectory respects margins (SQP-linearized)
    # inputs in bounds; braking response expected
    assert np.abs(np.asarray(res.uPred)[:, 0]).max() <= 6.0 + 1e-6
    assert u0[0] < 0.5   # not accelerating into the slower car


def test_robust_closed_loop_oracle_parity():
    """Closed-loop applied inputs must track the dense NumPy transcription of
    the reference robustMPC (MPC_branch.py:1275-1595).

    The obstacle is offset laterally (y=2.1): a perfectly centered follow
    scenario has TWO exactly-mirrored global optima (swerve left/right with
    identical cost — measured u = [-3.41600784, ±0.02273243]), so trajectory
    parity there is ill-posed. With the symmetry broken the optimum is unique
    and both solvers agree to ~5e-8. The scenario also stays off the
    road-boundary box so the documented terminal-Fx-rows deviation cannot
    bind."""
    from belief_planning_tpu.oracle.reference_robust import OracleRobustController
    from belief_planning_tpu.oracle.reference_tree import OracleModelAdapter
    from belief_planning_tpu.solvers.tree_qp_ipm import QPIPMConfig

    cons = BranchConstants()
    xt = np.array([0.5, 1.8, 15.0, 0.0])
    pset = highway_policy_set(cons, xt)
    model = highway_model(cons, pset, N=4, dt=0.1)
    params = init_branch_mpc(4, 2, 4, 2, xt, am=6.0, rm=0.3, N_lane=4,
                             W=cons.W)
    adapter = OracleModelAdapter(model, pset.params)
    oracle = OracleRobustController(params, adapter)
    # warm-started solves converge slower than cold ones here (the interior
    # restart discards the near-boundary warm point): 100 iterations reaches
    # ~2e-8 vs the oracle, 40 leaves ~4e-5 which compounds through the loop
    mpc = RobustMPC(params, model, pset.params, dtype=jnp.float64,
                    ipm=QPIPMConfig(iters=100))

    x_o = np.array([0.0, 1.8, 20.0, 0.0])
    z_o = np.array([10.0, 2.1, 16.0, 0.0])
    x_j, z_j = x_o.copy(), z_o.copy()
    xRef = np.array([0.0, 1.8, 18.0, 0.0])
    dt = model.dt

    def f(s, u):
        return s + np.array([s[2] * np.cos(s[3]), s[2] * np.sin(s[3]),
                             u[0], u[1]]) * dt

    errs = []
    for t in range(5):
        u_o = oracle.solve(x_o, z_o, xRef)
        u_j = np.asarray(mpc.solve(x_j, z_j, xRef))
        errs.append(np.abs(u_o - u_j).max())
        x_o = f(x_o, u_o)
        z_o = f(z_o, np.array([0.0, -cons.Kpsi * z_o[3]]))
        x_j = f(x_j, u_j)
        z_j = f(z_j, np.array([0.0, -cons.Kpsi * z_j[3]]))
    assert max(errs) < 1e-5, errs
    assert oracle.feasible == 1 and mpc.feasible == 1


def test_robust_receding_horizon_runs():
    cons, model, params, mpc = make_robust(N=3, NB=1)
    x = np.array([0.0, 1.8, 20.0, 0.0])
    z = np.array([12.0, 5.4, 18.0, 0.0])
    for t in range(4):
        u = mpc.solve(x, z)
        assert np.all(np.isfinite(u))
        x = x + np.array([x[2] * np.cos(x[3]), x[2] * np.sin(x[3]), u[0], u[1]]) * 0.1
        z = z + np.array([z[2], 0.0, 0.0, 0.0]) * 0.1
    assert mpc.feasible == 1
