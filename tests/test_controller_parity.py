"""Closed-loop receding-horizon parity: JAX controller vs NumPy oracle.

This is the BASELINE.md gate: the applied input sequence over a closed-loop
episode must match the (reference-semantics) oracle within 1e-3.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from belief_planning_tpu.controllers.branch_mpc import BranchMPCProx
from belief_planning_tpu.models.policies import highway_policy_set
from belief_planning_tpu.models.predictive import highway_model
from belief_planning_tpu.oracle.reference_tree import OracleModelAdapter, OracleBranchController
from belief_planning_tpu.solvers.tree_qp import ADMMConfig
from belief_planning_tpu.utils.config import BranchConstants, BranchMPCParams

from tests.test_tree_qp import overtake_setup


def simulate_closed_loop(n_steps=8, N=4, NB=2, **mpc_kwargs):
    cons, pset, model, params = overtake_setup(N=N, NB=NB)
    dt = model.dt

    adapter = OracleModelAdapter(model, pset.params)
    oracle = OracleBranchController(params, adapter, "prox")

    mpc = BranchMPCProx(
        params, model, pset.params,
        admm=ADMMConfig(iters=400),
        dtype=jnp.float64,
        **mpc_kwargs,
    )

    def f(x, u):
        return np.array([x[2] * np.cos(x[3]), x[2] * np.sin(x[3]), u[0], u[1]])

    def obs_u(z):
        # obstacle holds the maintain policy
        return np.array([0.0, -cons.Kpsi * z[3]])

    x_o = np.array([0.0, 1.8, 20.0, 0.0])
    z_o = np.array([9.0, 1.8, 17.0, 0.0])
    x_j = x_o.copy()
    z_j = z_o.copy()
    xRef = np.array([0.0, 1.8, 18.0, 0.0])

    u_hist_o, u_hist_j = [], []
    for t in range(n_steps):
        u_oracle = oracle.solve(x_o, z_o, xRef)
        u_jax = mpc.solve(x_j, z_j, xRef)
        u_hist_o.append(u_oracle.copy())
        u_hist_j.append(np.asarray(u_jax).copy())
        # step both worlds with their own applied inputs
        x_o = x_o + f(x_o, u_oracle) * dt
        z_o = z_o + f(z_o, obs_u(z_o)) * dt
        x_j = x_j + f(x_j, np.asarray(u_jax)) * dt
        z_j = z_j + f(z_j, obs_u(z_j)) * dt
    return np.array(u_hist_o), np.array(u_hist_j), oracle, mpc


def test_closed_loop_input_parity():
    u_o, u_j, oracle, mpc = simulate_closed_loop(n_steps=8)
    err = np.abs(u_o - u_j).max()
    assert err < 1e-3, f"closed-loop input deviation {err}"
    # inputs respect bounds
    assert np.abs(u_j[:, 0]).max() <= 6.0 + 1e-6
    assert np.abs(u_j[:, 1]).max() <= 0.3 + 1e-6


def test_closed_loop_input_parity_bench_config():
    """Gate the bench.py solver setting (IPM, 8 iterations + 2 Gondzio
    correctors, near-feasible start sl_min=0.1) against the BASELINE.md 1e-3
    closed-loop gate, cold first solve included. Measured ~5.0e-4 on the full
    overtake config (N=8, NB=2, 10 steps); the iters × gondzio sweep is in
    scripts/qp_iter_study.py (plain Mehrotra: 12 iters → 2.6e-4, 10 → 7.4e-4,
    8 fails at 6.8e-3). The margin assert here is tighter than the gate to
    catch convergence regressions early."""
    from belief_planning_tpu.solvers.tree_qp_ipm import QPIPMConfig

    u_o, u_j, _, _ = simulate_closed_loop(
        n_steps=8, ipm=QPIPMConfig(iters=8, gondzio=2))
    err = np.abs(u_o - u_j).max()
    assert err < 8e-4, f"closed-loop input deviation at IPM-8/g2: {err}"

    # the previous default (plain IPM-12) keeps its tighter pin
    u_o, u_j, _, _ = simulate_closed_loop(n_steps=8, ipm=QPIPMConfig(iters=12))
    err = np.abs(u_o - u_j).max()
    assert err < 5e-4, f"closed-loop input deviation at IPM-12: {err}"


def test_first_solve_matches_oracle_tightly():
    cons, pset, model, params = overtake_setup(N=4, NB=2)
    adapter = OracleModelAdapter(model, pset.params)
    oracle = OracleBranchController(params, adapter, "prox")
    mpc = BranchMPCProx(
        params, model, pset.params,
        admm=ADMMConfig(iters=400),
        dtype=jnp.float64,
    )
    x = np.array([0.0, 1.8, 20.0, 0.0])
    z = np.array([9.0, 1.8, 17.0, 0.0])
    u_o = oracle.solve(x, z)
    u_j = mpc.solve(x, z)
    assert np.abs(u_o - np.asarray(u_j)).max() < 2e-4
    assert mpc.feasible == 1
    # BT2array structure parity
    xtraj, ztraj, utraj, ws = mpc.BT2array()
    assert len(xtraj) == mpc.topo.n_branches - 1
    assert xtraj[0].shape == (params.N + 1, params.n)
    assert np.isclose(sum(ws[:3]), 1.0, atol=1e-6)
