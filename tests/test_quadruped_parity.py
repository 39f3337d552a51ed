"""Quadruped closed-loop parity: exercises the dR rate-coupling path end-to-end
(BranchMPCProx with dR=[0.9,5,1] incl. all reference quirks) vs the oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from belief_planning_tpu.controllers.branch_mpc import BranchMPCProx
from belief_planning_tpu.oracle.reference_tree import OracleModelAdapter, OracleBranchController
from belief_planning_tpu.solvers.tree_qp import ADMMConfig

from tests.test_tree_qp import quad_setup


def test_quadruped_closed_loop_parity():
    cons, pset, model, params = quad_setup(N=5, NB=2)
    adapter = OracleModelAdapter(model, pset.params)
    oracle = OracleBranchController(params, adapter, "prox")
    mpc = BranchMPCProx(params, model, pset.params,
                        admm=ADMMConfig(iters=400, polish_iters=40),
                        dtype=jnp.float64)
    x = np.array([0.0, 1.8, 0.0])
    z = np.array([2.5, 2.5, -np.pi / 2])
    xRef = np.array([3.0, 1.0, 0.3])
    dt = model.dt

    def f(s, u):
        c, sn = np.cos(s[2]), np.sin(s[2])
        return s + np.array([u[0] * c - u[1] * sn, u[0] * sn + u[1] * c, u[2]]) * dt

    for t in range(5):
        u_o = oracle.solve(x, z, xRef)
        u_j = mpc.solve(x, z, xRef)
        err = np.abs(np.asarray(u_j) - u_o).max()
        assert err < 1e-3, (t, err)
        x = f(x, u_o)
        z = f(z, np.array([0.2, 0.0, 0.0]))   # obstacle walks forward
