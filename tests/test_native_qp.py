"""First-party native (C++) QP solver vs the NumPy IPM oracle."""

import numpy as np
import pytest

from belief_planning_tpu.oracle.native_qp import available, solve_qp_native
from belief_planning_tpu.oracle.qp import solve_qp

pytestmark = pytest.mark.skipif(not available(), reason="g++ unavailable")


def test_native_matches_ipm_on_random_qps():
    rng = np.random.default_rng(0)
    for trial in range(3):
        n, mi, me = 12, 18, 4
        W = rng.normal(size=(n, n))
        P = W @ W.T + 0.5 * np.eye(n)
        q = rng.normal(size=n)
        A = rng.normal(size=(mi, n))
        x0 = rng.normal(size=n)
        b = A @ x0 + rng.uniform(0.1, 1.0, mi)
        G = rng.normal(size=(me, n))
        g = G @ x0
        ipm = solve_qp(P, q, A=A, b=b, G=G, g=g)
        x, y, iters, res, ok = solve_qp_native(P, q, A=A, b=b, G=G, g=g,
                                               eps=1e-10)
        assert ok, (iters, res)
        assert np.allclose(x, ipm.z, atol=1e-6), np.abs(x - ipm.z).max()


def test_native_on_oracle_mpc_matrices():
    """Cross-check the two oracle backends on a real tree-QP instance."""
    import jax
    from tests.test_tree_qp import overtake_setup, make_shared_tree

    cons, pset, model, params = overtake_setup(N=3, NB=1)
    x = np.array([0.0, 1.8, 20.0, 0.0])
    z = np.array([9.0, 1.8, 17.0, 0.0])
    ctrl, topo, ts = make_shared_tree(model, pset, params, x, z, variant="prox")
    ctrl.buildIneqConstr()
    ctrl.buildCost()
    ctrl.buildEqConstr()
    P = np.triu(ctrl.H) + np.triu(ctrl.H, 1).T
    beq = ctrl.E @ x + ctrl.L
    ipm = solve_qp(P, ctrl.q, A=ctrl.F, b=ctrl.b, G=ctrl.G, g=beq)
    xN, yN, iters, res, ok = solve_qp_native(P, ctrl.q, A=ctrl.F, b=ctrl.b,
                                             G=ctrl.G, g=beq, eps=1e-9,
                                             max_iter=60000)
    nx = ctrl.totalx * ctrl.n
    nu = ctrl.totalu * ctrl.d
    assert np.allclose(xN[:nx + nu], ipm.z[:nx + nu], atol=2e-3), (
        np.abs(xN[:nx + nu] - ipm.z[:nx + nu]).max(), iters, res
    )
