"""TPU CVaR solvers vs the reference-CVaR oracle (QCQP IPM).

Primary: the structured interior-point solver (``solvers/cvar_ipm.py``).
The cone-ADMM variant (``solvers/cvar.py``) is validated as a formulation
cross-check at loose tolerance (it converges slowly and is kept as an
experimental alternative).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from belief_planning_tpu.oracle.reference_cvar import OracleCVaRController
from belief_planning_tpu.oracle.reference_tree import OracleModelAdapter
from belief_planning_tpu.solvers.cvar import CVaRConfig, build_cvar_plan, cvar_solve
from belief_planning_tpu.solvers.cvar_ipm import CVaRIPMConfig, cvar_ipm_solve
from belief_planning_tpu.tree.topology import build_topology
from belief_planning_tpu.tree.engine import build_tree

from tests.test_tree_qp import overtake_setup


def setup_case(quirks, N=3, NB=1, ralpha=0.9):
    cons, pset, model, params = overtake_setup(N=N, NB=NB)
    adapter = OracleModelAdapter(model, pset.params)
    oracle = OracleCVaRController(params, adapter, ralpha=ralpha,
                                  replicate_quirks=quirks)
    x = np.array([0.0, 1.8, 20.0, 0.0])
    z = np.array([9.0, 1.8, 17.0, 0.0])
    u_o = oracle.solve(x, z, xRef=params.xRef)
    assert oracle.feasible == 1
    topo = build_topology(params.N, params.NB, model.m, params.n, params.d)
    cplan = build_cvar_plan(topo, replicate_quirks=quirks)
    ts = build_tree(model, topo, x, z, np.zeros((topo.totalu, params.d)),
                    pset.params)
    return oracle, u_o, params, model, cplan, ts, x


@pytest.mark.parametrize("quirks", [True, False])
def test_cvar_ipm_matches_oracle(quirks):
    oracle, u_o, params, model, cplan, ts, x = setup_case(quirks)
    J_o = oracle.solution.v[-1]
    x_f, u_f, s_f, r_f, aux = cvar_ipm_solve(
        cplan, ts, params.Q, params.R, params.Qslack, params.xRef, 0.9,
        params.Fx, params.bx, params.Fu, params.bu, x, S=None,
        cfg=CVaRIPMConfig(iters=40),
    )
    assert np.abs(np.asarray(u_f) - oracle.uPred).max() < 1e-3
    assert np.abs(np.asarray(u_f)[0] - u_o).max() < 5e-4
    assert abs(float(aux["J"]) - J_o) < 0.1


def test_cvar_ipm_deeper_tree():
    oracle, u_o, params, model, cplan, ts, x = setup_case(True, N=3, NB=2)
    J_o = oracle.solution.v[-1]
    x_f, u_f, s_f, r_f, aux = cvar_ipm_solve(
        cplan, ts, params.Q, params.R, params.Qslack, params.xRef, 0.9,
        params.Fx, params.bx, params.Fu, params.bu, x, S=None,
        cfg=CVaRIPMConfig(iters=80),
    )
    assert np.abs(np.asarray(u_f)[0] - u_o).max() < 1e-3, (
        np.abs(np.asarray(u_f)[0] - u_o).max(), float(aux["J"]), J_o
    )
    assert abs(float(aux["J"]) - J_o) < 0.5


def test_cvar_admm_formulation_crosscheck():
    # the ADMM variant shares the decomposed formulation; verify it heads to the
    # same optimum (loose tolerance — it converges slowly)
    oracle, u_o, params, model, cplan, ts, x = setup_case(True)
    x_n, u_n, s_n, st, aux = cvar_solve(
        cplan, ts, params.Q, params.R, params.Qslack, params.xRef, 0.9,
        params.Fx, params.bx, params.Fu, params.bu, x, S=None,
        cfg=CVaRConfig(rho4=10.0, rho5=10.0, rho_eq=10.0, rho_sign=10.0,
                       iters=4000),
    )
    assert np.abs(np.asarray(u_n)[0] - u_o).max() < 0.5


def test_gj_inv_matches_numpy():
    """Gauss-Jordan inverse (f64-on-TPU fallback, tree_qp.small_dense_inv)
    matches LAPACK on random well- and ill-conditioned small matrices."""
    import numpy.linalg as npl

    from belief_planning_tpu.solvers.tree_qp import _gj_inv

    rng = np.random.default_rng(3)
    for k in (2, 12, 36):
        M = rng.normal(size=(k, k))
        got = np.asarray(_gj_inv(jnp.asarray(M)))
        np.testing.assert_allclose(got, npl.inv(M), rtol=1e-9, atol=1e-9)
    # saddle-structured (zero diagonal block) — exercises pivoting
    H = np.diag(rng.uniform(1, 10, 6))
    A = rng.normal(size=(3, 6))
    K = np.block([[H, A.T], [A, np.zeros((3, 3))]])
    got = np.asarray(_gj_inv(jnp.asarray(K)))
    np.testing.assert_allclose(got, npl.inv(K), rtol=1e-8, atol=1e-8)


def test_cvar_ipm_gondzio_oracle_and_hard_batch():
    """The Gondzio-corrector option must (a) keep the oracle gate and (b)
    improve the hard-cold-start final gap vs plain Mehrotra (the centrality
    jam — see cvar_ipm.py docstring)."""
    import jax

    oracle, u_o, params, model, cplan, ts, x = setup_case(True)
    cfg_g = CVaRIPMConfig(iters=40, gondzio=2)
    x_f, u_f, s_f, r_f, aux = cvar_ipm_solve(
        cplan, ts, params.Q, params.R, params.Qslack, params.xRef, 0.9,
        params.Fx, params.bx, params.Fu, params.bu, x, S=None, cfg=cfg_g)
    assert np.abs(np.asarray(u_f)[0] - u_o).max() < 5e-4

    # hard cold-start batch (same recipe as scripts/cvar_f32_diag.py)
    cons, pset, model, params = overtake_setup(N=8, NB=2)
    topo = build_topology(params.N, params.NB, model.m, params.n, params.d)
    cplan = build_cvar_plan(topo, replicate_quirks=True)
    rng = np.random.default_rng(0)
    B = 6
    xs = np.array([0.0, 1.8, 20.0, 0.0]) + rng.normal(0, 0.2, (B, 4))
    xs[:, 1] = np.clip(xs[:, 1], 1.3, 13.1)
    zs = np.array([12.0, 1.8, 17.0, 0.0]) + rng.normal(0, 0.5, (B, 4))
    zs[:, 1] = np.clip(zs[:, 1], 1.3, 13.1)
    u0 = np.zeros((topo.totalu, params.d))

    def final_gap(gondzio):
        cfg = CVaRIPMConfig(iters=30, gondzio=gondzio)

        def one(x_, z_):
            ts = build_tree(model, topo, x_, z_, u0, pset.params)
            out = cvar_ipm_solve(
                cplan, ts, params.Q, params.R, params.Qslack,
                np.array([0., 1.8, 18., 0.]), 0.9,
                params.Fx, params.bx, params.Fu, params.bu, x_, cfg=cfg)
            return out[4]["gap"]

        return np.asarray(jax.jit(jax.vmap(one))(xs, zs))

    g0 = final_gap(0)
    g2 = final_gap(2)
    assert np.isfinite(g2).all()
    assert np.median(g2) < 0.8 * np.median(g0), (np.median(g0), np.median(g2))
