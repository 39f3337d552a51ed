"""HMM belief path: model, belief-gated MPC, and CBF-obstacle env tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from belief_planning_tpu.controllers.hmm_mpc import HMMMPC
from belief_planning_tpu.envs.hmm_highway import HMMHighwayEnv
from belief_planning_tpu.models import policies as P
from belief_planning_tpu.models.hmm import (
    HMMPredictiveModel,
    backup_input_prob,
    backup_trans,
    backup_traj_with_sensitivity,
)
from belief_planning_tpu.models.dynamics import dubins
from belief_planning_tpu.presets import init_mpc_params
from belief_planning_tpu.solvers.tree_qp import ADMMConfig
from belief_planning_tpu.utils.config import HMMConstants


def hmm_setup(M=1, N=6):
    cons = HMMConstants(am=6.0, rm=0.3)
    fns = (P.maintain, P.brake)
    pp = (P.MaintainParams(Kpsi=cons.Kpsi), P.brake_params_sim(cons.Kpsi))
    model = HMMPredictiveModel(nx=4, d=2, M=M, m=2, dt=0.1, cons=cons,
                               policy_fns=fns, policy_params=pp)
    params = init_mpc_params(4, 2, N, M, 2, ydes=1.8, vdes=15.0, am=6.0,
                             rm=0.3, N_lane=6, W=2.4)
    return cons, model, params


def test_backup_trans_is_stochastic():
    cons = HMMConstants()
    h = jnp.array([0.5, -0.2])
    H = np.asarray(backup_trans(h, cons))
    assert np.allclose(H.sum(axis=1), 1.0, atol=1e-12)
    assert np.all(H >= 0)
    # diagonal boost present
    assert H[0, 0] > H[1, 0] - 1e-12


def test_hmm_model_step_keeps_belief_simplex():
    cons, model, params = hmm_setup()
    xb = np.concatenate([np.array([0., 1.8, 15., 0.]), np.array([0.6, 0.4])])
    xbackup = np.array([[12., 1.8, 14., 0.], [12., 1.8, 13., 0.]])
    xbp = np.asarray(model.step(xb, np.array([0.1, 0.0]), xbackup))
    b = xbp[4:]
    assert np.isclose(b.sum(), 1.0, atol=1e-10)
    assert np.all(b >= 0)
    A, B, C, h0, Jh = model.linearize(xb, np.array([0.1, 0.0]), xbackup)
    assert np.asarray(A).shape == (6, 6)
    assert np.asarray(B).shape == (6, 2)
    assert np.asarray(h0).shape == (1, 2)
    assert np.asarray(Jh).shape == (1, 2, 6)


def test_backup_traj_sensitivity_shapes():
    cons, model, params = hmm_setup()
    dyn_closed = lambda x: dubins(x, P.maintain(x, P.MaintainParams(Kpsi=0.1)))
    xs, QQ, Qt = backup_traj_with_sensitivity(
        dyn_closed, jnp.array([0., 1.8, 15., 0.]), 10, 0.1,
        jnp.array([15., 0., 0., 0.]))
    assert xs.shape == (10, 4) and QQ.shape == (10, 4, 4) and Qt.shape == (10, 4)
    # sensitivity starts at identity
    assert np.allclose(np.asarray(QQ)[0], np.eye(4))


def test_hmm_mpc_solves_and_brakes_for_likely_obstacle():
    cons, model, params = hmm_setup(N=6)
    mpc = HMMMPC(params, model, admm=ADMMConfig(iters=200, polish_iters=20),
                 dtype=jnp.float64)
    x0 = np.array([0., 1.8, 15., 0.])
    b0 = np.array([[0.9, 0.1]])
    # obstacle ahead in the same lane, per-policy rollouts
    xb_steps = np.zeros((6, 2, 4))
    z = np.array([14., 1.8, 10., 0.])
    for t in range(6):
        xb_steps[t, 0] = z + np.array([10., 0, 0, 0]) * 0.1 * (t + 1)
        xb_steps[t, 1] = z + np.array([8., 0, 0, 0]) * 0.1 * (t + 1)
    u0 = mpc.solve(x0, b0, xb_steps, np.array([0., 1.8, 15., 0.]))
    assert mpc.feasible == 1
    assert np.all(np.isfinite(u0))
    assert abs(u0[0]) <= 6.0 + 1e-6 and abs(u0[1]) <= 0.3 + 1e-6
    # second (warm) solve runs
    u1 = mpc.solve(x0, b0, xb_steps, np.array([0., 1.8, 15., 0.]))
    assert np.all(np.isfinite(u1))


def test_hmm_mpc_oracle_parity():
    """Receding-horizon applied inputs must match the dense NumPy
    transcription of the reference belief-LTV MPC
    (PredictiveControllers.py:56-340), including the off-by-one
    linearization and belief-gating quirks. b0 keeps every belief entry
    well above the 0.1 gate so row activation cannot flip on solver noise."""
    from belief_planning_tpu.oracle.reference_hmm import OracleHMMController
    from belief_planning_tpu.solvers.tree_qp_ipm import QPIPMConfig

    cons, model, params = hmm_setup(N=6)
    oracle = OracleHMMController(params, model)
    mpc = HMMMPC(params, model, dtype=jnp.float64,
                 ipm=QPIPMConfig(iters=100))
    x0 = np.array([0.0, 1.8, 15.0, 0.0])
    b0 = np.array([[0.7, 0.3]])
    xRef = np.array([0.0, 1.8, 15.0, 0.0])
    z = np.array([14.0, 2.0, 10.0, 0.0])

    errs = []
    for t in range(3):
        xb_steps = np.zeros((6, 2, 4))
        for s in range(6):
            xb_steps[s, 0] = z + np.array([10.0, 0, 0, 0]) * 0.1 * (s + 1)
            xb_steps[s, 1] = z + np.array([8.0, 0, 0, 0]) * 0.1 * (s + 1)
        u_o = oracle.solve(x0, b0, xb_steps, xRef)
        u_j = np.asarray(mpc.solve(x0, b0, xb_steps, xRef))
        errs.append(np.abs(u_o - u_j).max())
        # step both worlds identically with the oracle input
        x0 = x0 + np.array([x0[2] * np.cos(x0[3]), x0[2] * np.sin(x0[3]),
                            u_o[0], u_o[1]]) * 0.1
        z = z + np.array([z[2], 0.0, 0.0, 0.0]) * 0.1
    assert max(errs) < 1e-5, errs
    assert oracle.feasible == 1 and mpc.feasible == 1


def test_hmm_highway_env_steps():
    cons, model, params = hmm_setup(M=2, N=5)
    mpc = HMMMPC(params, model, admm=ADMMConfig(iters=120, polish_iters=15),
                 dtype=jnp.float64)
    env = HMMHighwayEnv(NV=3, mpc=mpc, N_lane=6, seed=0)
    for t in range(3):
        u_set, states = env.step(t)
        assert len(u_set) == 3
        for u in u_set:
            assert np.all(np.isfinite(u))
    # beliefs remain simplex distributions
    assert np.allclose(env.b.sum(axis=1), 1.0, atol=1e-8)
    assert np.all(env.b >= -1e-12)


def test_hmm_batched_step_matches_per_lane():
    """The vmapped batched HMM step (the ensemble path the reference never
    had) must reproduce the per-lane step exactly on a small batch."""
    from belief_planning_tpu.controllers.hmm_mpc import (
        make_hmm_mpc_batched_step,
        make_hmm_mpc_step,
    )
    from belief_planning_tpu.solvers.tree_qp_ipm import QPIPMConfig

    cons, model, params = hmm_setup(N=6)
    ipm = QPIPMConfig(iters=12)
    _, init_c, step = make_hmm_mpc_step(model, params, solver="ipm", ipm=ipm)
    _, init_b, bstep = make_hmm_mpc_batched_step(model, params, ipm=ipm)

    B = 3
    rng = np.random.default_rng(3)
    x0s = np.array([0., 1.8, 15., 0.]) + rng.normal(0, 0.2, (B, 4))
    b0s = rng.uniform(0.2, 0.8, (B, 1, 2))
    b0s /= b0s.sum(axis=2, keepdims=True)
    z = np.array([14., 1.8, 10., 0.])
    xbk = np.zeros((B, 6, 2, 4))
    for t in range(6):
        xbk[:, t, 0] = z + np.array([10., 0, 0, 0]) * 0.1 * (t + 1)
        xbk[:, t, 1] = z + np.array([8., 0, 0, 0]) * 0.1 * (t + 1)
    xbk += rng.normal(0, 0.05, xbk.shape)
    xRef = np.concatenate([np.array([0., 1.8, 15., 0.]), np.zeros(2)])

    f64 = jnp.float64
    args = tuple(jnp.asarray(a, f64) for a in (x0s, b0s, xbk, xRef))
    carrys = init_b(B, f64)
    carrys, res_b = bstep(carrys, *args)
    carrys, res_b2 = bstep(carrys, *args)     # warm step too

    for i in range(B):
        c = init_c(f64)
        c, r1 = step(c, args[0][i], args[1][i], args[2][i], args[3])
        c, r2 = step(c, args[0][i], args[1][i], args[2][i], args[3])
        assert np.allclose(np.asarray(res_b.uPred[i]), np.asarray(r1.uPred),
                           atol=1e-9)
        assert np.allclose(np.asarray(res_b2.uPred[i]), np.asarray(r2.uPred),
                           atol=1e-9)
    assert np.all(np.asarray(res_b.feasible)) and np.all(
        np.asarray(res_b2.feasible))
