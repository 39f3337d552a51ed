"""Unit tests: soft-math kernels, dynamics, policies, safety, predictive model.

Oracles here are direct NumPy transcriptions of the reference formulas
(``highway_branch_dyn.py``, ``quadruped_branch_dyn.py``) — independent of the JAX
implementations under test.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from belief_planning_tpu.ops.softmath import softsat, softmin, softmax
from belief_planning_tpu.models.dynamics import dubins, quad_kinematics
from belief_planning_tpu.models import policies as P
from belief_planning_tpu.models import safety as S
from belief_planning_tpu.models.predictive import highway_model, quadruped_model
from belief_planning_tpu.ops.linearize import linearize_dynamics
from belief_planning_tpu.ops.rollout import rollout_policy
from belief_planning_tpu.utils.config import BranchConstants, QuadConstants

RNG = np.random.default_rng(0)


# ---- reference formula oracles (NumPy) ------------------------------------

def np_softsat(x, s):
    return (np.exp(s * x) - 1) / (np.exp(s * x) + 1) * 0.5 + 0.5


def np_softmin(x, gamma):
    return np.sum(np.exp(-gamma * x) * x) / np.sum(np.exp(-gamma * x))


def np_softmax(x, gamma):
    return np.sum(np.exp(gamma * x) * x) / np.sum(np.exp(gamma * x))


def np_veh_col(x1, x2, size, alpha=1.0, clip=None):
    dx = abs(x1[0] - x2[0]) - size[0]
    dy = abs(x1[1] - x2[1]) - size[1]
    if clip is not None:
        dx = np.clip(dx, -clip, clip)
        dy = np.clip(dy, -clip, clip)
    return (dx * np.exp(alpha * dx) + dy * np.exp(dy * alpha)) / (
        np.exp(alpha * dx) + np.exp(dy * alpha)
    )


def np_lane_bdry(x, lb, ub):
    return np_softmin(np.array([x[1] - lb, ub - x[1]]), 5.0)


# ---- tests ----------------------------------------------------------------

def test_softmath_matches_reference_formulas():
    x = RNG.normal(size=7)
    assert np.allclose(softsat(x, 2.0), np_softsat(x, 2.0), atol=1e-12)
    assert np.allclose(softmin(x, 5.0), np_softmin(x, 5.0), atol=1e-12)
    assert np.allclose(softmax(x, 3.0), np_softmax(x, 3.0), atol=1e-12)


def test_dubins_dynamics():
    x = np.array([1.0, 2.0, 15.0, 0.1])
    u = np.array([0.5, -0.02])
    expected = np.array(
        [x[2] * np.cos(x[3]), x[2] * np.sin(x[3]), u[0], u[1]]
    )
    assert np.allclose(dubins(x, u), expected)


def test_quad_dynamics():
    x = np.array([1.0, 2.0, 0.3])
    u = np.array([0.2, 0.05, 0.1])
    expected = np.array(
        [
            u[0] * np.cos(x[2]) - u[1] * np.sin(x[2]),
            u[0] * np.sin(x[2]) + u[1] * np.cos(x[2]),
            u[2],
        ]
    )
    assert np.allclose(quad_kinematics(x, u), expected)


def test_linearize_exactness():
    # Euler-discretized dubins has closed-form Jacobians; check against them.
    dt = 0.1
    x = np.array([0.0, 1.8, 20.0, 0.05])
    u = np.array([0.3, -0.01])
    A, B, C, xp = linearize_dynamics(dubins, x, u, dt)
    A_true = np.eye(4)
    A_true[0, 2] = dt * np.cos(x[3])
    A_true[0, 3] = -dt * x[2] * np.sin(x[3])
    A_true[1, 2] = dt * np.sin(x[3])
    A_true[1, 3] = dt * x[2] * np.cos(x[3])
    B_true = np.zeros((4, 2))
    B_true[2, 0] = dt
    B_true[3, 1] = dt
    assert np.allclose(A, A_true, atol=1e-12)
    assert np.allclose(B, B_true, atol=1e-12)
    assert np.allclose(xp, x + np.array([x[2] * np.cos(x[3]), x[2] * np.sin(x[3]), u[0], u[1]]) * dt)
    assert np.allclose(C, np.asarray(xp) - A_true @ x - B_true @ u, atol=1e-12)


def test_linearize_batched():
    dt = 0.1
    xs = RNG.normal(size=(5, 4))
    us = RNG.normal(size=(5, 2))
    A, B, C, xp = linearize_dynamics(dubins, xs, us, dt)
    assert A.shape == (5, 4, 4) and B.shape == (5, 4, 2)
    for i in range(5):
        Ai, Bi, Ci, xpi = linearize_dynamics(dubins, xs[i], us[i], dt)
        assert np.allclose(A[i], Ai) and np.allclose(C[i], Ci)


def test_policies_match_reference_formulas():
    cons = BranchConstants()
    x = np.array([3.0, 5.4, 18.0, 0.07])
    # maintain
    u = P.maintain(x, P.MaintainParams(Kpsi=cons.Kpsi))
    assert np.allclose(u, [0.0, -cons.Kpsi * x[3]])
    # brake (MPC-path constants −7, γ=5)
    u = P.brake(x, P.brake_params_mpc(cons.Kpsi))
    assert np.allclose(u[0], np_softmax(np.array([-7.0, -x[2]]), 5.0), atol=1e-12)
    # brake (sim-path constants −5, γ=3)
    u = P.brake(x, P.brake_params_sim(cons.Kpsi))
    assert np.allclose(u[0], np_softmax(np.array([-5.0, -x[2]]), 3.0), atol=1e-12)
    # lane change
    xt = np.array([0.5, 1.8, 15.0, 0.0])
    u = P.lane_change(x, P.LaneChangeParams(x_target=xt))
    assert np.allclose(
        u,
        [
            -0.8558 * (x[2] - xt[2]),
            -0.3162 * (x[1] - xt[1]) - 3.9889 * (x[3] - xt[3]),
        ],
    )


def test_safety_matches_reference_formulas():
    x1 = np.array([0.0, 1.8, 20.0, 0.0])
    x2 = np.array([5.0, 5.4, 20.0, 0.0])
    size = (5.0, 2.7)
    assert np.allclose(
        S.veh_col(x1, x2, size), np_veh_col(x1, x2, size), atol=1e-12
    )
    assert np.allclose(
        S.veh_col(x1, x2, size, clip=5.0),
        np_veh_col(x1, x2, size, clip=5.0),
        atol=1e-12,
    )
    assert np.allclose(S.lane_bdry_h(x1, 1.25, 9.55), np_lane_bdry(x1, 1.25, 9.55))
    # quadruped: 1-norm (symbolic path) vs 2-norm (numeric path)
    q1 = np.array([1.0, 1.0, 0.2])
    q2 = np.array([4.0, 3.0, -0.2])
    assert np.allclose(
        S.robot_col(q1, q2, 0.5, 0.3, 1.0, 0.6, 0.2, ord=1),
        abs(q1[0] - q2[0]) + abs(q1[1] - q2[1]) - 0.75 - 0.2,
    )
    assert np.allclose(
        S.robot_col(q1, q2, 0.5, 0.3, 1.0, 0.6, 0.2, ord=2),
        np.hypot(q1[0] - q2[0], q1[1] - q2[1]) - 0.75 - 0.2,
    )


def test_rollout_matches_manual_euler():
    cons = BranchConstants()
    pset = P.highway_policy_set(cons, np.array([0.5, 1.8, 15.0, 0.0]))
    x0 = np.array([0.0, 1.8, 20.0, 0.02])
    N, dt = 8, 0.1
    xs = rollout_policy(dubins, P.maintain, x0, pset.params[0], N, dt)
    # manual Euler
    x = x0.copy()
    for i in range(N):
        u = np.array([0.0, -cons.Kpsi * x[3]])
        x = x + np.array([x[2] * np.cos(x[3]), x[2] * np.sin(x[3]), u[0], u[1]]) * dt
        assert np.allclose(xs[i], x, atol=1e-12)


def test_highway_model_probabilities():
    cons = BranchConstants()
    xt = np.array([0.5, 1.8, 15.0, 0.0])
    pset = P.highway_policy_set(cons, xt)
    model = highway_model(cons, pset, N=8, dt=0.1)
    x = np.array([0.0, 1.8, 20.0, 0.0])
    z = np.array([5.0, 5.4, 20.0, 0.0])
    p, dp = model.branch_eval(x, z, pset.params)
    assert p.shape == (3,) and dp.shape == (3, 4)
    assert np.isclose(np.sum(p), 1.0)
    assert np.all(p > 0)
    # dp rows must sum to zero gradient of a normalized distribution
    assert np.allclose(np.sum(dp, axis=0), 0.0, atol=1e-10)

    # independent oracle: rebuild hi with NumPy rollouts and reference formulas
    def np_rollout(x0, ufn, N, dt):
        xs = np.zeros((N, 4))
        xc = x0.copy()
        for i in range(N):
            u = ufn(xc)
            xc = xc + np.array([xc[2] * np.cos(xc[3]), xc[2] * np.sin(xc[3]), u[0], u[1]]) * dt
            xs[i] = xc
        return xs

    ufns = [
        lambda s: np.array([0.0, -cons.Kpsi * s[3]]),
        lambda s: np.array([np_softmax(np.array([-7.0, -s[2]]), 5.0), -cons.Kpsi * s[3]]),
        lambda s: np.array([
            -0.8558 * (s[2] - xt[2]),
            -0.3162 * (s[1] - xt[1]) - 3.9889 * (s[3] - xt[3]),
        ]),
    ]
    x1 = np_rollout(x, ufns[0], 8, 0.1)
    hi = np.zeros(3)
    LB = (cons.W / 2, 3 * 3.6 - cons.W / 2)
    for j in range(3):
        x2 = np_rollout(z, ufns[j], 8, 0.1)
        rows = np.concatenate(
            [
                [np_veh_col(x2[i], x1[i], (cons.L + 2, cons.W + 0.2)) for i in range(8)],
                [np_softmin(np.array([x2[i, 1] - LB[0], LB[1] - x2[i, 1]]), 5.0) for i in range(8)],
            ]
        )
        hi[j] = np_softmin(rows, 5.0)
    hs = np_softsat(hi, 1.0)
    p_ref = np.exp(cons.s1 * hs) / np.sum(np.exp(cons.s1 * hs))
    assert np.allclose(p, p_ref, atol=1e-10)

    # finite-difference check of dp
    eps = 1e-6
    for k in range(4):
        dxk = np.zeros(4)
        dxk[k] = eps
        pp, _ = model.branch_eval(x + dxk, z, pset.params)
        pm, _ = model.branch_eval(x - dxk, z, pset.params)
        fd = (np.asarray(pp) - np.asarray(pm)) / (2 * eps)
        assert np.allclose(dp[:, k], fd, atol=1e-6)


def test_col_eval_linearization():
    cons = BranchConstants()
    pset = P.highway_policy_set(cons, np.array([0.5, 1.8, 15.0, 0.0]))
    model = highway_model(cons, pset, N=8, dt=0.1)
    x = np.array([0.0, 1.8, 20.0, 0.0])
    z = np.array([6.0, 3.0, 20.0, 0.0])
    hlin, dh = model.col_eval(x, z)
    h_direct = np_veh_col(x, z, (cons.L + 1, cons.W + 0.2))
    assert np.isclose(hlin + np.dot(dh, x), h_direct, atol=1e-10)
    # fd gradient
    eps = 1e-6
    for k in range(2):
        dxk = np.zeros(4)
        dxk[k] = eps
        fd = (np_veh_col(x + dxk, z, (cons.L + 1, cons.W + 0.2)) -
              np_veh_col(x - dxk, z, (cons.L + 1, cons.W + 0.2))) / (2 * eps)
        assert np.isclose(dh[k], fd, atol=1e-5)


def test_quadruped_model():
    cons = QuadConstants()
    pset = P.quadruped_policy_set(v0=0.2)
    model = quadruped_model(cons, pset, N=25, dt=0.2)
    x = np.array([0.0, 1.8, 0.0])
    z = np.array([2.5, 2.5, -np.pi / 2])
    p, dp = model.branch_eval(x, z, pset.params)
    assert p.shape == (2,) and np.isclose(np.sum(p), 1.0)
    zp = model.zpred(z, pset.params)
    assert zp.shape == (2, 25, 3)
    # stop policy keeps the state fixed
    assert np.allclose(zp[1], np.tile(z, (25, 1)))
