"""Legacy HMM-belief highway environment (rebuilt working).

Equivalent of the reference ``Highway_env.py``: an NV-vehicle highway where the
ego runs the belief-augmented HMM MPC and each uncontrolled vehicle tracks its
lane with an LQR-like controller filtered through a *backup-CBF QP* (a small QP
enforcing ``ḣ ≥ −αh`` along the vehicle's chosen backup trajectory using rollout
sensitivity matrices, ``Highway_env.py:160-221``). After each step the ego's
belief over every obstacle's backup policy is updated Bayesically:
``b ← normalize((b·H(h)) ∘ P(u | CBF condition))`` (``:230-254``), the obstacle
stochastically switches backups by the transition matrix row (``:257``), and
far-away vehicles are respawned near the ego (``replace_veh``, ``:262-302``).

The per-obstacle CBF QPs are tiny (3 variables) and host-side (simulation
logic, not the TPU hot path); they use the oracle IPM. Randomness is seeded.
"""

from __future__ import annotations

import math
from typing import List

import numpy as np

from belief_planning_tpu.models.dynamics import dubins
from belief_planning_tpu.models.hmm import (
    HMMPredictiveModel,
    backup_input_prob,
    backup_traj_with_sensitivity,
    backup_trans,
)
from belief_planning_tpu.models.safety import veh_col
from belief_planning_tpu.oracle.qp import solve_qp

V0 = 15.0
LANE_WIDTH = 3.6


def veh_con(x, x0, umax, ignore_x=True):
    """LQR-like lane-tracking controller with saturation (reference ``veh_con``,
    ``HMM_backup_dyn.py:18-28``)."""
    if ignore_x:
        u = np.array([
            -0.8558 * (x[2] - x0[2]),
            -0.3162 * (x[1] - x0[1]) - 3.9889 * (x[3] - x0[3]),
        ])
    else:
        u = np.array([
            -0.3162 * (x[0] - x0[0]) - 0.8558 * (x[2] - x0[2]),
            -0.3162 * (x[1] - x0[1]) - 3.9889 * (x[3] - x0[3]),
        ])
    return np.clip(u, -umax, umax)


def x_bdry(x, bdry, width):
    """Road-boundary margin and gradient (reference ``X_bdry``,
    ``HMM_backup_dyn.py:10-16``)."""
    dy1 = x[1] - bdry[0] - width / 2
    dy2 = bdry[1] - x[1] - width / 2
    if dy1 < dy2:
        return dy1, np.array([0., 1., 0., 0.])
    return dy2, np.array([0., -1., 0., 0.])


class _Veh:
    def __init__(self, state, dt, backupidx=0, laneidx=0):
        self.state = np.asarray(state, float)
        self.dt = dt
        self.v_length = 4.0
        self.v_width = 2.4
        self.backupidx = backupidx
        self.laneidx = laneidx

    def step(self, u):
        x = self.state
        self.state = x + np.array(
            [x[2] * np.cos(x[3]), x[2] * np.sin(x[3]), u[0], u[1]]
        ) * self.dt


class HMMHighwayEnv:
    """Reference ``Highway_env`` (``Highway_env.py:48-302``)."""

    def __init__(self, NV, mpc, N_lane=6, seed=0):
        self.dt = mpc.model.dt
        self.NV = NV
        self.N_lane = N_lane
        self.mpc = mpc
        self.model: HMMPredictiveModel = mpc.model
        self.cons = self.model.cons
        self.m = self.model.m
        self.rng = np.random.default_rng(seed)
        self.b = np.ones((NV - 1, self.m)) / self.m
        self.f0 = np.array([V0, 0., 0., 0.])
        self.veh_set: List[_Veh] = []
        self.desired_x = [None] * NV
        for i in range(NV):
            lane = int(self.rng.random() * N_lane)
            while True:
                Y = (lane + 0.5) * LANE_WIDTH + self.rng.normal(0, 0.1)
                X = self.rng.random() * 30.0
                if all(
                    not (abs(Y - v.state[1]) <= 3 and abs(X - v.state[0]) <= 8)
                    for v in self.veh_set
                ):
                    break
            self.veh_set.append(_Veh([X, Y, V0, 0.], self.dt, 0, lane))
            v_des = V0 if i == 0 else V0 + self.rng.normal(0, 5)
            lane_des = self.rng.integers(N_lane)
            self.desired_x[i] = np.array(
                [0., lane_des * LANE_WIDTH + LANE_WIDTH / 2, v_des, 0.]
            )

    def _policy_u(self, j, x):
        return np.asarray(self.model.policy_fns[j](x, self.model.policy_params[j]))

    def _backup_rollouts(self, Nsteps):
        """Per-vehicle, per-policy rollouts with sensitivity matrices."""
        outs = []
        for i in range(self.NV):
            per_pol = []
            for j in range(self.m):
                fn = self.model.policy_fns[j]
                p = self.model.policy_params[j]
                dyn_closed = lambda x, fn=fn, p=p: dubins(x, fn(x, p))
                xs, QQ, Qt = backup_traj_with_sensitivity(
                    dyn_closed, self.veh_set[i].state, Nsteps, self.dt, self.f0
                )
                per_pol.append((np.asarray(xs), np.asarray(QQ), np.asarray(Qt)))
            outs.append(per_pol)
        return outs

    def step(self, t_=0):
        NV, m, cons = self.NV, self.m, self.cons
        umax = np.array([cons.am, cons.rm])
        Nmpc = self.mpc.N
        Nroll = int(self.dt * Nmpc / self.dt) + int(2 / self.dt) + 2

        # lane bookkeeping (Highway_env.py:105-131)
        for i in range(NV):
            v = self.veh_set[i]
            if abs(v.state[1] - (1.8 + v.laneidx * 3.6)) < 0.4:
                if i == 0:
                    mindis, idx = 1000.0, 0
                    for ii in range(1, NV):
                        dd = abs(self.veh_set[ii].state[0] - v.state[0])
                        if self.veh_set[ii].laneidx != v.laneidx and dd < mindis:
                            mindis, idx = dd, ii
                    if mindis < 4:
                        v.laneidx = self.veh_set[idx].laneidx
                elif self.rng.uniform() <= 0.05:
                    if v.laneidx == 0:
                        v.laneidx = 1
                    elif v.laneidx == self.N_lane - 1:
                        v.laneidx = self.N_lane - 2
                    else:
                        v.laneidx += 1 if self.rng.uniform() <= 0.5 else -1

        rolls = self._backup_rollouts(Nroll)
        u0_set = [None] * NV
        for i in range(NV):
            v = self.veh_set[i]
            x0 = v.state.copy()
            x0[1] = 1.8 + v.laneidx * 3.6
            x0[2] = self.veh_set[0].state[2] + 0.5 * (
                self.veh_set[0].state[0] - v.state[0]
            )
            x0[3] = 0.0
            u0_set[i] = veh_con(v.state, x0, umax)

        # ego MPC over belief-augmented state
        xbackup_steps = np.zeros((Nmpc, (NV - 1) * m, 4))
        for i in range(1, NV):
            for j in range(m):
                xbackup_steps[:, (i - 1) * m + j] = rolls[i][j][0][:Nmpc]
        Ydes = 1.8 + self.veh_set[0].laneidx * 3.6
        xRef = np.array([0., Ydes, V0, 0.])
        self.mpc.solve(self.veh_set[0].state, self.b, xbackup_steps, xRef)
        u_set = [self.mpc.uPred[0]]
        self.veh_set[0].step(u_set[0])

        # obstacles: backup-CBF QP (Highway_env.py:160-221)
        eps = 1e-6
        for i in range(1, NV):
            v = self.veh_set[i]
            x = v.state
            fi = np.array([x[2] * np.cos(x[3]), x[2] * np.sin(x[3]), 0., 0.])
            g = np.array([[0., 0.], [0., 0.], [1., 0.], [0., 1.]])
            A_rows, b_rows = [], []
            xs_i, QQ_i, Qt_i = rolls[i][v.backupidx]
            for t in range(0, xs_i.shape[0], 3):
                xi = xs_i[t]
                h, dhb = x_bdry(xi, [0, self.N_lane * LANE_WIDTH], v.v_width)
                if h < 0.5:
                    dhdx = dhb @ QQ_i[t]
                    if np.linalg.norm(dhdx @ g) > 1e-6:
                        A_rows.append(-(dhdx @ g))
                        b_rows.append(dhdx @ (fi - self.f0) - dhb @ Qt_i[t]
                                      + cons.alpha * h)
                for jv in range(NV):
                    if jv == i:
                        continue
                    xs_j = rolls[jv][self.veh_set[jv].backupidx][0]
                    if t >= xs_j.shape[0]:
                        continue
                    xj = xs_j[t]
                    size = ((v.v_length + self.veh_set[jv].v_length) / 2 + 1,
                            (v.v_width + self.veh_set[jv].v_width) / 2 + 0.2)
                    h = float(veh_col(xi, xj, size, clip=5.0, normalize=True))
                    if h < 2:
                        dh = np.zeros(4)
                        for k in (0, 1):
                            dxk = np.zeros(4)
                            dxk[k] = eps
                            dh[k] = (float(veh_col(xi + dxk, xj, size, clip=5.0,
                                                   normalize=True)) - h) / eps
                        dhdx = dh @ QQ_i[t]
                        if np.linalg.norm(dhdx @ g) > 1e-6:
                            A_rows.append(-(dhdx @ g))
                            b_rows.append(dhdx @ (fi - self.f0)
                                          + cons.alpha * h - dh @ Qt_i[t])
            if A_rows:
                A = np.array(A_rows)
                A = np.hstack([A, -np.ones((A.shape[0], 1))])
                A_full = np.vstack([
                    A,
                    np.hstack([np.eye(2), np.zeros((2, 1))]),
                    np.hstack([-np.eye(2), np.zeros((2, 1))]),
                    np.array([[0., 0., -1.]]),
                ])
                b_full = np.concatenate([
                    np.array(b_rows), umax, umax, [0.0]
                ])
                P = np.diag([1., 1., 0.])
                q = np.append(-u0_set[i], 1e6)
                sol = solve_qp(P, q, A=A_full, b=b_full, tol=1e-8, max_iter=40)
                u_i = sol.z[:2] if sol.status == "optimal" else u0_set[i]
            else:
                u_i = np.clip(u0_set[i], -umax, umax)
            u_set.append(u_i)
            v.step(u_i)

            # belief update + stochastic backup switching (Highway_env.py:230-257)
            if abs(v.state[0] - self.veh_set[0].state[0]) > 15:
                self.replace_veh(i)
            else:
                xdot = np.asarray(dubins(v.state, u_i))
                hi = np.zeros(m)
                cbfcond = np.zeros(m)
                for j in range(m):
                    xs_j, QQ_j, Qt_j = rolls[i][j]
                    hij = np.zeros(Nmpc)
                    dhij = np.zeros(Nmpc)
                    for tt in range(Nmpc):
                        size = ((v.v_length + self.veh_set[0].v_length) / 2,
                                (v.v_width + self.veh_set[0].v_width) / 2)
                        xp_ego = self.mpc.xPred[min(tt, self.mpc.xPred.shape[0] - 1), :4]
                        hij[tt] = float(veh_col(xs_j[tt], xp_ego, size,
                                                clip=5.0, normalize=True,
                                                alpha=cons.col_alpha))
                        dh = np.zeros(4)
                        for k in (0, 1):
                            dxk = np.zeros(4)
                            dxk[k] = eps
                            dh[k] = (float(veh_col(xs_j[tt] + dxk, xp_ego, size,
                                                   clip=5.0, normalize=True,
                                                   alpha=cons.col_alpha)) - hij[tt]) / eps
                        dhij[tt] = dh @ (QQ_j[tt] @ (xdot - self.f0) - Qt_j[tt])
                    hi[j] = np.min(hij)
                    cbfcond[j] = np.mean(hij + dhij)
                bi = self.b[i - 1].copy()
                H = np.asarray(backup_trans(hi, cons))
                bi = bi @ H
                for j in range(m):
                    bi[j] = bi[j] * float(backup_input_prob(cbfcond[j], cons))
                self.b[i - 1] = bi / np.sum(bi)
                probs = np.maximum(H[v.backupidx], 0)
                probs = probs / probs.sum()
                v.backupidx = int(self.rng.choice(m, p=probs))
        return u_set, [v.state for v in self.veh_set]

    def replace_veh(self, idx, direction=2):
        """Respawn a far-away vehicle near the ego (reference ``replace_veh``,
        ``Highway_env.py:262-302``)."""
        if idx == 0:
            return False
        ego = self.veh_set[0]
        if direction == 0:
            LB, UB = ego.state[0] + 8, ego.state[0] + 13
        elif direction == 1:
            LB, UB = ego.state[0] - 13, ego.state[0] - 5
        else:
            LB, UB = ego.state[0] - 15, ego.state[0] + 15
        if ego.laneidx == 0:
            lane = 1
        elif ego.laneidx == self.N_lane - 1:
            lane = self.N_lane - 2
        else:
            lane = ego.laneidx + (1 if self.rng.uniform() <= 0.5 else -1)
        for _ in range(20):
            Y = (lane + 0.5) * LANE_WIDTH + self.rng.normal(0, 0.1)
            X = self.rng.random() * (UB - LB) + LB
            ok = all(
                not (abs(Y - self.veh_set[i].state[1]) <= 2.2
                     and abs(X - self.veh_set[i].state[0]) <= 5)
                for i in range(self.NV) if i != idx
            )
            if ok:
                self.veh_set[idx] = _Veh([X, Y, ego.state[2], 0.], self.dt, 0, lane)
                self.b[idx - 1] = np.ones(self.m) / self.m
                return True
        return False
