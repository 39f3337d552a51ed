"""Highway merge environment: on-ramp geometry + closed-loop simulation.

Equivalent of the reference merge path (``merge_geometry``
``Highway_env_branch.py:227-265``, ``Highway_env_merge`` ``:271-380``): the ego
starts on an on-ramp (straight segment + arc) whose reference line feeds the
backup policies through an on-device lookup table (``RefLine``/``jnp.interp``
replacing ``casadi.interpolant``, ``main_branch.py:78-79``), with per-lane
predictive models, a shear state transform ``S`` and per-step ``bx`` so the
lane constraints follow the ramp (``:350-364``).
"""

from __future__ import annotations

from typing import List

import numpy as np

from belief_planning_tpu.envs.highway import LANE_WIDTH, V0, Vehicle
from belief_planning_tpu.models import policies as pol
from belief_planning_tpu.models.safety import lane_bdry_h, veh_col


def merge_geometry(N_lane, merge_lane, merge_s, merge_R, merge_side=0):
    """Ramp reference-line tables (reference ``merge_geometry``,
    ``Highway_env_branch.py:227-265``)."""
    lw = LANE_WIDTH
    theta = np.arccos(1 - lw * merge_lane / merge_R)
    merge_end = merge_s + merge_R * np.sin(theta)
    if merge_side == 0:
        arc_center = np.array([merge_s + merge_R * np.sin(theta),
                               (N_lane - merge_lane) * lw + merge_R])
        lane_start = np.array([merge_s - merge_s * np.cos(theta),
                               N_lane * lw + np.sin(theta) * merge_s])
    else:
        arc_center = np.array([merge_s + merge_R * np.sin(theta),
                               merge_lane * lw - merge_R])
        lane_start = np.array([merge_s - merge_s * np.cos(theta),
                               -np.sin(theta) * merge_s - lw * merge_lane])

    s1 = np.linspace(0, merge_s, num=int(merge_s / 0.5), endpoint=False)
    s2 = merge_s + np.linspace(0, merge_R * theta, num=int(merge_R * theta / 0.5))
    if merge_side == 0:
        X1 = lane_start[0] + s1 * np.cos(theta)
        Y1 = lane_start[1] - s1 * np.sin(theta)
        psi1 = -np.ones_like(s1) * theta
        psi2 = (s2 - s2[-1]) / merge_R
        X2 = arc_center[0] + np.sin(psi2) * merge_R
        Y2 = arc_center[1] - np.cos(psi2) * merge_R
    else:
        X1 = lane_start[0] + s1 * np.cos(theta)
        Y1 = lane_start[1] + s1 * np.sin(theta)
        psi1 = np.ones_like(s1) * theta
        psi2 = (s2[-1] - s2) / merge_R
        X2 = arc_center[0] - np.sin(psi2) * merge_R
        Y2 = arc_center[1] + np.cos(psi2) * merge_R - merge_lane * lw
    return X1, X2, Y1, Y2, psi1, psi2


def merge_ref_lines(N_lane, merge_lane, merge_s, merge_R, merge_side=0):
    """(refY, refpsi) lookup tables over the ramp X coordinate."""
    X1, X2, Y1, Y2, psi1, psi2 = merge_geometry(
        N_lane, merge_lane, merge_s, merge_R, merge_side
    )
    X = np.append(X1, X2)
    Y = np.append(Y1, Y2)
    psi = np.append(psi1, psi2)
    order = np.argsort(X)
    refY = pol.RefLine(xs=X[order], ys=Y[order])
    refpsi = pol.RefLine(xs=X[order], ys=psi[order])
    return refY, refpsi


class HighwayMergeEnv:
    """Reference ``Highway_env_merge`` (``Highway_env_branch.py:271-380``).

    ``mpc`` must be a :class:`BranchMPCCVaR` built with ``use_S=True``;
    ``models`` is the per-lane list [main-road model+params, ramp model+params]
    with their policy-parameter tuples (reference ``pred_model``,
    ``main_branch.py:84-85``).
    """

    def __init__(self, NV, N_lane, mpc, models, policy_param_sets,
                 merge_lane=2, merge_s=50, merge_R=300, merge_side=0, dt=0.05,
                 cons=None, seed=0):
        self.dt = dt
        self.NV = NV
        self.laneID = [1] + [0] * (NV - 1)
        self.N_lane = N_lane
        self.merge_lane = merge_lane
        self.merge_s = merge_s
        self.merge_R = merge_R
        self.merge_side = merge_side
        self.models = models                  # list of PredictiveModel per lane
        self.policy_param_sets = policy_param_sets
        self.mpc = mpc
        self.cons = cons
        self.LB = [cons.W / 2, N_lane * 3.6 - cons.W / 2]
        self.rng = np.random.default_rng(seed)
        self.refY, self.refpsi = merge_ref_lines(
            N_lane, merge_lane, merge_s, merge_R, merge_side
        )
        theta = np.arccos(1 - LANE_WIDTH * merge_lane / merge_R)
        self.merge_end = merge_s + merge_R * np.sin(theta)
        x0 = np.array([[24., 13., V0, -0.2], [15., 5.4, V0, 0.]])
        self.veh_set: List[Vehicle] = [
            Vehicle(x0[i].copy(), dt=self.dt) for i in range(NV)
        ]

    def _model_u(self, lane, idx, x):
        model = self.models[lane]
        pp = self.policy_param_sets[lane]
        return np.asarray(model.policy_fns[idx](x, pp[idx]))

    def step(self, t_):
        NV, cons = self.NV, self.cons
        n = 4
        u_set = [None] * NV
        xx_set = [None] * NV
        u0_set = [None] * NV
        x_set = [None] * NV

        for i in range(NV):
            z = self.veh_set[i].state
            if z[0] > self.merge_s + 8:
                self.laneID[i] = 0
            lane = self.laneID[i]
            model = self.models[lane]
            zp = np.asarray(model.zpred(z, self.policy_param_sets[lane]))
            xx_set[i] = np.concatenate([zp[j] for j in range(model.m)], axis=1)

        idx0 = self.veh_set[0].backupidx
        x1 = xx_set[0][:, idx0 * n:(idx0 + 1) * n]
        for i in range(NV):
            if i != 0:
                lane = self.laneID[i]
                mi = self.models[lane].m
                hi = np.zeros(mi)
                for j in range(mi):
                    hcol = np.asarray(veh_col(
                        x1, xx_set[i][:, j * n:(j + 1) * n],
                        (cons.L + 1, cons.W + 0.2), clip=5.0))
                    if lane == 0:
                        hlane = np.asarray(lane_bdry_h(
                            xx_set[i][:, j * n:(j + 1) * n], self.LB[0], self.LB[1]))
                        hi[j] = float(np.min(np.append(hcol, hlane)))
                    else:
                        hi[j] = float(np.min(hcol))
                self.veh_set[i].backupidx = int(np.argmax(hi))
            # reference quirk: the backup choice is immediately overridden
            # (Highway_env_branch.py:346)
            self.veh_set[i].backupidx = 0
            u0_set[i] = self._model_u(self.laneID[i], self.veh_set[i].backupidx,
                                      self.veh_set[i].state)

        x = self.veh_set[0].state
        if self.laneID[0] == 0:
            S = np.eye(4)
            xRef = np.array([0., (self.N_lane - 0.5) * 3.6, V0, 0.])
            # the reference passes the DEFAULT bx explicitly post-switch
            # (Highway_env_branch.py:352) — passing None instead would leave a
            # keep-last-bx solver (oracle; reference ``if not bx is None``
            # semantics, MPC_branch.py:2058) on the stale ramp-frame bx
            bx = np.asarray(self.mpc.params.bx, float).ravel()
        else:
            y0 = float(self.refY(x[0]))
            psi0 = float(self.refpsi(x[0]))
            S = np.array([[1., 0, 0, 0], [-np.tan(psi0), 1., 0, 0],
                          [0, 0, 1, 0], [0, 0, 0, 1]])
            xRef = np.array([0., -np.tan(psi0) * x[0] + y0 + 1.8, V0, psi0])
            bx = np.array([
                -np.tan(psi0) * x[0] + y0 + 3.6 * self.merge_lane - cons.W / 2,
                np.tan(psi0) * x[0] - y0 - cons.W / 2,
                psi0 + self.mpc.psimax,
                -psi0 + self.mpc.psimax,
            ])
        # NOTE: like the reference, the MPC keeps the lane-0 predictive model
        # throughout (``mpc = BranchMPC_CVaR(mpcParam, pred_model[0], ...)``,
        # ``main_branch.py:87`` — it is never switched on lane change)
        self.mpc.solve(x, self.veh_set[1].state, xRef, S=S, bx=bx)

        u_set[0] = self.mpc.uPred[0]
        xPred, zPred, uPred, branch_w = self.mpc.BT2array()
        self.veh_set[0].step(u_set[0])
        x_set[0] = self.veh_set[0].state
        for i in range(1, NV):
            u_set[i] = u0_set[i]
            self.veh_set[i].step(u_set[i])
            x_set[i] = self.veh_set[i].state
        return u_set, x_set, xx_set, xPred, zPred, branch_w
