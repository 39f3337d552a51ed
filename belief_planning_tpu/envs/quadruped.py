"""Quadruped environment (closed-loop simulation).

Equivalent of the reference ``quadruped_env.py`` (and its near-duplicate
``quadruped_ROS_env.py``, which despite the name contains no ROS code —
SURVEY.md §2 #30): a 2-robot world where the ego runs BranchMPCProx toward a goal
and the pedestrian-like obstacle switches between forward/stop backups.

Preserved reference behaviors:
- sticky obstacle policy: keep 'forward' while its rollout safety > 0.5, else
  argmax (``quadruped_env.py:91-94``); safety evaluated with the *2-norm*
  numeric path (``robot_col`` numeric, ``quadruped_branch_dyn.py:149``) while
  the MPC's tree uses the 1-norm symbolic path;
- goal-seeking xRef: clipped 5 m step toward the goal with wrapped heading
  (``quadruped_env.py:100-114``); the ROS variant's
  ``arctan2(dx[0], dx[1])``+goal-as-ref rule (``quadruped_ROS_env.py:100-110``)
  is available via ``ref_mode="ros"`` (the argument-order quirk is preserved).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List

import numpy as np

from belief_planning_tpu.models.safety import robot_col


@dataclass
class Robot:
    """Ground-truth robot state (reference ``robot``, ``quadruped_env.py:24-38``)."""

    state: np.ndarray
    dt: float
    L: float = 1.0
    W: float = 0.5
    backupidx: int = 0

    def step(self, u):
        th = self.state[2]
        dxdt = np.array([
            u[0] * np.cos(th) - u[1] * np.sin(th),
            u[1] * np.cos(th) + u[0] * np.sin(th),
            u[2],
        ])
        self.state = self.state + dxdt * self.dt


class QuadEnv:
    """Reference ``Quad_env`` (``quadruped_env.py:41-130``)."""

    def __init__(self, NR, mpc, x_des, cons, ref_mode="default"):
        self.dt = mpc.model.dt
        self.NR = NR
        self.mpc = mpc
        self.cons = cons
        self.m = mpc.model.m
        self.ref_mode = ref_mode
        x0 = np.array([[0., 1.8, 0.], [2.5, 2.5, -np.pi / 2]])
        self.robot_set: List[Robot] = [
            Robot(x0[0].copy(), dt=self.dt, L=cons.L1, W=cons.W1)
        ]
        for i in range(1, NR):
            self.robot_set.append(Robot(x0[i].copy(), dt=self.dt, L=cons.L2, W=cons.W2))
        self.desired_x = [np.asarray(x_des, float)] + [x0[i].copy() for i in range(1, NR)]

    def _sim_policy_u(self, idx, x):
        pset_fns = self.mpc.model.policy_fns
        return np.asarray(pset_fns[idx](x, self.mpc.policy_params[idx]))

    def step(self, t_):
        NR, m, cons = self.NR, self.m, self.cons
        n = 3
        u_set = [None] * NR
        xx_set = [None] * NR
        u0_set = [None] * NR
        x_set = [None] * NR

        for i in range(NR):
            z = self.robot_set[i].state
            zp = np.asarray(self.mpc.model.zpred(z, self.mpc.policy_params))
            xx_set[i] = np.concatenate([zp[j] for j in range(m)], axis=1)

        idx0 = self.robot_set[0].backupidx
        x1 = xx_set[0][:, idx0 * n:(idx0 + 1) * n]
        for i in range(NR):
            if i != 0:
                hi = np.zeros(m)
                for j in range(m):
                    # numeric 2-norm path (quadruped_env.py:89)
                    hcol = np.asarray(
                        robot_col(
                            x1, xx_set[i][:, j * n:(j + 1) * n],
                            self.robot_set[0].L, self.robot_set[0].W,
                            self.robot_set[i].L, self.robot_set[i].W,
                            cons.col_tol, ord=2,
                        )
                    )
                    hi[j] = float(np.min(hcol))
                if hi[0] > 0.5:
                    self.robot_set[i].backupidx = 0   # sticky forward
                else:
                    self.robot_set[i].backupidx = int(np.argmax(hi))
            u0_set[i] = self._sim_policy_u(
                self.robot_set[i].backupidx, self.robot_set[i].state
            )

        # goal-seeking xRef
        ego = self.robot_set[0]
        dx = self.desired_x[0][0:2] - ego.state[0:2]
        nrm = np.linalg.norm(dx)
        if self.ref_mode == "ros":
            # quadruped_ROS_env.py:100-110 (note the arctan2 argument order quirk)
            dxc = dx / nrm * min(nrm, 5.0) if nrm > 0 else dx
            if np.linalg.norm(dxc) > 0.1:
                psiRef = np.arctan2(dxc[0], dxc[1])
                while psiRef - self.desired_x[0][2] > np.pi:
                    psiRef -= 2 * np.pi
                while psiRef - self.desired_x[0][2] < -np.pi:
                    psiRef += 2 * np.pi
            else:
                psiRef = ego.state[2]
            xRef = self.desired_x[0].copy()
            xRef[2] = psiRef
        else:
            dxc = dx / nrm * min(nrm, 5.0) if nrm > 0 else dx
            if np.linalg.norm(dxc) > 0.1:
                psiRef = np.arctan2(dxc[1], dxc[0])
                while psiRef - self.desired_x[0][2] > np.pi:
                    psiRef -= 2 * np.pi
                while psiRef - self.desired_x[0][2] < -np.pi:
                    psiRef += 2 * np.pi
            else:
                psiRef = ego.state[2]
            xRef = ego.state.copy()
            xRef[0:2] += dxc
            xRef[2] = psiRef

        self.mpc.solve(ego.state, self.robot_set[1].state, xRef)
        u_set[0] = self.mpc.uPred[0]
        xPred, zPred, uPred, branch_w = self.mpc.BT2array()
        ego.step(u_set[0])
        x_set[0] = ego.state
        for i in range(1, NR):
            u_set[i] = u0_set[i]
            self.robot_set[i].step(u_set[i])
            x_set[i] = self.robot_set[i].state
        return u_set, x_set, xx_set, xPred, zPred


def robot_sim(env, T):
    """Closed-loop driver + recorder (reference ``Robot_sim``,
    ``quadruped_env.py:133-164``)."""
    dt = env.dt
    N = int(round(T / dt))
    state_rec = np.zeros([env.NR, N, 3])
    backup_rec = [[None] * N for _ in range(env.NR)]
    backup_choice_rec = [[None] * N for _ in range(env.NR)]
    xPred_rec = [None] * N
    zPred_rec = [None] * N
    input_rec = np.zeros([env.NR, N, 3])
    for i in range(env.NR):
        state_rec[i][0] = env.robot_set[i].state
    t = 0
    while t < N:
        u_set, x_set, xx_set, xPred, zPred = env.step(t)
        xPred_rec[t] = xPred
        zPred_rec[t] = zPred
        for i in range(env.NR):
            input_rec[i][t] = u_set[i]
            state_rec[i][t] = x_set[i]
            backup_rec[i][t] = xx_set[i]
            backup_choice_rec[i][t] = env.robot_set[i].backupidx
        t += 1
    return state_rec, input_rec, backup_rec, backup_choice_rec, xPred_rec, zPred_rec
