"""Highway overtake environment (closed-loop simulation).

Equivalent of the reference ``Highway_env_branch.py``: a 2+-vehicle highway where
the ego runs the branch-MPC controller and each uncontrolled vehicle picks the
safest backup policy by argmax over rollout safety, with random lane-change
intent. The environment loop is host-side NumPy (it is control logic, not a hot
path); all model evaluations (rollouts, safety) are the jitted JAX model calls.

Reference behaviors preserved:
- obstacle backup selection: ``argmax_j min(veh_col(ego_branch, obs_branch_j,
  [L+1, W+0.2]) ∪ lane_bdry(ego_branch))`` using the *numeric* (clipped) safety
  path (``Highway_env_branch.py:140-149``) — note the lane-boundary term is
  evaluated on the EGO branch (a reference quirk kept as-is);
- the applied obstacle input uses the *sim-path* brake constants (−5, γ=3)
  (``highway_branch_dyn.py:121``) while the MPC's scenario tree uses the
  symbolic-path constants (−7, γ=5);
- random lane-change intent every 10 steps w.p. 0.5 (``:121-133``), lane-target
  logic for the ego's lane-change backup (``:99-118``) — here a pure policy-param
  update, no model rebuild;
- overtake xRef switching (``:151-167``);
- vehicle respawn ``replace_veh`` (``Highway_env_branch.py:186-225``) with the
  same direction windows / adjacent-lane choice / 20-attempt collision-checked
  sampling; like the reference it does NOT reset ``desired_x`` for the
  respawned vehicle (quirk kept). The reference defines it on the branch env
  but only ever calls it from the HMM env loop (``Highway_env.py:224-228``);
  here ``respawn=True`` enables that loop's far-vehicle check (|Δs|>15 →
  respawn ahead, fallback anywhere) inside ``step``;
- NV>2: the reference's ``__init__`` indexes a fixed 2-row ``x0`` and crashes
  for NV>2 even though ``step`` handles any NV; here vehicles beyond the
  second are placed by the same collision-checked sampler (documented
  deviation, PARITY.md). The MPC/xRef interaction logic remains ego vs
  ``veh_set[1]`` exactly as in the reference;
- deterministic: all randomness flows from a seeded ``numpy.random.Generator``
  (the reference uses unseeded global RNG — SURVEY.md §4).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np

from belief_planning_tpu.models import policies as pol
from belief_planning_tpu.models.safety import lane_bdry_h, veh_col

V0 = 20.0           # nominal speed (reference Highway_env_branch.py:19)
LANE_WIDTH = 3.6


@dataclass
class Vehicle:
    """Ground-truth vehicle state with Euler integration
    (reference ``vehicle``, ``Highway_env_branch.py:28-41``)."""

    state: np.ndarray
    dt: float
    v_length: float = 4.0
    v_width: float = 2.4
    backupidx: int = 0
    laneidx: int = 0

    def step(self, u):
        x = self.state
        dxdt = np.array([x[2] * np.cos(x[3]), x[2] * np.sin(x[3]), u[0], u[1]])
        self.state = x + dxdt * self.dt


class HighwayEnv:
    """Highway overtake environment (reference ``Highway_env``,
    ``Highway_env_branch.py:46-225``)."""

    def __init__(self, NV, mpc, cons, lc_target, N_lane=6, seed=0,
                 respawn=False):
        self.dt = mpc.model.dt
        self.NV = NV
        self.N_lane = N_lane
        self.mpc = mpc
        self.cons = cons
        self.m = mpc.model.m
        self.LB = [self.cons.W / 2, N_lane * 3.6 - self.cons.W / 2]
        self.rng = np.random.default_rng(seed)
        self.respawn = respawn
        x0 = np.array([[0., 1.8, V0, 0.], [5., 5.4, V0, 0.]])
        self.veh_set: List[Vehicle] = [
            Vehicle(x0[i].copy(), dt=self.dt, laneidx=int(round((x0[i, 1] - 1.8) / 3.6)))
            for i in range(min(NV, 2))
        ]
        # NV>2: place extra vehicles with the replace_veh sampler (the
        # reference init crashes here — deviation documented in PARITY.md)
        for i in range(2, NV):
            self.veh_set.append(Vehicle(x0[1].copy(), dt=self.dt))
            if not self.replace_veh(i, 2):
                # crowded fallback: stagger behind the ego in the far lane
                lane = (i - 1) % N_lane
                self.veh_set[i] = Vehicle(
                    np.array([-8. * (i - 1), 1.8 + 3.6 * lane, V0, 0.]),
                    dt=self.dt, laneidx=lane)
        self.desired_x = [
            np.array([0., self.veh_set[i].state[1], V0, 0.]) for i in range(NV)
        ]
        self.lc_target = np.asarray(lc_target, float)
        # sim-path policy functions (numeric constants)
        self._sim_pset = pol.highway_policy_set(
            self.cons, self.lc_target, mpc_path=False
        )

    def _with_probability(self, P):
        return self.rng.uniform() <= P

    def replace_veh(self, idx, direction=2):
        """Respawn vehicle ``idx`` near the ego (reference
        ``Highway_env_branch.py:186-225``): direction 0 = ahead (+8..+13 m),
        1 = behind (−13..−5 m), else anywhere (±15 m); target lane adjacent to
        the ego's; ≤20 collision-checked draws. Like the reference, does not
        touch ``desired_x`` (the respawned vehicle keeps chasing its previous
        desired lane until the next lane-intent roll — quirk kept)."""
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
            lane = ego.laneidx - 1 if self._with_probability(0.5) else ego.laneidx + 1
        for _ in range(20):
            Y = (lane + 0.5) * LANE_WIDTH + self.rng.normal(0, 0.1)
            X = self.rng.random() * (UB - LB) + LB
            ok = all(
                not (abs(Y - self.veh_set[i].state[1]) <= 2.2
                     and abs(X - self.veh_set[i].state[0]) <= 5)
                for i in range(len(self.veh_set)) if i != idx
            )
            if ok:
                self.veh_set[idx] = Vehicle(
                    np.array([X, Y, ego.state[2], 0.]), dt=self.dt,
                    backupidx=0, laneidx=lane)
                return True
        return False

    def _sim_policy_u(self, idx, x):
        return np.asarray(self._sim_pset.fns[idx](x, self._sim_pset.params[idx]))

    def step(self, t_):
        """One closed-loop step (reference ``Highway_env.step``,
        ``Highway_env_branch.py:83-184``)."""
        NV, m, cons = self.NV, self.m, self.cons
        n = 4
        u_set = [None] * NV
        xx_set = [None] * NV
        u0_set = [None] * NV
        x_set = [None] * NV

        # 1. backup rollouts + lane bookkeeping
        for i in range(NV):
            z = self.veh_set[i].state
            zp = np.asarray(self.mpc.model.zpred(z, self.mpc.policy_params))
            xx_set[i] = np.concatenate([zp[j] for j in range(m)], axis=1)  # (N, m*n)
            newlane = int(round((z[1] - 1.8) / 3.6))
            if t_ == 0 or (
                newlane != self.veh_set[i].laneidx
                and abs(z[1] - 1.8 - 3.6 * newlane) < 1.4
            ):
                self.veh_set[i].laneidx = newlane
                self.desired_x[i][1] = 1.8 + newlane * 3.6
                if i == 1:
                    # retarget the ego's lane-change backup around the obstacle
                    l0, l1 = self.veh_set[0].laneidx, self.veh_set[1].laneidx
                    if l0 < l1:
                        tgt_lane = l1 - 1
                    elif l0 > l1:
                        tgt_lane = l1 + 1
                    else:
                        tgt_lane = l1 - 1 if l1 > 0 else l1 + 1
                    xRef_lc = np.array([0., 1.8 + 3.6 * tgt_lane, V0, 0.])
                    self.lc_target = xRef_lc
                    new_params = list(self.mpc.policy_params)
                    new_params[2] = pol.LaneChangeParams(x_target=xRef_lc)
                    self.mpc.update_policy_params(tuple(new_params))
                    self._sim_pset = pol.highway_policy_set(
                        cons, xRef_lc, mpc_path=False
                    )
            if t_ % 10 == 0 and i != 0:
                if self._with_probability(0.5):
                    li = self.veh_set[i].laneidx
                    if li == 0:
                        self.desired_x[i][1] = 5.4
                    elif li == self.N_lane - 1:
                        self.desired_x[i][1] = 1.8 + (self.N_lane - 2) * 3.6
                    elif self._with_probability(0.5):
                        self.desired_x[i][1] = 1.8 + (li - 1) * 3.6
                    else:
                        self.desired_x[i][1] = 1.8 + (li + 1) * 3.6

        # 2. obstacle backup selection (numeric/clipped path, lane rows on EGO)
        idx0 = self.veh_set[0].backupidx
        x1 = xx_set[0][:, idx0 * n:(idx0 + 1) * n]
        for i in range(NV):
            if i != 0:
                hi = np.zeros(m)
                for j in range(m):
                    hcol = np.asarray(
                        veh_col(
                            x1, xx_set[i][:, j * n:(j + 1) * n],
                            (cons.L + 1, cons.W + 0.2), clip=5.0,
                        )
                    )
                    hlane = np.asarray(lane_bdry_h(x1, self.LB[0], self.LB[1]))
                    hi[j] = float(np.min(np.append(hcol, hlane)))
                self.veh_set[i].backupidx = int(np.argmax(hi))
            u0_set[i] = self._sim_policy_u(
                self.veh_set[i].backupidx, self.veh_set[i].state
            )

        # 3. overtake xRef logic (Highway_env_branch.py:151-167)
        ego, obs = self.veh_set[0], self.veh_set[1]
        if ego.state[0] < obs.state[0]:
            Ydes = 1.8 + ego.laneidx * 3.6
        else:
            Ydes = obs.state[1]
        if abs(ego.state[1] - Ydes) < 1 and ego.state[0] > obs.state[0] + 3:
            vdes = V0
        else:
            vdes = obs.state[2] + 1 * (obs.state[0] + 1.5 - ego.state[0])
        xRef = np.array([0., Ydes, vdes, 0.])

        # 4. solve MPC, apply inputs
        self.mpc.solve(ego.state, obs.state, xRef)
        u_set[0] = self.mpc.uPred[0]
        xPred, zPred, uPred, branch_w = self.mpc.BT2array()
        ego.step(u_set[0])
        x_set[0] = ego.state
        for i in range(1, NV):
            u_set[i] = u0_set[i]
            self.veh_set[i].step(u_set[i])
            x_set[i] = self.veh_set[i].state
            # far-vehicle respawn (the HMM env loop's check, Highway_env.py:
            # 224-228, applied to the branch env's replace_veh when enabled)
            if self.respawn and abs(
                self.veh_set[i].state[0] - self.veh_set[0].state[0]
            ) > 15:
                if not self.replace_veh(i, 0):
                    self.replace_veh(i, 2)
                x_set[i] = self.veh_set[i].state
        return u_set, x_set, xx_set, xPred, zPred, branch_w


def highway_sim(env, T):
    """Fixed-step closed-loop driver + recorder (reference ``Highway_sim``,
    ``Highway_env_branch.py:393-445``). Returns the reference's record tuple."""
    collision = False
    dt = env.dt
    N = int(round(T / dt))
    state_rec = np.zeros([env.NV, N, 4])
    backup_rec = [[None] * N for _ in range(env.NV)]
    backup_choice_rec = [[None] * N for _ in range(env.NV)]
    xPred_rec = [None] * N
    zPred_rec = [None] * N
    branch_w_rec = [None] * N
    input_rec = np.zeros([env.NV, N, 2])
    for i in range(env.NV):
        state_rec[i][0] = env.veh_set[i].state
    t = 0
    while t < N:
        if not collision:
            for i in range(env.NV):
                for j in range(env.NV):
                    if i != j:
                        vi, vj = env.veh_set[i], env.veh_set[j]
                        dis = max(
                            abs(vi.state[0] - vj.state[0]) - 0.5 * (vi.v_length + vj.v_length),
                            abs(vi.state[1] - vj.state[1]) - 0.5 * (vi.v_width + vj.v_width),
                        )
                        if dis < 0:
                            collision = True
        u_set, x_set, xx_set, xPred, zPred, branch_w = env.step(t)
        xPred_rec[t] = xPred
        zPred_rec[t] = zPred
        branch_w_rec[t] = branch_w
        for i in range(env.NV):
            input_rec[i][t] = u_set[i]
            state_rec[i][t] = x_set[i]
            backup_rec[i][t] = xx_set[i]
            backup_choice_rec[i][t] = env.veh_set[i].backupidx
        t += 1
    return (
        state_rec, input_rec, backup_rec, backup_choice_rec,
        xPred_rec, zPred_rec, branch_w_rec, collision,
    )
