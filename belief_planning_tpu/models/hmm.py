"""HMM belief predictive model (rebuilt working).

Equivalent of the reference ``HMM_backup_dyn.py`` (which is import-broken in the
snapshot: it imports ``HMM_constants`` that ``utils.py`` never defines,
``HMM_backup_dyn.py:5``). The ego plans over a belief-augmented state
``xb = (x, b)`` where ``b (M, m)`` is a belief over each uncontrolled agent's
backup policy; belief dynamics are an HMM transition driven by per-policy safety
(``backup_trans``, ``HMM_backup_dyn.py:96-101``), and collision constraints are
belief-gated in the controller.

All functions are pure jnp with exact ``jacfwd`` Jacobians of the full augmented
system (the reference differentiates the same graph with CasADi).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from belief_planning_tpu.models.dynamics import dubins
from belief_planning_tpu.models.safety import lane_bdry_h, veh_col
from belief_planning_tpu.ops.softmath import softmin_pair, softsat


def backup_trans(h, cons):
    """HMM transition matrix from per-policy safety ``h (m,)``:
    ``H = (1−tran_diag)·1·(softsat(h,s1)ᵀ/Σ) + tran_diag·I``
    (reference ``backup_trans``, ``HMM_backup_dyn.py:96-101``)."""
    m = softsat(h, cons.s1)
    row = m / jnp.sum(m)
    mm = h.shape[0]
    return (1.0 - cons.tran_diag) * jnp.ones((mm, 1)) * row[None, :] + (
        cons.tran_diag * jnp.eye(mm)
    )


def backup_input_prob(cbfcond, cons):
    """Observation weight P(u | CBF condition) (``HMM_backup_dyn.py:103-104``)."""
    return softsat(cbfcond - cons.c2, cons.s2)


@dataclass(frozen=True)
class HMMPredictiveModel:
    """Belief-augmented predictive model (reference ``PredictiveModel``,
    ``HMM_backup_dyn.py:177-276``).

    State layout: ``xb = [x (nx,), b.ravel() (M·m,)]``; n = nx + M·m.
    ``xbackup`` is an ``(M·m, nx)`` array of the obstacles' per-policy predicted
    states at the current step (the controller slices a per-step block out of
    the rolled-out backup trajectories).
    """

    nx: int
    d: int
    M: int
    m: int
    dt: float
    cons: object = field(repr=False)
    policy_fns: Tuple[Callable, ...] = field(repr=False)
    policy_params: Tuple = field(repr=False)

    @property
    def n(self) -> int:
        return self.nx + self.M * self.m

    def split(self, xb):
        x = xb[: self.nx]
        b = xb[self.nx:].reshape(self.M, self.m)
        return x, b

    def safety(self, xb, xbackup):
        """Per-obstacle, per-policy safety ``h (M, m)``: softmin of the ego–
        backup-state collision margin and the backup state's lane margin
        (``HMM_backup_dyn.py:250-255``)."""
        x, _ = self.split(xb)
        c = self.cons

        def h_one(xbk_row):
            # HMM path uses the size-normalized margin (HMM_backup_dyn.py:140-142)
            hcol = veh_col(x, xbk_row, (c.L + 1.0, c.W + 0.2), normalize=True)
            hlane = lane_bdry_h(xbk_row, c.ylb, c.yub)
            return softmin_pair(hcol, hlane, c.col_alpha)

        h = jax.vmap(h_one)(xbackup)          # (M·m,)
        return h.reshape(self.M, self.m)

    def step(self, xb, u, xbackup):
        """Augmented dynamics: Euler ego step + HMM belief update
        (``HMM_backup_dyn.py:243-264``)."""
        x, b = self.split(xb)
        xp = x + dubins(x, u) * self.dt
        h = self.safety(xb, xbackup)

        def upd(bi, hi):
            return bi @ backup_trans(hi, self.cons)

        bp = jax.vmap(upd)(b, h)
        return jnp.concatenate([xp, bp.reshape(-1)])

    def linearize(self, xb, u, xbackup):
        """``(A, B, C, h0, Jh)`` — Jacobians of the augmented step and the
        linearized safety rows (reference ``regressionAndLinearization``,
        ``HMM_backup_dyn.py:216-237``): ``h0 = h − Jh·xb``."""
        A = jax.jacfwd(self.step, argnums=0)(xb, u, xbackup)
        B = jax.jacfwd(self.step, argnums=1)(xb, u, xbackup)
        xbp = self.step(xb, u, xbackup)
        C = xbp - A @ xb - B @ u

        hfun = lambda xx: self.safety(xx, xbackup).reshape(-1)
        h = hfun(xb)
        Jh = jax.jacfwd(hfun)(xb)             # (M·m, n)
        h0 = h - Jh @ xb
        return A, B, C, h0.reshape(self.M, self.m), Jh.reshape(self.M, self.m, self.n)

    def generate_backup_traj(self, z_all, N):
        """Roll each obstacle under each policy for N steps: ``(N, M·m, nx)``
        (reference ``generate_backup_traj``, ``HMM_backup_dyn.py:204-214``;
        trajectory only — sensitivity matrices live in the env's CBF layer)."""

        def roll(z0, fn, p):
            def stepf(x, _):
                xn = x + dubins(x, fn(x, p)) * self.dt
                return xn, xn

            _, xs = jax.lax.scan(stepf, z0, None, length=N)
            return xs

        rows = []
        for i in range(self.M):
            for j in range(self.m):
                rows.append(roll(z_all[i], self.policy_fns[j], self.policy_params[j]))
        return jnp.stack(rows, axis=1)        # (N, M·m, nx)


def backup_traj_with_sensitivity(dyn_closed, x0, N, dt, f0):
    """Rollout with sensitivity matrices for the CBF obstacle layer:
    ``Q̇ = J·Q`` Euler, ``Qt = ẋ − f0`` (reference ``generate_backup_traj``
    with ``sensitivity=True``, ``HMM_backup_dyn.py:54-85``).

    Returns (xs (N, nx), QQ (N, nx, nx), Qt (N, nx)) recorded BEFORE each step,
    matching the reference (state, sensitivity at entry of each step).
    """
    nx = x0.shape[0]

    def stepf(carry, _):
        x, Qm = carry
        xdot = dyn_closed(x)
        J = jax.jacfwd(dyn_closed)(x)
        out = (x, Qm, xdot - f0)
        x_new = x + xdot * dt
        Q_new = Qm + (J @ Qm) * dt
        return (x_new, Q_new), out

    (_, _), (xs, QQ, Qt) = jax.lax.scan(
        stepf, (x0, jnp.eye(nx)), None, length=N
    )
    return xs, QQ, Qt
