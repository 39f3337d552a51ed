"""Predictive models: dynamics + backup rollouts + branch probabilities + safety.

TPU-native equivalent of the reference's CasADi ``PredictiveModel`` classes
(``highway_branch_dyn.py:262-502``, ``quadruped_branch_dyn.py:154-248``). Instead of
building a symbolic graph once and evaluating ``casadi.Function`` objects node by
node, every method here is a pure jittable/vmappable function; Jacobians come from
``jax.jacfwd`` and are exact. Policy parameters (including the lane-change target
that forces the reference to rebuild its whole graph mid-simulation,
``highway_branch_dyn.py:331-334``) are runtime arguments.

API parity map (reference → here):
- ``dyn_linearization(x,u) → (A,B,C,xp)``   → :meth:`PredictiveModel.linearize`
- ``zpred_eval(z) → (N, m·n)``              → :meth:`PredictiveModel.zpred` (m,N,n)
- ``xpred_eval(x)``                          → :meth:`PredictiveModel.xpred`
- ``branch_eval(x,z) → (p, dp)``            → :meth:`PredictiveModel.branch_eval`
- ``col_eval(x,z) → (h−dh·x, dh)``          → :meth:`PredictiveModel.col_eval`
- ``update_backup(backupcons)``              → pass new ``policy_params`` (no rebuild)
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp

from belief_planning_tpu.ops.linearize import linearize_dynamics
from belief_planning_tpu.ops.rollout import rollout_policy
from belief_planning_tpu.ops.softmath import softmin, softsat
from belief_planning_tpu.models import safety
from belief_planning_tpu.models.policies import PolicySet


@dataclass(frozen=True)
class PredictiveModel:
    """Static model definition. All heavy state is in the pure functions below.

    Fields:
      dyn:        continuous dynamics ``f(x, u) -> xdot``
      n, d, N:    state/input dims, per-branch horizon
      dt:         step
      policy_fns: tuple of backup-policy fns (static); params are call arguments
      bf_traj:    trajectory-safety ``(obs_traj (N,n), ego_traj (N,n)) -> scalar``
      pair_h:     pairwise safety ``(x, z) -> scalar`` (the linearized constraint)
      prob_from_h: branch probability ``(h (m,)) -> p (m,)``
    """

    dyn: Callable = field(repr=False)
    n: int
    d: int
    N: int
    dt: float
    policy_fns: Tuple[Callable, ...] = field(repr=False)
    bf_traj: Callable = field(repr=False)
    pair_h: Callable = field(repr=False)
    prob_from_h: Callable = field(repr=False)

    @property
    def m(self) -> int:
        return len(self.policy_fns)

    # -- dynamics ----------------------------------------------------------

    def step(self, x, u):
        """Discrete Euler step ``x⁺ = x + f(x,u)·dt``."""
        return x + self.dyn(x, u) * self.dt

    def linearize(self, x, u):
        """``(A, B, C, xp)`` with ``C = xp − A x − B u``; batched over leading dims.

        Reference ``dyn_linearization`` (``highway_branch_dyn.py:284-291``).
        """
        return linearize_dynamics(self.dyn, x, u, self.dt)

    # -- rollouts ----------------------------------------------------------

    def zpred(self, z, policy_params):
        """Obstacle rollouts under all m policies: ``(m, N, n)``.

        Reference ``zpred_eval`` (``highway_branch_dyn.py:310-312``; there laid out
        as ``(N, m·n)``).
        """
        rows = [
            rollout_policy(self.dyn, fn, z, p, self.N, self.dt)
            for fn, p in zip(self.policy_fns, policy_params)
        ]
        return jnp.stack(rows, axis=0)

    def xpred(self, x, policy_params):
        """Ego rollout under policy 0 (maintain): ``(N, n)``.

        Reference ``xpred_eval`` (``highway_branch_dyn.py:314-315``).
        """
        return rollout_policy(
            self.dyn, self.policy_fns[0], x, policy_params[0], self.N, self.dt
        )

    def u0(self, x, policy_params):
        """Policy-0 input at ``x`` (reference ``u0sym``)."""
        return self.policy_fns[0](x, policy_params[0])

    # -- branch probabilities ---------------------------------------------

    def branch_h(self, x, z, policy_params):
        """Per-policy trajectory safety ``hi (m,)`` (reference ``calc_xp_expr``
        loop, ``highway_branch_dyn.py:379-382``)."""
        x1 = self.xpred(x, policy_params)          # ego maintain rollout
        x2 = self.zpred(z, policy_params)          # (m, N, n) obstacle rollouts
        return jnp.stack([self.bf_traj(x2[i], x1) for i in range(self.m)])

    def branch_p(self, x, z, policy_params):
        return self.prob_from_h(self.branch_h(x, z, policy_params))

    def branch_eval(self, x, z, policy_params):
        """``(p (m,), dp (m,n))`` — probabilities and their Jacobian w.r.t. the ego
        state (reference ``branch_eval``, ``highway_branch_dyn.py:298-301``)."""
        f = lambda xx: self.branch_p(xx, z, policy_params)
        return f(x), jax.jacfwd(f)(x)

    # -- collision constraint ---------------------------------------------

    def col_eval(self, x, z):
        """``(h − dh·x, dh)`` — the linearized safety constraint pieces exactly as
        the reference returns them (``highway_branch_dyn.py:322-325``)."""
        h = self.pair_h(x, z)
        dh = jax.grad(self.pair_h, argnums=0)(x, z)
        return h - jnp.dot(dh, x), dh

    def col_raw(self, x, z):
        """``(h, dh)`` without the linearization shift."""
        h = self.pair_h(x, z)
        dh = jax.grad(self.pair_h, argnums=0)(x, z)
        return h, dh


# ---------------------------------------------------------------------------
# Factories
# ---------------------------------------------------------------------------


def _branch_prob_softsat(h, s1):
    """p = normalize(exp(s1·softsat(h, 1))) — highway variant (paper eq. 11,
    ``highway_branch_dyn.py:355-359``)."""
    hs = softsat(h, 1.0)
    e = jnp.exp(s1 * (hs - jnp.max(hs)))
    return e / jnp.sum(e)


def _branch_prob_plain(h, s1):
    """p = normalize(exp(s1·h)) — quadruped variant (``quadruped_branch_dyn.py:
    212-216``; its softsat is commented out)."""
    e = jnp.exp(s1 * (h - jnp.max(h)))
    return e / jnp.sum(e)


def highway_model(cons, pset: PolicySet, N: int, dt: float, N_lane: int = 3) -> PredictiveModel:
    """Highway overtake model (reference ``PredictiveModel``,
    ``highway_branch_dyn.py:262-398``).

    NOTE: the reference constructs this with the default ``N_lane=3`` in the overtake
    demo even though the env has 4 lanes (``main_branch.py:41``) — keep the default
    for parity. Trajectory safety blends vehicle collision (size ``[L+2, W+0.2]``)
    with the obstacle's lane-boundary margin over all N steps, softmin γ=5
    (``BF_traj``, ``highway_branch_dyn.py:337-349``); the pairwise constraint uses
    size ``[L+1, W+0.2]`` (``highway_branch_dyn.py:386``).
    """
    from belief_planning_tpu.models.dynamics import dubins

    LB = (cons.W / 2.0, N_lane * 3.6 - cons.W / 2.0)
    size_bf = (cons.L + 2.0, cons.W + 0.2)
    size_h = (cons.L + 1.0, cons.W + 0.2)

    def bf_traj(obs_traj, ego_traj):
        hcol = safety.veh_col(obs_traj, ego_traj, size_bf, alpha=1.0)   # (N,)
        hlane = safety.lane_bdry_h(obs_traj, LB[0], LB[1])              # (N,)
        return softmin(jnp.concatenate([hcol, hlane]), 5.0)

    def pair_h(x, z):
        return safety.veh_col(x, z, size_h, alpha=1.0)

    return PredictiveModel(
        dyn=dubins,
        n=4,
        d=2,
        N=N,
        dt=dt,
        policy_fns=pset.fns,
        bf_traj=bf_traj,
        pair_h=pair_h,
        prob_from_h=partial(_branch_prob_softsat, s1=cons.s1),
    )


def merge_model(cons, pset: PolicySet, N: int, dt: float) -> PredictiveModel:
    """Merge-lane model (reference ``PredictiveModel_merge``,
    ``highway_branch_dyn.py:400-502``): trajectory safety uses vehicle collision
    only (size ``[L+1, W+0.2]``, no lane rows, ``highway_branch_dyn.py:461-465``);
    the ref-line lookup lives inside the policy params (``RefLine``)."""
    from belief_planning_tpu.models.dynamics import dubins

    size = (cons.L + 1.0, cons.W + 0.2)

    def bf_traj(obs_traj, ego_traj):
        hcol = safety.veh_col(obs_traj, ego_traj, size, alpha=1.0)
        return softmin(hcol, 5.0)

    def pair_h(x, z):
        return safety.veh_col(x, z, size, alpha=1.0)

    return PredictiveModel(
        dyn=dubins,
        n=4,
        d=2,
        N=N,
        dt=dt,
        policy_fns=pset.fns,
        bf_traj=bf_traj,
        pair_h=pair_h,
        prob_from_h=partial(_branch_prob_softsat, s1=cons.s1),
    )


def quadruped_model(cons, pset: PolicySet, N: int, dt: float) -> PredictiveModel:
    """Quadruped model (reference ``quadruped_branch_dyn.py:154-248``): 1-norm
    center-distance collision (symbolic-path semantics), softmin γ=5 over the
    horizon, branch probabilities WITHOUT softsat."""
    from belief_planning_tpu.models.dynamics import quad_kinematics

    def bf_traj(obs_traj, ego_traj):
        h = safety.robot_col(
            obs_traj, ego_traj, cons.L1, cons.W1, cons.L2, cons.W2, cons.col_tol, ord=1
        )
        return softmin(h, 5.0)

    def pair_h(x, z):
        return safety.robot_col(
            x, z, cons.L1, cons.W1, cons.L2, cons.W2, cons.col_tol, ord=1
        )

    return PredictiveModel(
        dyn=quad_kinematics,
        n=3,
        d=3,
        N=N,
        dt=dt,
        policy_fns=pset.fns,
        bf_traj=bf_traj,
        pair_h=pair_h,
        prob_from_h=partial(_branch_prob_plain, s1=cons.s1),
    )
