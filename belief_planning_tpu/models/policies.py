"""Backup-policy library.

Each policy is a pure function ``u = policy(x, params)`` with its parameters
(gains, velocity/heading targets, lane-change target state, reference-line tables)
passed as a *runtime* pytree. This is a deliberate departure from the reference,
where the lane-change target is baked into the CasADi graph and every target change
triggers a full symbolic rebuild (``highway_branch_dyn.py:331-334``,
``Highway_env_branch.py:117-118``); here a target change is just new data.

The reference has two inconsistent brake parameterizations: the symbolic path used
inside the MPC uses ``softmax([-7, -v], γ=5)`` while the numeric path used by the
environment simulation uses ``softmax([-5, -v], γ=3)`` (``highway_branch_dyn.py:
108-130``). Both are preserved: ``brake_params_mpc`` / ``brake_params_sim``.

A policy *set* is a tuple of (fn, params) pairs; the fns are static (compiled in),
the params flow through jit as arguments.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional, Sequence, Tuple

import jax.numpy as jnp

from belief_planning_tpu.ops.softmath import softmax_pair


class RefLine(NamedTuple):
    """Piecewise-linear reference-line lookup table (merge scenario).

    On-device replacement for ``casadi.interpolant`` (``main_branch.py:78-79``):
    ``jnp.interp`` gathers from a static table.
    """

    xs: Any  # (K,) knot X coordinates (ascending)
    ys: Any  # (K,) values (Y or psi)

    def __call__(self, x):
        return jnp.interp(x, self.xs, self.ys)


# ---------------------------------------------------------------------------
# Highway policies (state (X, Y, v, ψ), input (a, r))
# ---------------------------------------------------------------------------

class MaintainParams(NamedTuple):
    Kpsi: Any
    psiref: Optional[RefLine] = None


def maintain(x, p: MaintainParams):
    """Hold speed, P-control heading to 0 (or to the ref line heading).

    Reference ``backup_maintain`` (``highway_branch_dyn.py:54-78``). Note with a
    psiref the reference leaves ``u[0]`` unset (= 0).
    """
    psi0 = p.psiref(x[0]) if p.psiref is not None else 0.0
    return jnp.stack([jnp.zeros_like(x[0]), psi0 - p.Kpsi * x[3]])


class MaintainTrackVParams(NamedTuple):
    Kpsi: Any
    v0: Any
    psiref: Optional[RefLine] = None


def maintain_track_v(x, p: MaintainTrackVParams):
    """Hold speed toward ``v0`` with gain 0.5, P-control heading.

    Reference ``backup_maintain_trackV`` (``highway_branch_dyn.py:80-96``).
    """
    psi0 = p.psiref(x[0]) if p.psiref is not None else 0.0
    return jnp.stack([0.5 * (p.v0 - x[2]), psi0 - p.Kpsi * x[3]])


class BrakeParams(NamedTuple):
    Kpsi: Any
    a_brake: Any   # -7 (MPC/symbolic path) or -5 (sim/numeric path)
    gamma: Any     # 5 (MPC path) or 3 (sim path)
    psiref: Optional[RefLine] = None


def brake(x, p: BrakeParams):
    """Smooth brake: ``a = softmax_pair(a_brake, −v; γ)`` (saturates braking so the
    vehicle does not reverse), P-control heading.

    Reference ``backup_brake`` (``highway_branch_dyn.py:108-130``). NOTE the
    reference's psiref symbolic variant also uses the (-5, 3) constants; use
    ``brake_params_merge`` for that case.
    """
    psi0 = p.psiref(x[0]) if p.psiref is not None else 0.0
    a = softmax_pair(p.a_brake, -x[2], p.gamma)
    return jnp.stack([a, psi0 - p.Kpsi * x[3]])


def brake_params_mpc(Kpsi, psiref=None) -> BrakeParams:
    """Constants of the reference's SX symbolic path (``highway_branch_dyn.py:112``)."""
    if psiref is not None:
        # with a ref line the reference symbolic path uses the (-5, 3) constants
        # (highway_branch_dyn.py:125)
        return BrakeParams(Kpsi=Kpsi, a_brake=-5.0, gamma=3.0, psiref=psiref)
    return BrakeParams(Kpsi=Kpsi, a_brake=-7.0, gamma=5.0, psiref=None)


def brake_params_sim(Kpsi, psiref=None) -> BrakeParams:
    """Constants of the reference's numeric path (``highway_branch_dyn.py:121,130``)."""
    return BrakeParams(Kpsi=Kpsi, a_brake=-5.0, gamma=3.0, psiref=psiref)


class LaneChangeParams(NamedTuple):
    x_target: Any  # (4,) lane-change target state


def lane_change(x, p: LaneChangeParams):
    """LQR-like state feedback toward the target state.

    Reference ``backup_lc`` (``highway_branch_dyn.py:136-148``); the fixed gains are
    the reference's precomputed LQR gains.
    """
    t = p.x_target
    return jnp.stack(
        [
            -0.8558 * (x[2] - t[2]),
            -0.3162 * (x[1] - t[1]) - 3.9889 * (x[3] - t[3]),
        ]
    )


# ---------------------------------------------------------------------------
# Quadruped policies (state (X, Y, θ), input (vx, vy, ω))
# ---------------------------------------------------------------------------

class ForwardParams(NamedTuple):
    v0: Any


def quad_forward(x, p: ForwardParams):
    """Walk forward at ``v0`` (reference ``backup_forward``,
    ``quadruped_branch_dyn.py:34-44``)."""
    z = jnp.zeros_like(x[0])
    return jnp.stack([p.v0 + z, z, z])


def quad_stop(x, p=None):
    """Stop (reference ``backup_stop``, ``quadruped_branch_dyn.py:46-54``)."""
    z = jnp.zeros_like(x[0])
    return jnp.stack([z, z, z])


# ---------------------------------------------------------------------------
# Policy sets
# ---------------------------------------------------------------------------

PolicyFn = Callable[[Any, Any], Any]


class PolicySet(NamedTuple):
    """A backup-policy library: static fns + runtime params (one pytree per policy)."""

    fns: Tuple[PolicyFn, ...]
    params: Tuple[Any, ...]

    @property
    def m(self) -> int:
        return len(self.fns)

    def u(self, i: int, x):
        return self.fns[i](x, self.params[i])

    def with_params(self, params: Sequence[Any]) -> "PolicySet":
        return PolicySet(self.fns, tuple(params))


def highway_policy_set(cons, x_target, mpc_path: bool = True) -> PolicySet:
    """The overtake demo's [maintain, brake, lane-change] set (``main_branch.py:39``)."""
    brake_p = brake_params_mpc(cons.Kpsi) if mpc_path else brake_params_sim(cons.Kpsi)
    return PolicySet(
        fns=(maintain, brake, lane_change),
        params=(
            MaintainParams(Kpsi=cons.Kpsi),
            brake_p,
            LaneChangeParams(x_target=jnp.asarray(x_target)),
        ),
    )


def merge_policy_set(cons, v0, psiref: Optional[RefLine]) -> PolicySet:
    """The merge demo's [maintain_trackV, brake] set (``main_branch.py:82-83``)."""
    return PolicySet(
        fns=(maintain_track_v, brake),
        params=(
            MaintainTrackVParams(Kpsi=cons.Kpsi, v0=v0, psiref=psiref),
            brake_params_mpc(cons.Kpsi, psiref=psiref)
            if psiref is not None
            else brake_params_mpc(cons.Kpsi),
        ),
    )


def quadruped_policy_set(v0) -> PolicySet:
    """The quadruped demo's [forward, stop] set (``main_quadruped.py:30``)."""
    return PolicySet(
        fns=(quad_forward, quad_stop),
        params=(ForwardParams(v0=v0), None),
    )
