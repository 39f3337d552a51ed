"""Safety (barrier) functions.

h ≥ 0 ⇔ safe. All functions are pure jnp, differentiable, and vmappable.

The reference implements each of these twice — a CasADi symbolic path used inside the
MPC (no clipping) and a NumPy path used by the environment (with ``clip(±5)``)
(``highway_branch_dyn.py:223-254``). Both behaviors are preserved via the ``clip``
argument; the quadruped collision likewise has a 1-norm symbolic path vs a 2-norm
numeric path (``quadruped_branch_dyn.py:135-150``) selected by ``ord``.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from belief_planning_tpu.ops.softmath import softmin


def _expblend(dx, dy, alpha):
    """Exp-weighted blend ``(dx·e^{αdx} + dy·e^{αdy}) / (e^{αdx} + e^{αdy})`` —
    a two-way soft max (reference ``highway_branch_dyn.py:234``). Stabilized by
    subtracting the max exponent."""
    tx = alpha * dx
    ty = alpha * dy
    t = jnp.maximum(tx, ty)
    ex = jnp.exp(tx - t)
    ey = jnp.exp(ty - t)
    return (dx * ex + dy * ey) / (ex + ey)


def veh_col(x1, x2, size, alpha=1.0, clip: Optional[float] = None,
            normalize: bool = False):
    """Smooth rectangle-collision margin between two vehicle states.

    ``dx = |X1−X2| − size[0]``, ``dy = |Y1−Y2| − size[1]``, blended with a soft max:
    positive iff the rectangles (inflated to ``size``) do not overlap on at least one
    axis. Reference ``veh_col`` (``highway_branch_dyn.py:223-254``); pass
    ``clip=5.0`` for the reference's numeric-path behavior, ``clip=None`` for the
    symbolic path used inside the MPC. ``normalize=True`` divides each margin by
    its size — the HMM-path variant (``HMM_backup_dyn.py:136-156``).

    ``x1, x2`` are states ``(..., ≥2)``; leading dims broadcast.
    """
    x1 = jnp.asarray(x1)
    x2 = jnp.asarray(x2)
    dx = jnp.abs(x1[..., 0] - x2[..., 0]) - size[0]
    dy = jnp.abs(x1[..., 1] - x2[..., 1]) - size[1]
    if normalize:
        dx = dx / size[0]
        dy = dy / size[1]
    if clip is not None:
        dx = jnp.clip(dx, -clip, clip)
        dy = jnp.clip(dy, -clip, clip)
    return _expblend(dx, dy, alpha)


def lane_bdry_h(x, lb=0.0, ub=7.2, gamma=5.0):
    """Soft distance to the road boundaries: ``softmin(y−lb, ub−y; γ=5)``.

    Reference ``lane_bdry_h`` (``highway_branch_dyn.py:195-214``).
    ``x`` is a state ``(..., ≥2)``; returns shape ``(...)``.
    """
    x = jnp.asarray(x)
    y = x[..., 1]
    return softmin(jnp.stack([y - lb, ub - y], axis=0), gamma, axis=0)


def robot_col(x1, x2, L1, W1, L2, W2, tol, ord=1):
    """Quadruped center-distance collision margin.

    ``‖p1 − p2‖ − (L1+L2)/2 − tol``. Reference ``robot_col``
    (``quadruped_branch_dyn.py:135-150``) — NOTE the reference uses the 1-norm in the
    symbolic/MPC path (``norm_1``) but the 2-norm in the numeric/env path
    (``np.linalg.norm``); select with ``ord``.
    """
    x1 = jnp.asarray(x1)
    x2 = jnp.asarray(x2)
    diff = x1[..., 0:2] - x2[..., 0:2]
    if ord == 1:
        dist = jnp.sum(jnp.abs(diff), axis=-1)
    else:
        dist = jnp.sqrt(jnp.sum(diff * diff, axis=-1))
    return dist - (L1 + L2) / 2.0 - tol


def robot_col_corners(x1, x2, L1, W1, L2, W2, tol, alpha=1.0):
    """Richer rotated-rectangle corner-based margin (reference ``robot_col1``,
    ``quadruped_branch_dyn.py:92-133``; unused by the reference demos but part of
    the capability surface).

    Transforms 6 sample points of robot 2's body outline into robot 1's body frame
    and soft-mins the per-point rectangle margins.
    """
    x1 = jnp.asarray(x1)
    x2 = jnp.asarray(x2)
    corners = jnp.array(
        [
            [L2 / 2, W2 / 2],
            [L2 / 2, -W2 / 2],
            [-L2 / 2, W2 / 2],
            [-L2 / 2, -W2 / 2],
            [0.0, -W2 / 2],
            [0.0, W2 / 2],
        ]
    )
    th1 = x1[..., 2]
    th2 = x2[..., 2]
    d0 = x2[..., 0:2] - x1[..., 0:2]

    def rot(theta):
        c = jnp.cos(theta)
        s = jnp.sin(theta)
        return jnp.stack(
            [jnp.stack([c, -s], axis=-1), jnp.stack([s, c], axis=-1)], axis=-2
        )

    T1 = rot(-th1)
    T2 = rot(th2)
    # corners in world offset, then into robot-1 frame
    pts2 = jnp.einsum("...ij,kj->...ki", T2, corners) + d0[..., None, :]
    pts1 = jnp.einsum("...ij,...kj->...ki", T1, pts2)
    dx = jnp.abs(pts1[..., 0]) - L1 / 2.0 - tol
    dy = jnp.abs(pts1[..., 1]) - W1 / 2.0 - tol
    h_pts = _expblend(dx, dy, alpha)
    return softmin(h_pts, 3.0, axis=-1)
