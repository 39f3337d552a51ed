"""Continuous-time dynamics models.

Pure jnp functions ``f(x, u) -> xdot`` — the single source of truth for both
numeric simulation and (via ``jax.jacfwd``) linearization, replacing the reference's
triple-dispatch ndarray/SX/MX implementations (``highway_branch_dyn.py:17-34``,
``quadruped_branch_dyn.py:14-27``).
"""

from __future__ import annotations

import jax.numpy as jnp


def dubins(x, u):
    """Dubins/bicycle-abstraction vehicle: state ``(X, Y, v, ψ)``, input ``(a, r)``.

    ``ẋ = [v·cosψ, v·sinψ, a, r]`` — reference ``highway_branch_dyn.py:17-34``.
    """
    return jnp.stack(
        [x[2] * jnp.cos(x[3]), x[2] * jnp.sin(x[3]), u[0], u[1]]
    )


def quad_kinematics(x, u):
    """Quadruped body-frame kinematics: state ``(X, Y, θ)``, input ``(vx, vy, ω)``.

    ``ẋ = [vx·cosθ − vy·sinθ, vx·sinθ + vy·cosθ, ω]`` — reference
    ``quadruped_branch_dyn.py:14-27``.
    """
    c = jnp.cos(x[2])
    s = jnp.sin(x[2])
    return jnp.stack([u[0] * c - u[1] * s, u[0] * s + u[1] * c, u[2]])
