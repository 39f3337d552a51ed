"""Closed-loop policy rollouts as ``lax.scan``.

TPU-native replacement for the reference's Python Euler loop ``propagate_backup``
(``highway_branch_dyn.py:174-187``): N forward-Euler steps of ``x⁺ = x + f(x, π(x))·dt``
under a state-feedback backup policy. The scan is jit-compiled once per (policy, N)
and vmaps cleanly over batches of initial states / scenario trees.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def rollout_policy(dyn: Callable, policy: Callable, x0, params, N: int, dt: float):
    """Roll out ``x⁺ = x + dyn(x, policy(x, params))·dt`` for ``N`` steps.

    Returns the trajectory of the N *successor* states, shape ``(N, n)`` — matching
    the reference convention (``propagate_backup`` excludes the initial state,
    ``highway_branch_dyn.py:184-187``).
    """

    def step(x, _):
        u = policy(x, params)
        xn = x + dyn(x, u) * dt
        return xn, xn

    _, xs = jax.lax.scan(step, jnp.asarray(x0), None, length=N)
    return xs


def rollout_controls(dyn: Callable, x0, us, dt: float):
    """Open-loop rollout under a given control sequence ``us (N, d)``.

    Returns the N successor states ``(N, n)``. Used by the tree engine to re-roll
    ego branches under warm-started inputs (reference ``MPC_branch.py:1849-1856``).
    """

    def step(x, u):
        xn = x + dyn(x, u) * dt
        return xn, xn

    _, xs = jax.lax.scan(step, jnp.asarray(x0), jnp.asarray(us))
    return xs
