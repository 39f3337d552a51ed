"""Batched dynamics linearization.

TPU-native replacement for the reference's per-node CasADi Jacobian calls
(``dyn_linearization``, ``highway_branch_dyn.py:284-291``): exact Jacobians of the
discrete Euler step via ``jax.jacfwd``, evaluated for *all* tree nodes in one batched
call instead of ~100 sequential CasADi ``Function`` invocations per MPC step
(hot loop A, SURVEY.md §3.1).
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp


def discrete_step(dyn: Callable, x, u, dt: float):
    """Forward-Euler discrete dynamics ``x⁺ = x + f(x, u)·dt``."""
    return x + dyn(x, u) * dt


def linearize_dynamics(dyn: Callable, x, u, dt: float):
    """Linearize ``x⁺ = A x + B u + C`` about ``(x, u)``.

    Returns ``(A, B, C, xp)`` exactly as the reference's ``dyn_linearization``
    (``highway_branch_dyn.py:284-291``): ``C = xp − A·x − B·u``.

    ``x`` may have leading batch dimensions; the Jacobians are computed with
    ``jacfwd`` (n, d small → forward mode optimal) and vmapped over the batch.
    """
    x = jnp.asarray(x)
    u = jnp.asarray(u)
    f = partial(discrete_step, dyn, dt=dt)

    def single(xi, ui):
        A = jax.jacfwd(f, argnums=0)(xi, ui)
        B = jax.jacfwd(f, argnums=1)(xi, ui)
        xp = f(xi, ui)
        C = xp - A @ xi - B @ ui
        return A, B, C, xp

    if x.ndim == 1:
        return single(x, u)
    batch_shape = x.shape[:-1]
    xf = x.reshape((-1, x.shape[-1]))
    uf = u.reshape((-1, u.shape[-1]))
    A, B, C, xp = jax.vmap(single)(xf, uf)
    n = x.shape[-1]
    d = u.shape[-1]
    return (
        A.reshape(batch_shape + (n, n)),
        B.reshape(batch_shape + (n, d)),
        C.reshape(batch_shape + (n,)),
        xp.reshape(batch_shape + (n,)),
    )
