"""Soft-math kernels.

These reproduce the reference's exp-weighted soft operators exactly (NOT the usual
log-sum-exp smooth max): reference ``highway_branch_dyn.py:37-39`` (``softsat``),
``:151-162`` (``softmin``/``softmax``). They are plain elementwise/VPU math and fuse
into surrounding computations under jit.

Note the reference operators are *weighted averages* ``Σ e^{±γx} x / Σ e^{±γx}``,
which are smooth and lie between min(x) and max(x). For numerical robustness on
device we subtract the max exponent before exponentiation (mathematically identical;
the reference relies on small magnitudes and can overflow).
"""

from __future__ import annotations

import jax.numpy as jnp


def softsat(x, s):
    """Saturating squash to (0, 1): ``(e^{sx}-1)/(e^{sx}+1)*0.5 + 0.5``.

    Reference: ``highway_branch_dyn.py:38-39`` (paper eq. 11). Algebraically this is
    the logistic sigmoid of ``s*x``; evaluated via tanh for stability.
    """
    x = jnp.asarray(x)
    return 0.5 * (jnp.tanh(0.5 * s * x) + 1.0)


def softmin(x, gamma=1.0, axis=None):
    """Exp-weighted soft minimum: ``Σ e^{-γx} x / Σ e^{-γx}``.

    Reference: ``highway_branch_dyn.py:151-155``.
    """
    x = jnp.asarray(x)
    t = -gamma * x
    t = t - jnp.max(t, axis=axis, keepdims=axis is not None)
    w = jnp.exp(t)
    return jnp.sum(w * x, axis=axis) / jnp.sum(w, axis=axis)


def softmax(x, gamma=1.0, axis=None):
    """Exp-weighted soft maximum: ``Σ e^{γx} x / Σ e^{γx}``.

    Reference: ``highway_branch_dyn.py:158-162``.
    """
    x = jnp.asarray(x)
    t = gamma * x
    t = t - jnp.max(t, axis=axis, keepdims=axis is not None)
    w = jnp.exp(t)
    return jnp.sum(w * x, axis=axis) / jnp.sum(w, axis=axis)


def softmin_pair(a, b, gamma=1.0):
    """Two-argument softmin (reference ``HMM_backup_dyn.py:116-117``)."""
    return softmin(jnp.stack([jnp.asarray(a), jnp.asarray(b)], axis=0), gamma, axis=0)


def softmax_pair(a, b, gamma=1.0):
    """Two-argument softmax (reference ``HMM_backup_dyn.py:119-120``)."""
    return softmax(jnp.stack([jnp.asarray(a), jnp.asarray(b)], axis=0), gamma, axis=0)
