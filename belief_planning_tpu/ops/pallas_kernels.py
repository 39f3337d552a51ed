"""Pallas TPU kernels for solver hot spots.

Currently: a fused batched second-order-cone projection (used by the CVaR cone
ADMM's z-update, one cone per tree stage — thousands of small cones per step).
The jnp path materializes the norm, three masks and two blends as separate
HBM-level ops; the kernel fuses them into one VMEM pass over a (rows, k) tile.

On non-TPU backends (tests run on CPU) the kernel runs in interpreter mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # TPU-only module; absent on CPU builds is fine (interpret mode)
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False


def _soc_kernel(v_ref, out_ref):
    v = v_ref[:]                                   # (rows, k)
    t = v[:, 0]
    u = v[:, 1:]
    nu = jnp.sqrt(jnp.sum(u * u, axis=1))
    inside = nu <= t
    below = nu <= -t
    a = 0.5 * (1.0 + t / jnp.maximum(nu, 1e-30))
    out_t = jnp.where(inside, t, jnp.where(below, 0.0, a * nu))
    scale = jnp.where(inside, 1.0, jnp.where(below, 0.0, a))
    out_ref[:] = jnp.concatenate(
        [out_t[:, None], u * scale[:, None]], axis=1
    )


def proj_soc_pallas(v, block_rows: int = 256, interpret: bool | None = None):
    """Project rows of ``v (B, k)`` onto the SOC {(t, u): ‖u‖ ≤ t}.

    Matches ``solvers.cvar._proj_soc_batch`` exactly; fused in VMEM on TPU.
    """
    B, k = v.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    rows = min(block_rows, B)
    grid = (pl.cdiv(B, rows),)
    kwargs = {}
    if _HAS_PLTPU and not interpret:
        kwargs = dict(
            in_specs=[pl.BlockSpec((rows, k), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((rows, k), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        )
    else:
        kwargs = dict(
            in_specs=[pl.BlockSpec((rows, k), lambda i: (i, 0))],
            out_specs=pl.BlockSpec((rows, k), lambda i: (i, 0)),
        )
    return pl.pallas_call(
        _soc_kernel,
        out_shape=jax.ShapeDtypeStruct((B, k), v.dtype),
        grid=grid,
        interpret=interpret,
        **kwargs,
    )(v)
