"""Batch-LAST layout helpers for the fused TPU solver kernels.

``vmap`` over a per-lane solver puts the batch axis FIRST, which leaves the
tiny (6,6)/(2,2) matrix dims in the minor (sublane, lane) positions of every
array. TPU tiles the last two dims to (8, 128), so a (B, 106, 6, 6) tensor
sits at 36/1024 ≈ 3.5% tile occupancy — a ~28× physical HBM inflation the
memory-bound Riccati sweeps would pay on every load/store. The fused kernels
(``tree_qp_pl``, ``cvar_pl``) therefore keep the batch axis LAST — (nodes, i,
j, B) with B a multiple of 128 — so lanes are 100% occupied and the small
matrix dims ride in the cheap major positions.

Measured history (kept from the retired scan-based ``tree_qp_bl`` solver,
v5e, B=2048, IPM-20): hand-forcing this layout through plain XLA einsums was
1340 solves/s vs 2327 for the straight vmapped solver — XLA inserts
transposes around each dot_general, and its own layout assignment already
handles the vmapped form better. The layout only wins where it is explicit
and transpose-free, i.e. inside a Pallas kernel: the fused-IPM kernel built
on these helpers reaches 37-39k solves/s (``tree_qp_pl``). So: use these
transforms at kernel boundaries; do NOT build batch-last einsum pipelines in
plain XLA.

Glossary: einsum subscript ``Z`` is the trailing batch axis; ``b`` remains
the node/stage axis as in ``tree_qp``.
"""

from __future__ import annotations

import jax.numpy as jnp

from belief_planning_tpu.solvers.tree_qp import StageCost


def _to_bl(a):
    """(B, ...) → (..., B)."""
    return jnp.moveaxis(a, 0, -1)


def _from_bl(a):
    """(..., B) → (B, ...)."""
    return jnp.moveaxis(a, -1, 0)


def cost_to_bl(cost: StageCost) -> StageCost:
    """Transpose a vmapped (batch-leading) StageCost to batch-last.

    ``slack_quad`` is a per-lane scalar under vmap → (B,) stays as-is."""
    return StageCost(
        Qx2=_to_bl(cost.Qx2), qx=_to_bl(cost.qx),
        Ru2=_to_bl(cost.Ru2), qu=_to_bl(cost.qu),
        Daa2=_to_bl(cost.Daa2), Dab2=_to_bl(cost.Dab2),
        Pterm2=_to_bl(cost.Pterm2), qterm=_to_bl(cost.qterm),
        slack_lin=_to_bl(cost.slack_lin), slack_quad=cost.slack_quad,
    )


def _small_inv_bl(M):
    """Closed-form inverse for (..., i, j, Z) tiny matrices (j ≤ 3)."""
    d = M.shape[-2]
    if d == 1:
        return 1.0 / M
    if d == 2:
        a = M[..., 0, 0, :]
        b = M[..., 0, 1, :]
        c = M[..., 1, 0, :]
        e = M[..., 1, 1, :]
        det = a * e - b * c
        row0 = jnp.stack([e, -b], axis=-2)
        row1 = jnp.stack([-c, a], axis=-2)
        inv = jnp.stack([row0, row1], axis=-3)
        return inv / det[..., None, None, :]
    if d == 3:
        a, b, c = M[..., 0, 0, :], M[..., 0, 1, :], M[..., 0, 2, :]
        e, f, g = M[..., 1, 0, :], M[..., 1, 1, :], M[..., 1, 2, :]
        h, i, j = M[..., 2, 0, :], M[..., 2, 1, :], M[..., 2, 2, :]
        A = f * j - g * i
        B = -(e * j - g * h)
        C = e * i - f * h
        det = a * A + b * B + c * C
        inv = jnp.stack([
            jnp.stack([A, -(b * j - c * i), b * g - c * f], axis=-2),
            jnp.stack([B, a * j - c * h, -(a * g - c * e)], axis=-2),
            jnp.stack([C, -(a * i - b * h), a * f - b * e], axis=-2),
        ], axis=-3)
        return inv / det[..., None, None, :]
    raise NotImplementedError("batch-last inverse only for d<=3")
