"""Tree-structured QP solver: Riccati factorization + OSQP-style ADMM.

This is the TPU-native replacement for the reference's dense-assembly + OSQP path
(``buildCost``/``buildEqConstr``/``buildIneqConstr`` + ``osqp_solve_qp``,
``MPC_branch.py:185-487``). The KKT matrices are never materialized:

- The *dynamics equality constraints* (including the shared-root parent→children
  coupling, ``MPC_branch.py:207-213``) are eliminated exactly by a Riccati sweep
  over the branch tree. The stage state is augmented to ξ = (x, u_prev) so the
  input-rate couplings (``dR``, incl. the cross-branch parent-last ↔ child-first
  terms, ``MPC_branch.py:291-297``) are plain stage costs.
- The *inequality rows* (linearized collision + Fx box per state node, Fu box per
  input node, slack positivity) are handled by ADMM à la OSQP: they are local to
  one stage, so the penalty term ρ·MᵀM stays inside the stage blocks and the
  Riccati *quadratic* factorization is constant across iterations. Each ADMM
  iteration is only a backward linear sweep + forward rollout (two O(totalu)
  scans of (n+d)-sized operations) plus elementwise projections.
- Slack variables (linear L1 cost ``Qslack[1]·w``, quadratic ``Qslack[0]``,
  ``MPC_branch.py:317-321``) are eliminated in closed form inside the v-update.

Cost convention: the solver works in standard ½-form, ``½vᵀP̂v + q̂ᵀv``, with
P̂ = 2·H_assembled matching the reference's "multiply by two because CVX considers
1/2" (``MPC_branch.py:325``) followed by OSQP's upper-triangle symmetrization.
Reference quirks are reproduced under ``replicate_quirks=True`` (default):
- the leaf branch's last input block is w·R only (the accumulated rate-coupling
  diagonal is overwritten, ``MPC_branch.py:303``);
- the root input block gains the triu-symmetrized *broadcast* of the dR vector
  (``MPC_branch.py:312``) and the scalar-broadcast OldInput linear term
  (``MPC_branch.py:311``).

All functions are single-tree; batch with ``jax.vmap`` over trees.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from belief_planning_tpu.tree.topology import TreeTopology
from belief_planning_tpu.tree.engine import TreeState




def _f32_precision(fn):
    """Force full-precision f32 matmuls: TPU's default bf16-multiply einsums are
    far too coarse for an iterative Riccati/ADMM solve."""
    def wrapped(*a, **k):
        with jax.default_matmul_precision("float32"):
            return fn(*a, **k)
    return wrapped



def _small_inv(M):
    """Closed-form inverse for batched tiny matrices (d ≤ 3): jnp.linalg.inv
    lowers to a generic LU path that is painfully slow inside TPU loops."""
    d = M.shape[-1]
    if d == 1:
        return 1.0 / M
    if d == 2:
        a = M[..., 0, 0]
        b = M[..., 0, 1]
        c = M[..., 1, 0]
        e = M[..., 1, 1]
        det = a * e - b * c
        inv = jnp.stack([
            jnp.stack([e, -b], axis=-1),
            jnp.stack([-c, a], axis=-1),
        ], axis=-2)
        return inv / det[..., None, None]
    if d == 3:
        a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
        e, f, g = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
        h, i, j = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
        A = f * j - g * i
        B = -(e * j - g * h)
        C = e * i - f * h
        det = a * A + b * B + c * C
        inv = jnp.stack([
            jnp.stack([A, -(b * j - c * i), b * g - c * f], axis=-1),
            jnp.stack([B, a * j - c * h, -(a * g - c * e)], axis=-1),
            jnp.stack([C, -(a * i - b * h), a * f - b * e], axis=-1),
        ], axis=-2)
        return inv / det[..., None, None]
    return jnp.linalg.inv(M)


def _gj_inv(M):
    """Gauss-Jordan inverse with partial pivoting, built from elementwise ops
    only (no LU). Exists because XLA:TPU implements LuDecomposition only for
    f32 — ``jnp.linalg.inv`` on float64 fails to compile on TPU, while the
    (emulated) f64 arithmetic itself is supported. Used for the small dense
    blocks of the f64-on-TPU CVaR path (≤ ~40×40); unrolls k elimination
    steps, so keep it off the hot f32 paths."""
    k = M.shape[-1]
    A = jnp.concatenate([M, jnp.eye(k, dtype=M.dtype)], axis=-1)
    rows = jnp.arange(k)
    for j in range(k):
        col = jnp.abs(A[:, j])
        p = jnp.argmax(jnp.where(rows >= j, col, -jnp.inf))
        perm = rows.at[j].set(p).at[p].set(j)
        A = A[perm]
        piv_row = A[j] / A[j, j]
        A = A.at[j].set(piv_row)
        factors = A[:, j].at[j].set(0.0)
        A = A - factors[:, None] * piv_row[None, :]
    return A[:, k:]


def small_dense_inv(M):
    """``jnp.linalg.inv`` where supported; Gauss-Jordan on TPU float64 (see
    :func:`_gj_inv`)."""
    if M.dtype == jnp.float64 and jax.default_backend() != "cpu":
        return _gj_inv(M)
    return jnp.linalg.inv(M)

# ---------------------------------------------------------------------------
# Static per-level index plan
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class StagePlan:
    """Precomputed static index arrays for the per-level Riccati sweeps."""

    topo: TreeTopology
    # per level k: (l_k, nb_k) arrays of stage ids and successor x-node ids
    stage_idx: Tuple[np.ndarray, ...]
    succ_x_idx: Tuple[np.ndarray, ...]
    xnode_idx: Tuple[np.ndarray, ...]     # x-node of each stage, same shape
    leaf_term_idx: np.ndarray             # (n_leaves,) terminal x-node ids
    leaf_ids: np.ndarray                  # (n_leaves,) leaf branch ids


def build_stage_plan(topo: TreeTopology) -> StagePlan:
    stage_idx = []
    succ_x_idx = []
    xnode_idx = []
    for k in range(topo.NB + 1):
        lo, hi = topo.level_lo[k], topo.level_hi[k]
        ids = np.arange(lo, hi)
        l = int(topo.blen[lo])
        si = topo.u_off[ids][None, :] + np.arange(l)[:, None]      # (l, nb)
        xi = topo.x_off[ids][None, :] + np.arange(l)[:, None]
        sx = xi + 1                                                # within-branch successor
        # branch-last successor: first child's first node, or terminal
        last = np.zeros(hi - lo, dtype=np.int64)
        for j, b in enumerate(ids):
            if topo.is_leaf[b]:
                last[j] = topo.x_off[b] + topo.blen[b]
            else:
                last[j] = topo.x_off[topo.children[b, 0]]
        sx[l - 1, :] = last
        stage_idx.append(si.astype(np.int64))
        succ_x_idx.append(sx.astype(np.int64))
        xnode_idx.append(xi.astype(np.int64))
    leaf_ids = np.nonzero(np.asarray(topo.is_leaf))[0]
    leaf_term_idx = (topo.x_off[leaf_ids] + topo.blen[leaf_ids]).astype(np.int64)
    return StagePlan(
        topo=topo,
        stage_idx=tuple(stage_idx),
        succ_x_idx=tuple(succ_x_idx),
        xnode_idx=tuple(xnode_idx),
        leaf_term_idx=leaf_term_idx,
        leaf_ids=leaf_ids.astype(np.int64),
    )


# ---------------------------------------------------------------------------
# Stage cost assembly (reference buildCost semantics, ½-convention)
# ---------------------------------------------------------------------------


class StageCost(NamedTuple):
    """Per-stage quadratic/linear cost data (flat arrays over stages/nodes)."""

    Qx2: Any      # (totalu, n, n)  2·w·(dQ+Q)   — x-block of constrained nodes
    qx: Any       # (totalu, n)     reference qx rows
    Ru2: Any      # (totalu, d, d)  2·(self input block)
    qu: Any       # (totalu, d)     reference qu rows
    Daa2: Any     # (totalu, d, d)  edge(pred→j): 2·(u_prev² part); row 0 zero
    Dab2: Any     # (totalu, d, d)  edge(pred→j): 2·(cross part, full); row 0 zero
    Pterm2: Any   # (n_leaves, n, n) 2·w·Qf
    qterm: Any    # (n_leaves, n)
    slack_lin: Any  # (totalu,) Qslack[1]·w  (per-row linear slack cost)
    slack_quad: float  # 2·Qslack[0]


def _sym_broadcast_dR(dR):
    """triu-symmetrization of the reference's row-broadcast dR add:
    S[i, j] = dR[max(i, j)] (``MPC_branch.py:312`` through OSQP's triu)."""
    d = dR.shape[0]
    i = jnp.arange(d)
    return dR[jnp.maximum(i[:, None], i[None, :])]


def assemble_stage_cost(
    topo: TreeTopology,
    ts: TreeState,
    Q, R, Qf, dR, Qslack, xRef, OldInput,
    variant: str = "prox",
    replicate_quirks: bool = True,
    childJ=None,
) -> StageCost:
    """Build per-stage cost arrays equivalent to the reference ``buildCost``
    (``MPC_branch.py:265-325`` prox / ``:1064-1112`` branch)."""
    n, d = topo.n, topo.d
    dtype = ts.x_lin.dtype
    Q = jnp.asarray(Q, dtype)
    R = jnp.asarray(R, dtype)
    Qf = jnp.asarray(Qf, dtype)
    dR = jnp.asarray(dR, dtype)
    xRef = jnp.asarray(xRef, dtype)
    OldInput = jnp.asarray(OldInput, dtype)
    Qslack = jnp.asarray(Qslack, dtype)
    # 'robust' = the single-trajectory benchmark controller: prox assembly with
    # dQ=0 and the corrected (quirk-free) rate cost (MPC_branch.py:1540-1569)
    if variant == "robust":
        dQ = Q * 0.0
        variant = "prox"
        replicate_quirks = False
    else:
        dQ = Q * (3.0 if variant == "prox" else 0.5)
    dRm = jnp.diag(dR)

    ub = np.asarray(topo.unode_branch)
    w_u = ts.w[ub]                                   # (totalu,)
    cx = np.asarray(topo.cnode_x)
    x_nodes = ts.x_lin[cx]                           # (totalu, n)

    # x quadratic: uniform (dQ+Q)·w for every constrained node
    Qx2 = 2.0 * w_u[:, None, None] * (dQ + Q)[None]

    # x linear: −2w(xRef·Q + x_lin·dQ) everywhere; non-leaf branch-last adds
    # w·childJ·dp (childJ is always zero in the reference — kept as a hook)
    qx = -2.0 * w_u[:, None] * (xRef @ Q)[None, :] - 2.0 * w_u[:, None] * (x_nodes @ dQ)
    steps = np.asarray(topo.unode_step)
    blen_u = np.asarray(topo.blen)[ub]
    is_last = steps == blen_u - 1
    leaf_u = np.asarray(topo.is_leaf)[ub]
    if variant == "branch":
        # leaf-last row uses Qf for the xRef term (MPC_branch.py:1095)
        mask = jnp.asarray((is_last & leaf_u), dtype=dtype)[:, None]
        qx = qx + mask * (-2.0 * w_u[:, None] * ((xRef @ Qf) - (xRef @ Q))[None, :])
    if childJ is not None:
        # + w·childJ·dp on non-leaf branch-last nodes
        contrib = jnp.einsum("bm,bmn->bn", childJ, ts.dp)        # (B, n)
        mask = jnp.asarray((is_last & ~leaf_u), dtype=dtype)[:, None]
        qx = qx + mask * (ts.w[:, None] * contrib)[ub]

    # input self blocks + rate-coupling cross terms.
    #
    # The symmetric dense Hu decomposes as: per-stage diagonal blocks + one
    # off-diagonal −w_j·dR block per input-chain edge (pred(j) → j). The
    # parent-side (u_prev²) part of every edge is already inside the *parent's*
    # diagonal (the oracle's w(R+dR) at non-last stages sums child weights:
    # Σ_c w_c = w_parent), so Daa2 stays zero and only the cross term is
    # attributed to the successor stage — any quadratic attribution is valid
    # for the Riccati elimination as long as the total matches.
    Daa2 = jnp.zeros((topo.totalu, d, d), dtype)
    Dab2 = jnp.zeros((topo.totalu, d, d), dtype)
    if variant == "prox":
        has_edge = np.ones(topo.totalu, dtype=bool)
        has_edge[0] = False                  # root's incoming edge is OldInput (const)
        he = jnp.asarray(has_edge, dtype=dtype)[:, None, None]
        Dab2 = he * (-2.0 * w_u[:, None, None] * dRm[None])
        # diagonals, matching the oracle exactly (H units → ×2):
        #   root:                w(R+dR)            (+ quirk S below)
        #   non-root, non-last / non-leaf-last:  w(R + 2dR)
        #   leaf-last:           w·R  (overwrite quirk) or w(R+dR) corrected
        Ru2 = 2.0 * w_u[:, None, None] * (R + 2.0 * dRm)[None]
        Ru2 = Ru2.at[0].set(2.0 * (R + dRm))              # root (w=1)
        if replicate_quirks and variant == "prox":
            mask_ll = jnp.asarray(is_last & leaf_u, dtype=dtype)[:, None, None]
            Ru2 = Ru2 + mask_ll * (2.0 * w_u[:, None, None] * (-2.0 * dRm)[None])
        else:
            mask_ll = jnp.asarray(is_last & leaf_u, dtype=dtype)[:, None, None]
            Ru2 = Ru2 + mask_ll * (2.0 * w_u[:, None, None] * (-dRm)[None])
    else:
        Ru2 = 2.0 * w_u[:, None, None] * R[None]

    # root OldInput edge
    qu = jnp.zeros((topo.totalu, d), dtype)
    if replicate_quirks:
        # scalar broadcast: qu[0:d] = −2·(OldInput·dR) (MPC_branch.py:311)
        qu = qu.at[0].set(jnp.full((d,), -2.0 * jnp.dot(OldInput, dR), dtype))
        if variant == "prox":
            Ru2 = Ru2.at[0].add(2.0 * _sym_broadcast_dR(dR))
    else:
        qu = qu.at[0].set(-2.0 * dRm @ OldInput)
        Ru2 = Ru2.at[0].add(2.0 * dRm)

    # terminal (leaf) nodes
    leaf_ids = np.nonzero(np.asarray(topo.is_leaf))[0]
    w_leaf = ts.w[leaf_ids]
    Pterm2 = 2.0 * w_leaf[:, None, None] * Qf[None]
    if variant == "prox":
        qterm = -2.0 * w_leaf[:, None] * (xRef @ Qf)[None, :]
    else:
        qterm = jnp.zeros((len(leaf_ids), n), dtype)   # MPC_branch.py: no terminal linear row

    slack_lin = Qslack[1] * w_u
    return StageCost(
        Qx2=Qx2, qx=qx, Ru2=Ru2, qu=qu, Daa2=Daa2, Dab2=Dab2,
        Pterm2=Pterm2, qterm=qterm, slack_lin=slack_lin,
        slack_quad=2.0 * Qslack[0],
    )


# ---------------------------------------------------------------------------
# Riccati over the tree (augmented state ξ = (x, u_prev))
# ---------------------------------------------------------------------------


class Factors(NamedTuple):
    K: Any        # (totalu, d, nd)
    k_fix: Any    # unused placeholder for alignment (None)
    Hinv: Any     # (totalu, d, d)
    Acl: Any      # (totalu, nd, nd)  F + G K
    Bmat: Any     # (totalu, n, d)    B of the successor transition
    Amat: Any     # (totalu, n, n)
    hvec: Any     # (totalu, n)       C of the successor transition
    vec1: Any     # (totalu, nd)      Fᵀ P' h
    gu: Any       # (totalu, d)       Gᵀ P' h


def _stage_step_quad(W_P, Qx2, Daa2, Dab2, Ru2, A, B, C, n, d):
    """One backward Riccati step (quadratic part) for a batch of branches.

    W_P: (nb, nd, nd) successor value quadratic. Returns (P, K, Hinv, Acl,
    vec1, gu)."""
    nd = n + d
    # partition W_P
    Pxx = W_P[:, :n, :n]
    Pxu = W_P[:, :n, n:]
    Puu = W_P[:, n:, n:]
    # G = [B; I], F = [[A,0],[0,0]], h = [C; 0]
    # GᵀP'G = BᵀPxx B + BᵀPxu + PxuᵀB + Puu
    BtPxx = jnp.einsum("bnm,bnk->bmk", B, Pxx)           # (nb, d, n) = Bᵀ Pxx
    GtPG = (
        jnp.einsum("bmn,bnk->bmk", BtPxx, B)
        + jnp.einsum("bnm,bnk->bmk", B, Pxu)
        + jnp.einsum("bnk,bnm->bkm", Pxu, B)
        + Puu
    )
    Huu = Ru2 + GtPG
    # GᵀP'F = (BᵀPxx + Pxuᵀ) A  padded with zeros on the u_prev columns
    GtPx = BtPxx + jnp.swapaxes(Pxu, 1, 2)               # (nb, d, n) = GᵀP' (x-rows)
    GtPF_x = jnp.einsum("bmn,bnk->bmk", GtPx, A)         # (nb, d, n)
    # L = Mᵀ + GᵀP'F ; M = [[0],[Dab]] → Mᵀ has Dabᵀ in the u_prev columns
    L = jnp.concatenate([GtPF_x, jnp.swapaxes(Dab2, 1, 2)], axis=2)  # (nb, d, nd)
    Hinv = _small_inv(Huu)
    K = -jnp.einsum("bmk,bkl->bml", Hinv, L)             # (nb, d, nd)
    # FᵀP'F = [[Aᵀ Pxx A, 0],[0,0]]
    AtPxxA = jnp.einsum("bnm,bnk,bkl->bml", A, Pxx, A)
    Qxi = jnp.zeros_like(W_P)
    Qxi = Qxi.at[:, :n, :n].set(Qx2 + AtPxxA)
    Qxi = Qxi.at[:, n:, n:].set(Daa2)
    P = Qxi - jnp.einsum("bml,bmk,bkj->blj", L, Hinv, L)
    # symmetrize for numerical hygiene
    P = 0.5 * (P + jnp.swapaxes(P, 1, 2))
    # fixed linear-pass vectors: vec1 = FᵀP'h = [Aᵀ(Pxx C); 0], gu = GᵀP'h
    PxxC = jnp.einsum("bnk,bk->bn", Pxx, C)
    PuxC = jnp.einsum("bnk,bn->bk", Pxu, C)              # (Pxuᵀ C)
    vec1 = jnp.concatenate(
        [jnp.einsum("bnm,bn->bm", A, PxxC), jnp.zeros_like(PuxC)], axis=1
    )
    gu = jnp.einsum("bnm,bn->bm", B, PxxC) + PuxC
    Acl = jnp.zeros_like(W_P)
    Acl = Acl.at[:, :n, :n].set(A)
    Acl = Acl + jnp.concatenate([B, jnp.eye(d, dtype=B.dtype)[None].repeat(B.shape[0], 0)], axis=1) @ K
    return P, K, Hinv, Acl, vec1, gu


@_f32_precision
def tree_lqr_factor(plan: StagePlan, cost: StageCost, ts: TreeState):
    """Backward quadratic sweep over the tree. Returns Factors (+ head values)."""
    topo = plan.topo
    n, d, m = topo.n, topo.d, topo.m
    nd = n + d
    dtype = ts.x_lin.dtype
    totalu = topo.totalu

    K_all = jnp.zeros((totalu, d, nd), dtype)
    Hinv_all = jnp.zeros((totalu, d, d), dtype)
    Acl_all = jnp.zeros((totalu, nd, nd), dtype)
    A_all = jnp.zeros((totalu, n, n), dtype)
    B_all = jnp.zeros((totalu, n, d), dtype)
    h_all = jnp.zeros((totalu, n), dtype)
    vec1_all = jnp.zeros((totalu, nd), dtype)
    gu_all = jnp.zeros((totalu, d), dtype)

    P_head_next = None   # (nb_{k+1}, nd, nd) head values of the deeper level

    for k in range(topo.NB, -1, -1):
        si = plan.stage_idx[k]       # (l, nb)
        sx = plan.succ_x_idx[k]
        l, nb = si.shape
        # initial successor value at the branch end
        if k == topo.NB:
            W_P = jnp.zeros((nb, nd, nd), dtype)
            W_P = W_P.at[:, :n, :n].set(cost.Pterm2)
        else:
            W_P = P_head_next.reshape(nb, m, nd, nd).sum(axis=1)

        def step(carry, inp):
            W_P = carry
            (sidx, Qx2, Daa2, Dab2, Ru2, A, B, C) = inp
            P, K, Hinv, Acl, vec1, gu = _stage_step_quad(
                W_P, Qx2, Daa2, Dab2, Ru2, A, B, C, n, d
            )
            return P, (K, Hinv, Acl, vec1, gu)

        # gather reversed per-step inputs
        inputs = (
            jnp.asarray(si[::-1]),
            cost.Qx2[si[::-1]],
            cost.Daa2[si[::-1]],
            cost.Dab2[si[::-1]],
            cost.Ru2[si[::-1]],
            ts.A[sx[::-1]],
            ts.Bm[sx[::-1]],
            ts.C[sx[::-1]],
        )
        P_head, outs = jax.lax.scan(step, W_P, inputs, unroll=True)
        K_s, Hinv_s, Acl_s, vec1_s, gu_s = outs      # (l, nb, ...) reversed order
        rev = si[::-1]
        K_all = K_all.at[rev].set(K_s)
        Hinv_all = Hinv_all.at[rev].set(Hinv_s)
        Acl_all = Acl_all.at[rev].set(Acl_s)
        vec1_all = vec1_all.at[rev].set(vec1_s)
        gu_all = gu_all.at[rev].set(gu_s)
        A_all = A_all.at[si].set(ts.A[sx])
        B_all = B_all.at[si].set(ts.Bm[sx])
        h_all = h_all.at[si].set(ts.C[sx])
        P_head_next = P_head

    return Factors(
        K=K_all, k_fix=None, Hinv=Hinv_all, Acl=Acl_all,
        Bmat=B_all, Amat=A_all, hvec=h_all, vec1=vec1_all, gu=gu_all,
    )


@_f32_precision
def tree_lqr_linear(plan: StagePlan, fac: Factors, qx_eff, qu_eff, qterm_eff,
                    affine: bool = True):
    """Backward linear sweep: per-stage feedforward k_j given current linear costs.

    qx_eff: (totalu, n), qu_eff: (totalu, d), qterm_eff: (n_leaves, n).
    ``affine=False`` drops the dynamics-constant (C) contributions — the pure
    linear-response mode used for Woodbury columns in the CVaR solver.
    Returns kff (totalu, d)."""
    topo = plan.topo
    n, d, m = topo.n, topo.d, topo.m
    nd = n + d
    dtype = qx_eff.dtype
    kff_all = jnp.zeros((topo.totalu, d), dtype)
    p_head_next = None

    for k in range(topo.NB, -1, -1):
        si = plan.stage_idx[k]
        l, nb = si.shape
        if k == topo.NB:
            p0 = jnp.zeros((nb, nd), dtype)
            p0 = p0.at[:, :n].set(qterm_eff)
        else:
            p0 = p_head_next.reshape(nb, m, nd).sum(axis=1)

        def step(carry, inp):
            p_next = carry
            (qx, qu, K, Hinv, Acl, vec1, gu, B) = inp
            # l_u = qu + gu + Gᵀ p' ;  Gᵀ p' = Bᵀ p'_x + p'_u
            l_u = qu + jnp.einsum("bnm,bn->bm", B, p_next[:, :n]) + p_next[:, n:]
            if affine:
                l_u = l_u + gu
            kff = -jnp.einsum("bmk,bk->bm", Hinv, l_u)
            # p = [qx;0] + vec1 + Fᵀp' + Kᵀ l_u ; Fᵀp' = [Aᵀ p'_x; 0] — but
            # Aᵀ p'_x + Kᵀ... use Acl identity: Fᵀp' + KᵀGᵀp' = Aclᵀ p'.
            # p = [qx;0] + vec1 + Aclᵀ p' + Kᵀ(qu + gu)
            p = jnp.concatenate([qx, jnp.zeros((qx.shape[0], d), qx.dtype)], axis=1)
            p = p + jnp.einsum("bnm,bn->bm", Acl, p_next)
            if affine:
                p = p + vec1 + jnp.einsum("bmk,bm->bk", K, qu + gu)
            else:
                p = p + jnp.einsum("bmk,bm->bk", K, qu)
            return p, kff

        rev = si[::-1]
        inputs = (
            qx_eff[rev], qu_eff[rev], fac.K[rev], fac.Hinv[rev],
            fac.Acl[rev], fac.vec1[rev], fac.gu[rev], fac.Bmat[rev],
        )
        p_head, kff_s = jax.lax.scan(step, p0, inputs, unroll=True)
        kff_all = kff_all.at[rev].set(kff_s)
        p_head_next = p_head
    return kff_all


@_f32_precision
def tree_lqr_forward(plan: StagePlan, fac: Factors, kff, x0, u_old,
                     affine: bool = True):
    """Forward rollout: ξ_root = (x0, OldInput); returns (x_nodes (totalx, n),
    u (totalu, d)). ``affine=False`` drops the dynamics constants (response mode)."""
    topo = plan.topo
    n, d, m = topo.n, topo.d, topo.m
    dtype = x0.dtype
    x_nodes = jnp.zeros((topo.totalx, n), dtype)
    u_all = jnp.zeros((topo.totalu, d), dtype)

    xi = jnp.concatenate([x0, u_old])[None, :]     # (1, nd)

    for k in range(topo.NB + 1):
        si = plan.stage_idx[k]
        xniv = plan.xnode_idx[k]
        l, nb = si.shape

        def step(carry, inp):
            xi = carry            # (nb, nd)
            (K, kf, Acl, B, h) = inp
            u = jnp.einsum("bmk,bk->bm", K, xi) + kf
            # ξ' = Acl ξ + G k + h_full   (Acl ξ already contains the GKξ part)
            xi_next = jnp.einsum("bnk,bk->bn", Acl, xi)
            if affine:
                xi_next = xi_next.at[:, :n].add(h)
            xi_next = xi_next + jnp.concatenate(
                [jnp.einsum("bnm,bm->bn", B, kf), kf], axis=1
            )
            return xi_next, (u, xi[:, :n])

        inputs = (fac.K[si], kff[si], fac.Acl[si], fac.Bmat[si], fac.hvec[si])
        xi_end, (u_s, xnode_s) = jax.lax.scan(step, xi, inputs, unroll=True)
        u_all = u_all.at[si].set(u_s)
        x_nodes = x_nodes.at[xniv].set(xnode_s)
        if k < topo.NB:
            xi = jnp.repeat(xi_end, m, axis=0)     # all children share ξ'
        else:
            x_nodes = x_nodes.at[plan.leaf_term_idx].set(xi_end[:, :n])
    return x_nodes, u_all


# ---------------------------------------------------------------------------
# OSQP-style ADMM around the tree-LQR solve
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class ADMMConfig:
    """Tuned on the overtake config vs the oracle: uniform row scaling with
    α=1.6 over-relaxation and an active-set polish phase reaches applied-input
    accuracy ~1e-7 at 200+30 iterations (weight-scaled rows converge slower)."""

    rho: float = 5.0
    sigma: float = 1e-6
    alpha: float = 1.6            # over-relaxation (OSQP default)
    iters: int = 200
    rho_update_every: int = 50    # 0 = fixed rho; else adapt every k iters
    rho_min: float = 1e-3
    rho_max: float = 1e4
    row_scaling: str = "uniform"  # "uniform" | "weight" | "weight_rownorm"
    polish_iters: int = 30        # extra iterations with boosted rho on active rows
    polish_boost: float = 200.0
    act_tol: float = 1e-6


class ADMMState(NamedTuple):
    x: Any
    u: Any
    s: Any
    z1: Any
    z2: Any
    z3: Any
    y1: Any
    y2: Any
    y3: Any
    theta: Any     # scalar multiplier on the per-row rho bases


@_f32_precision
def admm_solve(
    plan: StagePlan,
    cost: StageCost,
    ts: TreeState,
    Fx, bx, Fu, bu,
    x0, OldInput,
    cfg: ADMMConfig = ADMMConfig(),
    init: ADMMState = None,
    w_stage=None,
    Fxc_override=None,
    b1_override=None,
    warm_duals=None,
):
    """Solve the tree QP. Returns (x_nodes, u, s, state, info dict).

    Per-row penalties: ρ1 (state rows R1: [−dh;Fx]·x − s ≤ [h0;bx]), ρ3 (slack
    positivity R3), ρ2 (input rows R2: Fu·u ≤ bu). Bases are scaled by branch
    weight (matching the w-scaled cost blocks) and optionally row norms; a scalar
    multiplier θ is adapted OSQP-style from the residual ratio (refactoring the
    Riccati is cheap). An optional *polish* phase boosts ρ on the detected active
    set — the analog of OSQP's ``polish=True`` (``MPC_branch.py:478``) but still
    exact ADMM, hence safe under a wrong active-set guess.
    """
    topo = plan.topo
    n, d = topo.n, topo.d
    dtype = ts.x_lin.dtype
    totalu = topo.totalu
    Fx = jnp.asarray(Fx, dtype)
    bx = jnp.asarray(bx, dtype)
    Fu = jnp.asarray(Fu, dtype)
    bu = jnp.asarray(bu, dtype)
    nFx = Fx.shape[0]
    nFu = Fu.shape[0]

    if Fxc_override is not None:
        # caller-supplied per-stage state rows (robustMPC: Fx box + one
        # collision row per scenario-tree node at that time step)
        Fxc = jnp.asarray(Fxc_override, dtype)           # (totalu, Nc, n)
        b1 = jnp.asarray(b1_override, dtype)             # (totalu, Nc)
        Nc = Fxc.shape[1]
    else:
        Nc = nFx + 1
        # per-stage constraint rows: Fxc_j = [−dh_j; Fx], b1_j = [h0_j; bx]
        Fxc = jnp.concatenate(
            [-ts.dh[:, None, :], jnp.broadcast_to(Fx, (totalu, nFx, n))], axis=1
        )                                                # (totalu, Nc, n)
        b1 = jnp.concatenate(
            [ts.h0[:, None], jnp.broadcast_to(bx, (totalu, nFx))], axis=1
        )                                                # (totalu, Nc)

    sigma = cfg.sigma
    cx = np.asarray(topo.cnode_x)
    leaf_term = plan.leaf_term_idx
    if w_stage is None:
        w_stage = ts.w[np.asarray(topo.unode_branch)]    # (totalu,)

    # per-row rho bases
    if cfg.row_scaling == "uniform":
        base1 = jnp.ones((totalu, Nc), dtype)
        base2 = jnp.ones((totalu, nFu), dtype)
    elif cfg.row_scaling == "weight":
        base1 = jnp.broadcast_to(w_stage[:, None], (totalu, Nc))
        base2 = jnp.broadcast_to(w_stage[:, None], (totalu, nFu))
    else:  # weight_rownorm
        rn1 = jnp.sum(Fxc * Fxc, axis=2)
        base1 = w_stage[:, None] / jnp.maximum(rn1, 1e-3)
        rn2 = jnp.sum(Fu * Fu, axis=1)[None, :]
        base2 = w_stage[:, None] / jnp.maximum(rn2, 1e-3)
    base1 = base1 * cfg.rho
    base2 = base2 * cfg.rho
    base3 = base1

    def make_factors(theta, boost1=None, boost2=None, boost3=None):
        rho1 = base1 * theta if boost1 is None else base1 * theta * boost1
        rho2 = base2 * theta if boost2 is None else base2 * theta * boost2
        rho3 = base3 * theta if boost3 is None else base3 * theta * boost3
        kappa = cost.slack_quad + sigma + rho1 + rho3            # (totalu, Nc)
        coef = rho1 - rho1 * rho1 / kappa
        Qx2_eff = cost.Qx2 + jnp.einsum("br,bri,brj->bij", coef, Fxc, Fxc)
        Qx2_eff = Qx2_eff + sigma * jnp.eye(n, dtype=dtype)[None]
        Ru2_eff = cost.Ru2 + jnp.einsum("br,ri,rj->bij", rho2, Fu, Fu)
        Ru2_eff = Ru2_eff + sigma * jnp.eye(d, dtype=dtype)[None]
        Pterm2_eff = cost.Pterm2 + sigma * jnp.eye(n, dtype=dtype)[None]
        cost_eff = cost._replace(Qx2=Qx2_eff, Ru2=Ru2_eff, Pterm2=Pterm2_eff)
        fac = tree_lqr_factor(plan, cost_eff, ts)
        return fac, (rho1, rho2, rho3, kappa)

    theta0 = jnp.asarray(1.0, dtype)
    fac, rhos = make_factors(theta0)

    if init is None:
        x_init = ts.x_lin
        u_init = ts.u_lin
        s_init = jnp.zeros((totalu, Nc), dtype)
        z1 = jnp.einsum("brn,bn->br", Fxc, x_init[cx]) - s_init
        z2 = jnp.einsum("rn,bn->br", Fu, u_init)
        if warm_duals is not None:
            y1_0, y2_0, y3_0 = warm_duals
        else:
            y1_0 = jnp.zeros_like(z1)
            y2_0 = jnp.zeros_like(z2)
            y3_0 = jnp.zeros_like(s_init)
        state = ADMMState(
            x=x_init, u=u_init, s=s_init,
            z1=jnp.minimum(z1, b1), z2=jnp.minimum(z2, bu[None]),
            z3=jnp.zeros_like(s_init),
            y1=y1_0, y2=y2_0, y3=y3_0,
            theta=theta0,
        )
    else:
        state = init

    def iteration(state: ADMMState, fac, rhos):
        rho1, rho2, rho3, kappa = rhos
        w1 = state.z1 - state.y1 / rho1
        w2 = state.z2 - state.y2 / rho2
        w3 = state.z3 - state.y3 / rho3
        beta = rho1 * w1 - rho3 * w3 - sigma * state.s + cost.slack_lin[:, None]
        gamma = jnp.einsum("brn,br->bn", Fxc, (rho1 / kappa) * beta - rho1 * w1)
        qx_eff = cost.qx + gamma - sigma * state.x[cx]
        qu_eff = cost.qu - sigma * state.u - jnp.einsum("rn,br->bn", Fu, rho2 * w2)
        qterm_eff = cost.qterm - sigma * state.x[leaf_term]
        kff = tree_lqr_linear(plan, fac, qx_eff, qu_eff, qterm_eff)
        x_nodes, u = tree_lqr_forward(plan, fac, kff, x0, OldInput)
        fxn = jnp.einsum("brn,bn->br", Fxc, x_nodes[cx])
        s = (rho1 * fxn - beta) / kappa
        y1t = fxn - s
        y2t = jnp.einsum("rn,bn->br", Fu, u)
        y3t = s
        a = cfg.alpha
        y1h = a * y1t + (1 - a) * state.z1
        y2h = a * y2t + (1 - a) * state.z2
        y3h = a * y3t + (1 - a) * state.z3
        z1 = jnp.minimum(y1h + state.y1 / rho1, b1)
        z2 = jnp.minimum(y2h + state.y2 / rho2, bu[None])
        z3 = jnp.maximum(y3h + state.y3 / rho3, 0.0)
        y1 = state.y1 + rho1 * (y1h - z1)
        y2 = state.y2 + rho2 * (y2h - z2)
        y3 = state.y3 + rho3 * (y3h - z3)
        return (
            ADMMState(x_nodes, u, s, z1, z2, z3, y1, y2, y3, state.theta),
            (y1t, y2t, y3t),
        )

    if cfg.rho_update_every and cfg.rho_update_every > 0:
        n_chunks = max(1, cfg.iters // cfg.rho_update_every)
        for _ in range(n_chunks):
            def body(i, st):
                st, _ = iteration(st, fac, rhos)
                return st
            state = jax.lax.fori_loop(0, cfg.rho_update_every, body, state)
            st2, (y1t, y2t, y3t) = iteration(state, fac, rhos)
            rp = jnp.maximum(
                jnp.max(jnp.abs(y1t - st2.z1)),
                jnp.maximum(jnp.max(jnp.abs(y2t - st2.z2)), jnp.max(jnp.abs(y3t - st2.z3))),
            )
            dz1 = st2.z1 - state.z1
            dz2 = st2.z2 - state.z2
            dz3 = st2.z3 - state.z3
            rd_x = jnp.einsum("brn,br->bn", Fxc, rhos[0] * dz1)
            rd_u = jnp.einsum("rn,br->bn", Fu, rhos[1] * dz2)
            rd = jnp.maximum(
                jnp.max(jnp.abs(rd_x)),
                jnp.maximum(jnp.max(jnp.abs(rd_u)),
                            jnp.max(jnp.abs(rhos[0] * dz1 - rhos[2] * dz3))),
            )
            new_theta = jnp.clip(
                state.theta * jnp.sqrt((rp + 1e-12) / (rd + 1e-12)),
                cfg.rho_min, cfg.rho_max,
            )
            state = st2._replace(theta=new_theta)
            fac, rhos = make_factors(new_theta)
    else:
        def body(i, st):
            st, _ = iteration(st, fac, rhos)
            return st
        state = jax.lax.fori_loop(0, cfg.iters, body, state)

    if cfg.polish_iters and cfg.polish_iters > 0:
        # boost rho on the detected active set (still exact ADMM — safe even if
        # the guess is wrong, unlike a KKT-projection polish)
        act1 = (state.y1 > cfg.act_tol).astype(dtype)
        act2 = (state.y2 > cfg.act_tol).astype(dtype)
        act3 = (state.y3 < -cfg.act_tol).astype(dtype)
        boost1 = 1.0 + (cfg.polish_boost - 1.0) * act1
        boost2 = 1.0 + (cfg.polish_boost - 1.0) * act2
        boost3 = 1.0 + (cfg.polish_boost - 1.0) * act3
        fac, rhos = make_factors(state.theta, boost1, boost2, boost3)

        def body(i, st):
            st, _ = iteration(st, fac, rhos)
            return st
        state = jax.lax.fori_loop(0, cfg.polish_iters, body, state)

    state_f, (y1t, y2t, y3t) = iteration(state, fac, rhos)
    rp = jnp.maximum(
        jnp.max(jnp.maximum(y1t - b1, 0.0)),
        jnp.maximum(jnp.max(jnp.maximum(y2t - bu[None], 0.0)),
                    jnp.max(jnp.maximum(-y3t, 0.0))),
    )
    info = {"prim_res": rp, "rho": state_f.theta}
    return state_f.x, state_f.u, state_f.s, state_f, info
