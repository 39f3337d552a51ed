"""Batch-LAST tree-QP solver: the TPU-native layout for batched small-matrix
Riccati/IPM work.

``vmap`` over the per-lane solver puts the batch axis FIRST, which leaves the
tiny (6,6)/(2,2) matrix dimensions in the minor (sublane, lane) positions of
every array. TPU tiles the last two dims to (8, 128), so a (B, 106, 6, 6)
tensor is stored at 36/1024 ≈ 3.5% tile occupancy — a ~28× physical HBM
inflation that the memory-bound Riccati sweeps pay on every load and store.

This module keeps the batch axis LAST instead: arrays are (nodes, i, j, B)
with B a multiple of 128, so lanes are 100% occupied and the small matrix dims
ride in the cheap major positions. All solver math is identical to
``tree_qp.tree_lqr_*`` / ``tree_qp_ipm.qp_ipm_solve`` (same reference
semantics, ``MPC_branch.py:185-382``); only the data layout differs. Parity vs
the vmapped per-lane solver is pinned to ~1e-8 (f64) in
``tests/test_tree_qp_bl.py``.

MEASURED RESULT (v5e, B=2048, IPM-20): 1340 solves/s vs 2327 for the vmapped
per-lane solver — XLA's own layout assignment already handles the vmapped
form better than hand-forced batch-last einsums, which cost extra transposes
around each dot_general. Kept as the parity-tested layout scaffold for a
Pallas port (where the (…, B)-in-lanes layout is explicit and transpose-free),
not as a production path.

Glossary: einsum subscript ``Z`` is the trailing batch axis; ``b`` remains the
node/stage axis as in ``tree_qp``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from belief_planning_tpu.solvers.tree_qp import (
    StageCost,
    StagePlan,
    _f32_precision,
)
from belief_planning_tpu.solvers.tree_qp_ipm import QPIPMConfig
from belief_planning_tpu.tree.engine import TreeState


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


def _eye_bl(d, like):
    return jnp.eye(d, dtype=like.dtype)[None, :, :, None]


def _stage_step_quad_bl(W_P, Qx2, Daa2, Dab2, Ru2, A, B, C, n, d):
    """One backward Riccati step, batch-last. Mirrors
    ``tree_qp._stage_step_quad`` with shapes (nb, i, j, Z)."""
    # partition W_P (nb, nd, nd, Z)
    Pxx = W_P[:, :n, :n, :]
    Pxu = W_P[:, :n, n:, :]
    Puu = W_P[:, n:, n:, :]
    BtPxx = jnp.einsum("bnmZ,bnkZ->bmkZ", B, Pxx)         # Bᵀ Pxx  (nb,d,n,Z)
    GtPG = (
        jnp.einsum("bmnZ,bnkZ->bmkZ", BtPxx, B)
        + jnp.einsum("bnmZ,bnkZ->bmkZ", B, Pxu)
        + jnp.einsum("bnkZ,bnmZ->bkmZ", Pxu, B)
        + Puu
    )
    Huu = Ru2 + GtPG
    GtPx = BtPxx + jnp.swapaxes(Pxu, 1, 2)                # (nb, d, n, Z)
    GtPF_x = jnp.einsum("bmnZ,bnkZ->bmkZ", GtPx, A)
    L = jnp.concatenate([GtPF_x, jnp.swapaxes(Dab2, 1, 2)], axis=2)  # (nb,d,nd,Z)
    Hinv = _small_inv_bl(Huu)
    K = -jnp.einsum("bmkZ,bklZ->bmlZ", Hinv, L)           # (nb, d, nd, Z)
    AtPxxA = jnp.einsum("bnmZ,bnkZ,bklZ->bmlZ", A, Pxx, A)
    Qxi = jnp.zeros_like(W_P)
    Qxi = Qxi.at[:, :n, :n, :].set(Qx2 + AtPxxA)
    Qxi = Qxi.at[:, n:, n:, :].set(Daa2)
    P = Qxi - jnp.einsum("bmlZ,bmkZ,bkjZ->bljZ", L, Hinv, L)
    P = 0.5 * (P + jnp.swapaxes(P, 1, 2))
    PxxC = jnp.einsum("bnkZ,bkZ->bnZ", Pxx, C)
    PuxC = jnp.einsum("bnkZ,bnZ->bkZ", Pxu, C)
    vec1 = jnp.concatenate(
        [jnp.einsum("bnmZ,bnZ->bmZ", A, PxxC), jnp.zeros_like(PuxC)], axis=1
    )
    gu = jnp.einsum("bnmZ,bnZ->bmZ", B, PxxC) + PuxC
    nb, _, _, Z = W_P.shape
    Acl = jnp.zeros_like(W_P)
    Acl = Acl.at[:, :n, :n, :].set(A)
    G = jnp.concatenate(
        [B, jnp.broadcast_to(_eye_bl(d, B), (nb, d, d, Z))], axis=1
    )                                                     # (nb, nd, d, Z)
    Acl = Acl + jnp.einsum("bnmZ,bmkZ->bnkZ", G, K)
    return P, K, Hinv, Acl, vec1, gu


class FactorsBL(tuple):
    pass


@_f32_precision
def tree_lqr_factor_bl(plan: StagePlan, cost: StageCost, A_bl, B_bl, C_bl):
    """Backward quadratic sweep, batch-last. ``A_bl (totalx, n, n, Z)``,
    ``B_bl (totalx, n, d, Z)``, ``C_bl (totalx, n, Z)`` are the batched
    linearizations (successor transitions indexed by x-node)."""
    topo = plan.topo
    n, d, m = topo.n, topo.d, topo.m
    nd = n + d
    dtype = A_bl.dtype
    Z = A_bl.shape[-1]
    totalu = topo.totalu

    K_all = jnp.zeros((totalu, d, nd, Z), dtype)
    Hinv_all = jnp.zeros((totalu, d, d, Z), dtype)
    Acl_all = jnp.zeros((totalu, nd, nd, Z), dtype)
    A_all = jnp.zeros((totalu, n, n, Z), dtype)
    B_all = jnp.zeros((totalu, n, d, Z), dtype)
    h_all = jnp.zeros((totalu, n, Z), dtype)
    vec1_all = jnp.zeros((totalu, nd, Z), dtype)
    gu_all = jnp.zeros((totalu, d, Z), dtype)

    P_head_next = None

    for k in range(topo.NB, -1, -1):
        si = plan.stage_idx[k]
        sx = plan.succ_x_idx[k]
        l, nb = si.shape
        if k == topo.NB:
            W_P = jnp.zeros((nb, nd, nd, Z), dtype)
            W_P = W_P.at[:, :n, :n, :].set(cost.Pterm2)
        else:
            W_P = P_head_next.reshape(nb, m, nd, nd, Z).sum(axis=1)

        def step(carry, inp):
            W_P = carry
            (Qx2, Daa2, Dab2, Ru2, A, B, C) = inp
            P, K, Hinv, Acl, vec1, gu = _stage_step_quad_bl(
                W_P, Qx2, Daa2, Dab2, Ru2, A, B, C, n, d
            )
            return P, (K, Hinv, Acl, vec1, gu)

        rev = si[::-1]
        srev = sx[::-1]
        inputs = (
            cost.Qx2[rev], cost.Daa2[rev], cost.Dab2[rev], cost.Ru2[rev],
            A_bl[srev], B_bl[srev], C_bl[srev],
        )
        P_head, outs = jax.lax.scan(step, W_P, inputs, unroll=True)
        K_s, Hinv_s, Acl_s, vec1_s, gu_s = outs
        K_all = K_all.at[rev].set(K_s)
        Hinv_all = Hinv_all.at[rev].set(Hinv_s)
        Acl_all = Acl_all.at[rev].set(Acl_s)
        vec1_all = vec1_all.at[rev].set(vec1_s)
        gu_all = gu_all.at[rev].set(gu_s)
        A_all = A_all.at[si].set(A_bl[sx])
        B_all = B_all.at[si].set(B_bl[sx])
        h_all = h_all.at[si].set(C_bl[sx])
        P_head_next = P_head

    return dict(K=K_all, Hinv=Hinv_all, Acl=Acl_all, Bmat=B_all, Amat=A_all,
                hvec=h_all, vec1=vec1_all, gu=gu_all)


@_f32_precision
def tree_lqr_linear_bl(plan: StagePlan, fac, qx_eff, qu_eff, qterm_eff,
                       affine: bool = True):
    """Backward linear sweep, batch-last. qx_eff (totalu, n, Z) etc."""
    topo = plan.topo
    n, d, m = topo.n, topo.d, topo.m
    nd = n + d
    dtype = qx_eff.dtype
    Z = qx_eff.shape[-1]
    kff_all = jnp.zeros((topo.totalu, d, Z), dtype)
    p_head_next = None

    for k in range(topo.NB, -1, -1):
        si = plan.stage_idx[k]
        l, nb = si.shape
        if k == topo.NB:
            p0 = jnp.zeros((nb, nd, Z), dtype)
            p0 = p0.at[:, :n, :].set(qterm_eff)
        else:
            p0 = p_head_next.reshape(nb, m, nd, Z).sum(axis=1)

        def step(carry, inp):
            p_next = carry
            (qx, qu, K, Hinv, Acl, vec1, gu, B) = inp
            l_u = qu + jnp.einsum("bnmZ,bnZ->bmZ", B, p_next[:, :n, :]) \
                + p_next[:, n:, :]
            if affine:
                l_u = l_u + gu
            kff = -jnp.einsum("bmkZ,bkZ->bmZ", Hinv, l_u)
            p = jnp.concatenate(
                [qx, jnp.zeros((qx.shape[0], d, Z), qx.dtype)], axis=1
            )
            p = p + jnp.einsum("bnmZ,bnZ->bmZ", Acl, p_next)
            if affine:
                p = p + vec1 + jnp.einsum("bmkZ,bmZ->bkZ", K, qu + gu)
            else:
                p = p + jnp.einsum("bmkZ,bmZ->bkZ", K, qu)
            return p, kff

        rev = si[::-1]
        inputs = (
            qx_eff[rev], qu_eff[rev], fac["K"][rev], fac["Hinv"][rev],
            fac["Acl"][rev], fac["vec1"][rev], fac["gu"][rev], fac["Bmat"][rev],
        )
        p_head, kff_s = jax.lax.scan(step, p0, inputs, unroll=True)
        kff_all = kff_all.at[rev].set(kff_s)
        p_head_next = p_head
    return kff_all


@_f32_precision
def tree_lqr_forward_bl(plan: StagePlan, fac, kff, x0, u_old,
                        affine: bool = True):
    """Forward rollout, batch-last. x0 (n, Z), u_old (d, Z).
    Returns (x_nodes (totalx, n, Z), u (totalu, d, Z))."""
    topo = plan.topo
    n, d, m = topo.n, topo.d, topo.m
    dtype = x0.dtype
    Z = x0.shape[-1]
    x_nodes = jnp.zeros((topo.totalx, n, Z), dtype)
    u_all = jnp.zeros((topo.totalu, d, Z), dtype)

    xi = jnp.concatenate([x0, u_old], axis=0)[None]       # (1, nd, Z)

    for k in range(topo.NB + 1):
        si = plan.stage_idx[k]
        xniv = plan.xnode_idx[k]
        l, nb = si.shape

        def step(carry, inp):
            xi = carry                                    # (nb, nd, Z)
            (K, kf, Acl, B, h) = inp
            u = jnp.einsum("bmkZ,bkZ->bmZ", K, xi) + kf
            xi_next = jnp.einsum("bnkZ,bkZ->bnZ", Acl, xi)
            if affine:
                xi_next = xi_next.at[:, :n, :].add(h)
            xi_next = xi_next + jnp.concatenate(
                [jnp.einsum("bnmZ,bmZ->bnZ", B, kf), kf], axis=1
            )
            return xi_next, (u, xi[:, :n, :])

        inputs = (fac["K"][si], kff[si], fac["Acl"][si], fac["Bmat"][si],
                  fac["hvec"][si])
        xi_end, (u_s, xnode_s) = jax.lax.scan(step, xi, inputs, unroll=True)
        u_all = u_all.at[si].set(u_s)
        x_nodes = x_nodes.at[xniv].set(xnode_s)
        if k < topo.NB:
            xi = jnp.repeat(xi_end, m, axis=0)
        else:
            x_nodes = x_nodes.at[plan.leaf_term_idx].set(xi_end[:, :n, :])
    return x_nodes, u_all


@_f32_precision
def qp_ipm_solve_bl(
    plan: StagePlan,
    cost: StageCost,
    A_bl, B_bl, C_bl,
    dh_bl, h0_bl,
    Fx, bx, Fu, bu,
    x_warm_bl, u_warm_bl,
    cfg: QPIPMConfig = QPIPMConfig(),
):
    """Batch-last Mehrotra IPM on the tree QP — math identical to
    ``tree_qp_ipm.qp_ipm_solve`` (per-lane scalars become (Z,) vectors).

    cost fields, linearizations, warm starts and x0 are batch-last; Fx/Fu/bx/bu
    are shared across lanes. Returns (x_nodes, u, s, aux) batch-last."""
    topo = plan.topo
    n, d = topo.n, topo.d
    totalu = topo.totalu
    dtype = x_warm_bl.dtype
    Z = x_warm_bl.shape[-1]
    Fx = jnp.asarray(Fx, dtype)
    bx = jnp.asarray(bx, dtype)
    Fu = jnp.asarray(Fu, dtype)
    bu = jnp.asarray(bu, dtype)
    nFx = Fx.shape[0]
    Nc = nFx + 1

    # rows: R1 Fxc·x − s ≤ b1 ; R2 Fu·u ≤ bu ; R3 −s ≤ 0
    Fxc = jnp.concatenate(
        [-dh_bl[:, None, :, :],
         jnp.broadcast_to(Fx[None, :, :, None], (totalu, nFx, n, Z))], axis=1
    )                                                    # (totalu, Nc, n, Z)
    b1 = jnp.concatenate(
        [h0_bl[:, None, :],
         jnp.broadcast_to(bx[None, :, None], (totalu, nFx, Z))], axis=1
    )                                                    # (totalu, Nc, Z)

    cx_nodes = np.asarray(topo.cnode_x)
    leaf_term = plan.leaf_term_idx

    slin = cost.slack_lin[:, None, :] * jnp.ones((1, Nc, 1), dtype)

    x_i = x_warm_bl
    u_i = u_warm_bl
    s_i = jnp.zeros((totalu, Nc, Z), dtype)

    rows1 = jnp.einsum("brnZ,bnZ->brZ", Fxc, x_i[cx_nodes]) - s_i
    sl1 = jnp.maximum(b1 - rows1, cfg.sl_min)
    lam1 = cfg.mu0 / sl1
    sl2 = jnp.maximum(bu[None, :, None]
                      - jnp.einsum("rn,bnZ->brZ", Fu, u_i), cfg.sl_min)
    lam2 = cfg.mu0 / sl2
    sl3 = jnp.maximum(s_i, cfg.sl_min)
    lam3 = cfg.mu0 / sl3
    mtot = float(sl1.shape[0] * sl1.shape[1] + sl2.shape[0] * sl2.shape[1]
                 + sl3.shape[0] * sl3.shape[1])

    w_max_eff = cfg.w_max if dtype == jnp.float64 else min(cfg.w_max, 1e6)
    eye_n = jnp.eye(n, dtype=dtype)[None, :, :, None]
    eye_d = jnp.eye(d, dtype=dtype)[None, :, :, None]

    def sum3(v):
        """Σ over (node, row) axes → (Z,)."""
        return jnp.sum(v, axis=(0, 1))

    def factor(lam1_, sl1_, lam2_, sl2_, lam3_, sl3_):
        clampw = lambda w: jnp.minimum(w, w_max_eff)
        w1 = clampw(lam1_ / sl1_)
        w2 = clampw(lam2_ / sl2_)
        w3 = clampw(lam3_ / sl3_)
        kap = cost.slack_quad + w1 + w3 + cfg.reg
        coefs = w1 - w1 * w1 / kap
        Qx2 = cost.Qx2 + jnp.einsum("brZ,briZ,brjZ->bijZ", coefs, Fxc, Fxc)
        Qx2 = Qx2 + cfg.reg * eye_n
        Ru2 = cost.Ru2 + jnp.einsum("brZ,ri,rj->bijZ", w2, Fu, Fu)
        Ru2 = Ru2 + cfg.reg * eye_d
        Pterm2 = cost.Pterm2 + cfg.reg * eye_n
        cost_eff = cost._replace(Qx2=Qx2, Ru2=Ru2, Pterm2=Pterm2)
        fac = tree_lqr_factor_bl(plan, cost_eff, A_bl, B_bl, C_bl)
        return fac, (w1, w2, w3, kap)

    def kkt_solve(fac, ws, qx, qu, qterm, qs):
        w1, w2, w3, kap = ws
        qx_eff = qx + jnp.einsum("brnZ,brZ->bnZ", Fxc, (w1 / kap) * qs)
        kff = tree_lqr_linear_bl(plan, fac, qx_eff, qu, qterm, affine=False)
        dx, du = tree_lqr_forward_bl(
            plan, fac, kff, jnp.zeros((n, Z), dtype), jnp.zeros((d, Z), dtype),
            affine=False,
        )
        dsv = (jnp.einsum("brZ,brnZ,bnZ->brZ", w1, Fxc, dx[cx_nodes]) - qs) / kap
        return dx, du, dsv

    # rate-edge index plumbing for the dual residual (same as per-lane solver)
    pred_uu = np.asarray(topo.pred_uu).copy()
    has_edge = pred_uu >= 0
    pred_uu[0] = 0
    pe = jnp.asarray(pred_uu)
    he = jnp.asarray(has_edge, dtype)[:, None, None]

    def iteration(carry, it_idx):
        ((x_c, u_c, s_c, sl1_, lam1_, sl2_, lam2_, sl3_, lam3_), best) = carry
        rows1 = jnp.einsum("brnZ,bnZ->brZ", Fxc, x_c[cx_nodes]) - s_c
        rows2 = jnp.einsum("rn,bnZ->brZ", Fu, u_c)
        r1 = rows1 + sl1_ - b1
        r2 = rows2 + sl2_ - bu[None, :, None]
        r3 = -s_c + sl3_
        gap = (sum3(sl1_ * lam1_) + sum3(sl2_ * lam2_)
               + sum3(sl3_ * lam3_)) / mtot                      # (Z,)

        fac, ws = factor(lam1_, sl1_, lam2_, sl2_, lam3_, sl3_)

        rd_x = jnp.einsum("bijZ,bjZ->biZ", cost.Qx2, x_c[cx_nodes]) + cost.qx
        rd_x = rd_x + jnp.einsum("brnZ,brZ->bnZ", Fxc, lam1_)
        rd_u = jnp.einsum("bijZ,bjZ->biZ", cost.Ru2, u_c) + cost.qu
        rd_u = rd_u + he * jnp.einsum("bjiZ,bjZ->biZ", cost.Dab2, u_c[pe])
        back = jnp.zeros_like(rd_u)
        back = back.at[pe].add(he * jnp.einsum("bijZ,bjZ->biZ", cost.Dab2, u_c))
        rd_u = rd_u + back
        rd_u = rd_u + jnp.einsum("rn,brZ->bnZ", Fu, lam2_)
        rd_s = cost.slack_quad * s_c + slin - lam1_ - lam3_
        rd_term = jnp.einsum("bijZ,bjZ->biZ", cost.Pterm2, x_c[leaf_term]) \
            + cost.qterm

        def direction(rc1, rc2, rc3):
            ex1 = (-rc1 + lam1_ * r1) / sl1_
            ex2 = (-rc2 + lam2_ * r2) / sl2_
            ex3 = (-rc3 + lam3_ * r3) / sl3_
            qx = rd_x + jnp.einsum("brnZ,brZ->bnZ", Fxc, ex1)
            qu = rd_u + jnp.einsum("rn,brZ->bnZ", Fu, ex2)
            qs = rd_s + (-ex1) + (-ex3)
            dx, du, dsv = kkt_solve(fac, ws, qx, qu, rd_term, qs)
            drow1 = jnp.einsum("brnZ,bnZ->brZ", Fxc, dx[cx_nodes]) - dsv
            drow2 = jnp.einsum("rn,bnZ->brZ", Fu, du)
            dsl1 = -r1 - drow1
            dsl2 = -r2 - drow2
            dsl3 = -r3 + dsv
            dlam1 = (-rc1 - lam1_ * dsl1) / sl1_
            dlam2 = (-rc2 - lam2_ * dsl2) / sl2_
            dlam3 = (-rc3 - lam3_ * dsl3) / sl3_
            return dx, du, dsv, dsl1, dlam1, dsl2, dlam2, dsl3, dlam3

        da = direction(sl1_ * lam1_, sl2_ * lam2_, sl3_ * lam3_)

        def max_step(v, dv):
            ratio = jnp.where(dv < 0, -v / dv, jnp.inf)
            return jnp.minimum(1.0, jnp.min(ratio, axis=(0, 1)))   # (Z,)

        def all_step(dirs):
            (_, _, _, dsl1, dlam1, dsl2, dlam2, dsl3, dlam3) = dirs
            a = jnp.minimum(max_step(sl1_, dsl1), max_step(lam1_, dlam1))
            a = jnp.minimum(a, jnp.minimum(max_step(sl2_, dsl2),
                                           max_step(lam2_, dlam2)))
            a = jnp.minimum(a, jnp.minimum(max_step(sl3_, dsl3),
                                           max_step(lam3_, dlam3)))
            return a

        a_aff = all_step(da)
        (_, _, _, dsl1a, dlam1a, dsl2a, dlam2a, dsl3a, dlam3a) = da
        gap_aff = (
            sum3((sl1_ + a_aff * dsl1a) * (lam1_ + a_aff * dlam1a))
            + sum3((sl2_ + a_aff * dsl2a) * (lam2_ + a_aff * dlam2a))
            + sum3((sl3_ + a_aff * dsl3a) * (lam3_ + a_aff * dlam3a))
        ) / mtot
        sigma_c = jnp.clip((gap_aff / (gap + 1e-30)) ** 3, 0.0, 1.0)

        dc = direction(
            sl1_ * lam1_ + dsl1a * dlam1a - sigma_c * gap,
            sl2_ * lam2_ + dsl2a * dlam2a - sigma_c * gap,
            sl3_ * lam3_ + dsl3a * dlam3a - sigma_c * gap,
        )
        a0 = cfg.tau * all_step(dc)
        a0 = jnp.where(gap < cfg.gap_tol * (1.0 + jnp.abs(gap)), 0.0, a0)
        (dx, du, dsv, dsl1, dlam1, dsl2, dlam2, dsl3, dlam3) = dc

        def gap_at(a):
            return (
                sum3((sl1_ + a * dsl1) * (lam1_ + a * dlam1))
                + sum3((sl2_ + a * dsl2) * (lam2_ + a * dlam2))
                + sum3((sl3_ + a * dsl3) * (lam3_ + a * dlam3))
            ) / mtot

        grow = 10.0 * gap + 1e-10
        a1 = jnp.where(gap_at(a0) > grow, 0.3 * a0, a0)
        a = jnp.where(gap_at(a1) > grow, 0.3 * a1, a1)

        new = (
            x_c + a * dx, u_c + a * du, s_c + a * dsv,
            sl1_ + a * dsl1, lam1_ + a * dlam1,
            sl2_ + a * dsl2, lam2_ + a * dlam2,
            sl3_ + a * dsl3, lam3_ + a * dlam3,
        )
        (bx_, bu_, bs_, bgap) = best
        better = gap < bgap
        best_new = (
            jnp.where(better, x_c, bx_), jnp.where(better, u_c, bu_),
            jnp.where(better, s_c, bs_), jnp.where(better, gap, bgap),
        )
        return (new, best_new), gap

    best0 = (x_i, u_i, s_i, jnp.full((Z,), np.inf, dtype))
    carry = ((x_i, u_i, s_i, sl1, lam1, sl2, lam2, sl3, lam3), best0)
    (state_f, best_f), gaps = jax.lax.scan(iteration, carry,
                                           jnp.arange(cfg.iters))
    gap_last = gaps[-1]                                    # (Z,)
    bx_, bu_, bs_, bgap = best_f
    use_last = gap_last <= bgap
    x_f = jnp.where(use_last, state_f[0], bx_)
    u_f = jnp.where(use_last, state_f[1], bu_)
    s_f = jnp.where(use_last, state_f[2], bs_)
    gap_f = jnp.where(use_last, gap_last, bgap)
    rows1 = jnp.einsum("brnZ,bnZ->brZ", Fxc, x_f[cx_nodes]) - s_f
    rows2 = jnp.einsum("rn,bnZ->brZ", Fu, u_f)
    prim = jnp.maximum(
        jnp.max(jnp.maximum(rows1 - b1, 0.0), axis=(0, 1)),
        jnp.maximum(
            jnp.max(jnp.maximum(rows2 - bu[None, :, None], 0.0), axis=(0, 1)),
            jnp.max(jnp.maximum(-s_f, 0.0), axis=(0, 1)),
        ),
    )                                                      # (Z,)
    aux = {"prim_res": prim, "gap": gap_f, "gaps": gaps}
    return x_f, u_f, s_f, aux
