"""Structured interior-point solver for the tree QP (alternative to ADMM).

Same program as ``solvers/tree_qp.admm_solve`` — the reference's
probability-weighted tree QP with slacks (``MPC_branch.py:185-382``) — solved by
a Mehrotra predictor-corrector IPM instead of OSQP-style ADMM. All inequality
rows are stage-local, so each Newton system is exactly one tree-Riccati
factorization (the barrier-weighted Hessian keeps the reference cost's rate-
coupling edges) plus per-stage eliminations of the decision slacks; no Woodbury
terms are needed (unlike the CVaR cones). With the near-feasible start
(``sl_min`` note below) cold solves reach machine precision in ~12-13
iterations and warm-primal receding-horizon solves in ~10, vs hundreds of ADMM
iterations for comparable accuracy — at roughly one factorization + four
linear sweeps per iteration.

Safeguards as in ``cvar_ipm``: centered start, σ∈[0,1], step-quality backoff,
best-iterate tracking, freeze on convergence.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from belief_planning_tpu.solvers.tree_qp import (
    StageCost,
    StagePlan,
    _f32_precision,
    tree_lqr_factor,
    tree_lqr_forward,
    tree_lqr_linear,
)
from belief_planning_tpu.tree.engine import TreeState


@dataclass(frozen=True)
class QPIPMConfig:
    iters: int = 30
    reg: float = 1e-8
    tau: float = 0.99
    mu0: float = 10.0
    w_max: float = 1e12
    gap_tol: float = 1e-10
    # Slack floor of the starting point: sl = max(b - rows, sl_min). The rows
    # are evaluated at the rolled-out (warm-shifted) primal trajectory, which
    # is typically strictly feasible, so a small floor keeps the start nearly
    # primal-feasible. The historical value 1.0 manufactured infeasibility on
    # every row with true slack < 1 and cost ~7 iterations of transient (gap
    # peak ~3e4 on the overtake config) before convergence even began;
    # 0.1 removes the transient entirely: cold solves converge by ~12
    # iterations, warm-primal receding-horizon solves by ~10.
    # (Dual warm-starting was tried and measured strictly worse: carrying the
    # previous solve's multipliers starts on the boundary of the new problem's
    # active set and the fraction-to-boundary rule blocks every step at
    # α ~ 1e-5 even with a Mehrotra lift — see CLAUDE.md perf notes.)
    sl_min: float = 0.1
    # Gondzio multiple centrality correctors: after the Mehrotra corrector,
    # `gondzio` extra factorization-reusing solves per iteration, each on a
    # pure complementarity rhs that pushes outlier trial products back into
    # [bmin·σμ, bmax·σμ]. Same scheme (and measured motivation) as
    # ``CVaRIPMConfig.gondzio`` — see cvar_ipm.py.
    gondzio: int = 0
    # f32 accuracy wall (measured 2026-08-20, cold demo overtake): the f32
    # Mehrotra iteration destabilizes once the duality gap reaches ~1e-2 —
    # the barrier weights hit the f32 clamp (1e6, κ·eps ≈ 0.12), directions
    # turn to noise, the gap explodes (f64 recovers to 1e-8 via the same
    # trajectory), and the tracked best iterate keeps ~1e-2-scale error on
    # ACTIVE bounds, independent of iteration count. An active-set polish
    # (augmented-Lagrangian Newton passes at fixed moderate weight, with
    # drop/add working-set iteration) was built and measured: the working set
    # oscillates from the poorly-resolved gap-1e-2 start and f32 noise
    # accumulates through the passes — strictly worse than no polish (f64
    # from a *converged* start with exact actives still leaves weakly-active
    # rows 1e-2 violated after 4 passes). Rejected; the supported mitigation
    # is the f64 restart phase (``make_branch_mpc_batched_step(refine_f64=k)``)
    # which re-enters the barrier method in TPU-emulated f64 where there is
    # no wall.
    gondzio_bmin: float = 0.1
    gondzio_bmax: float = 10.0


@_f32_precision
def qp_ipm_solve(
    plan: StagePlan,
    cost: StageCost,
    ts: TreeState,
    Fx, bx, Fu, bu,
    x0, OldInput,
    cfg: QPIPMConfig = QPIPMConfig(),
    Fxc_override=None,
    b1_override=None,
    warm_primal=None,
):
    """Solve the tree QP (½-form cost in ``cost``). Returns
    (x_nodes, u, s, aux dict) compatible with ``admm_solve`` call sites."""
    topo = plan.topo
    n, d = topo.n, topo.d
    totalu = topo.totalu
    dtype = ts.x_lin.dtype
    Fx = jnp.asarray(Fx, dtype)
    bx = jnp.asarray(bx, dtype)
    Fu = jnp.asarray(Fu, dtype)
    bu = jnp.asarray(bu, dtype)
    x0 = jnp.asarray(x0, dtype)
    OldInput = jnp.asarray(OldInput, dtype)
    nFx = Fx.shape[0]
    nFu = Fu.shape[0]

    # Constraint-row operators. In the standard (non-override) layout only row
    # 0 of each stage's block varies per stage/lane (−dh from the collision
    # linearization); rows 1..nFx are the SHARED state-bound matrix Fx. The
    # split forms below exploit that: no (totalu, Nc, n) per-lane Fxc tensor is
    # ever materialized, the shared rows contract against Fx directly, and the
    # per-stage part is a rank-one dh term — this is the dominant per-iteration
    # cost outside the Riccati sweeps. The override path (robust/HMM
    # controllers with padded per-time rows) keeps the generic dense block.
    if Fxc_override is not None:
        Fxc = jnp.asarray(Fxc_override, dtype)
        b1 = jnp.asarray(b1_override, dtype)
        Nc = Fxc.shape[1]

        def row_mul(xv):
            """(totalu, n) → Fxc·x (totalu, Nc)."""
            return jnp.einsum("brn,bn->br", Fxc, xv)

        def row_mulT(v):
            """(totalu, Nc) → Fxcᵀ·v (totalu, n)."""
            return jnp.einsum("brn,br->bn", Fxc, v)

        def row_quad(coefs):
            """(totalu, Nc) → Σ_r coefs_r F_r F_rᵀ (totalu, n, n)."""
            return jnp.einsum("br,bri,brj->bij", coefs, Fxc, Fxc)
    else:
        Nc = nFx + 1
        dh = ts.dh                                       # (totalu, n)
        b1 = jnp.concatenate(
            [ts.h0[:, None], jnp.broadcast_to(bx, (totalu, nFx))], axis=1
        )

        def row_mul(xv):
            r0 = -jnp.sum(dh * xv, axis=-1)
            rr = jnp.einsum("rn,bn->br", Fx, xv)
            return jnp.concatenate([r0[:, None], rr], axis=1)

        def row_mulT(v):
            return -dh * v[:, :1] + jnp.einsum("rn,br->bn", Fx, v[:, 1:])

        def row_quad(coefs):
            rank1 = coefs[:, 0, None, None] * dh[:, :, None] * dh[:, None, :]
            shared = jnp.einsum("br,ri,rj->bij", coefs[:, 1:], Fx, Fx)
            return rank1 + shared

    cx_nodes = np.asarray(topo.cnode_x)
    leaf_term = plan.leaf_term_idx

    # base cost pieces (½-form): quadratic P̂ blocks live in `cost`; linear
    # base terms are cost.qx / cost.qu / cost.qterm; slack cost is linear
    # cost.slack_lin (per stage, per-row) + quadratic cost.slack_quad.
    slin = cost.slack_lin[:, None] * jnp.ones((1, Nc), dtype)

    # variables: x (totalx,n), u (totalu,d), s (totalu,Nc)
    # rows: R1 Fxc·x − s ≤ b1 ; R2 Fu·u ≤ bu ; R3 −s ≤ 0
    x_i = ts.x_lin if warm_primal is None else warm_primal[0]
    u_i = ts.u_lin if warm_primal is None else warm_primal[1]
    s_i = jnp.zeros((totalu, Nc), dtype)

    rows1 = row_mul(x_i[cx_nodes]) - s_i
    sl1 = jnp.maximum(b1 - rows1, cfg.sl_min)
    lam1 = cfg.mu0 / sl1
    sl2 = jnp.maximum(bu[None] - jnp.einsum("rn,bn->br", Fu, u_i), cfg.sl_min)
    lam2 = cfg.mu0 / sl2
    sl3 = jnp.maximum(s_i, cfg.sl_min)
    lam3 = cfg.mu0 / sl3
    mtot = float(sl1.size + sl2.size + sl3.size)

    w_max_eff = cfg.w_max if dtype == jnp.float64 else min(cfg.w_max, 1e6)

    def factor(lam1_, sl1_, lam2_, sl2_, lam3_, sl3_):
        clampw = lambda w: jnp.minimum(w, w_max_eff)
        w1 = clampw(lam1_ / sl1_)
        w2 = clampw(lam2_ / sl2_)
        w3 = clampw(lam3_ / sl3_)
        kap = cost.slack_quad + w1 + w3 + cfg.reg
        coefs = w1 - w1 * w1 / kap
        Qx2 = cost.Qx2 + row_quad(coefs)
        Qx2 = Qx2 + cfg.reg * jnp.eye(n, dtype=dtype)[None]
        Ru2 = cost.Ru2 + jnp.einsum("br,ri,rj->bij", w2, Fu, Fu)
        Ru2 = Ru2 + cfg.reg * jnp.eye(d, dtype=dtype)[None]
        Pterm2 = cost.Pterm2 + cfg.reg * jnp.eye(n, dtype=dtype)[None]
        cost_eff = cost._replace(Qx2=Qx2, Ru2=Ru2, Pterm2=Pterm2)
        fac = tree_lqr_factor(plan, cost_eff, ts)
        return fac, (w1, w2, w3, kap)

    def kkt_solve(fac, ws, qx, qu, qterm, qs):
        w1, w2, w3, kap = ws
        qx_eff = qx + row_mulT((w1 / kap) * qs)
        kff = tree_lqr_linear(plan, fac, qx_eff, qu, qterm, affine=False)
        dx, du = tree_lqr_forward(
            plan, fac, kff, jnp.zeros((n,), dtype), jnp.zeros((d,), dtype),
            affine=False,
        )
        dsv = (w1 * row_mul(dx[cx_nodes]) - qs) / kap
        return dx, du, dsv

    def iteration(carry, it_idx):
        ((x_c, u_c, s_c, sl1_, lam1_, sl2_, lam2_, sl3_, lam3_), best) = carry
        rows1 = row_mul(x_c[cx_nodes]) - s_c
        rows2 = jnp.einsum("rn,bn->br", Fu, u_c)
        r1 = rows1 + sl1_ - b1
        r2 = rows2 + sl2_ - bu[None]
        r3 = -s_c + sl3_
        gap = (jnp.sum(sl1_ * lam1_) + jnp.sum(sl2_ * lam2_)
               + jnp.sum(sl3_ * lam3_)) / mtot

        fac, ws = factor(lam1_, sl1_, lam2_, sl2_, lam3_, sl3_)

        # dual residual: P̂v + q̂ + Aᵀλ  (P̂v via cost blocks; the x-cost of each
        # stage is block-diagonal + rate edges handled through the same
        # assembly the factorization uses — here we form it directly)
        # x-part: 2·Qx2_base·x? cost.Qx2 is already 2·w(dQ+Q) (½-form Hessian)
        rd_x = jnp.einsum("bij,bj->bi", cost.Qx2, x_c[cx_nodes]) + cost.qx
        rd_x = rd_x + row_mulT(lam1_)
        # u-part incl. rate-coupling edges (Dab2 with pred/succ stages)
        rd_u = jnp.einsum("bij,bj->bi", cost.Ru2, u_c) + cost.qu
        pred_uu = np.asarray(topo.pred_uu).copy()
        has_edge = pred_uu >= 0
        pred_uu[0] = 0
        pe = jnp.asarray(pred_uu)
        he = jnp.asarray(has_edge, dtype)[:, None]
        # edge j: u_predᵀ Dab2_j u_j → grad_u_j += Dab2ᵀ u_pred ; grad_pred += Dab2 u_j
        rd_u = rd_u + he * jnp.einsum("bji,bj->bi", cost.Dab2, u_c[pe])
        back = jnp.zeros_like(rd_u)
        back = back.at[pe].add(
            he * jnp.einsum("bij,bj->bi", cost.Dab2, u_c)
        )
        rd_u = rd_u + back
        rd_u = rd_u + jnp.einsum("rn,br->bn", Fu, lam2_)
        rd_s = cost.slack_quad * s_c + slin - lam1_ - lam3_
        rd_term = jnp.einsum("bij,bj->bi", cost.Pterm2, x_c[leaf_term]) + cost.qterm

        def direction(rc1, rc2, rc3):
            ex1 = (-rc1 + lam1_ * r1) / sl1_
            ex2 = (-rc2 + lam2_ * r2) / sl2_
            ex3 = (-rc3 + lam3_ * r3) / sl3_
            qx = rd_x + row_mulT(ex1)
            qu = rd_u + jnp.einsum("rn,br->bn", Fu, ex2)
            qs = rd_s + (-ex1) + (-ex3)
            dx, du, dsv = kkt_solve(fac, ws, qx, qu, rd_term, qs)
            drow1 = row_mul(dx[cx_nodes]) - dsv
            drow2 = jnp.einsum("rn,bn->br", Fu, du)
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
            return jnp.minimum(1.0, jnp.min(ratio))

        def all_step(dirs):
            (_, _, _, dsl1, dlam1, dsl2, dlam2, dsl3, dlam3) = dirs
            a = jnp.minimum(max_step(sl1_, dsl1), max_step(lam1_, dlam1))
            a = jnp.minimum(a, jnp.minimum(max_step(sl2_, dsl2), max_step(lam2_, dlam2)))
            a = jnp.minimum(a, jnp.minimum(max_step(sl3_, dsl3), max_step(lam3_, dlam3)))
            return a

        a_aff = all_step(da)
        (_, _, _, dsl1a, dlam1a, dsl2a, dlam2a, dsl3a, dlam3a) = da
        gap_aff = (
            jnp.sum((sl1_ + a_aff * dsl1a) * (lam1_ + a_aff * dlam1a))
            + jnp.sum((sl2_ + a_aff * dsl2a) * (lam2_ + a_aff * dlam2a))
            + jnp.sum((sl3_ + a_aff * dsl3a) * (lam3_ + a_aff * dlam3a))
        ) / mtot
        sigma_c = jnp.clip((gap_aff / (gap + 1e-30)) ** 3, 0.0, 1.0)

        dc = direction(
            sl1_ * lam1_ + dsl1a * dlam1a - sigma_c * gap,
            sl2_ * lam2_ + dsl2a * dlam2a - sigma_c * gap,
            sl3_ * lam3_ + dsl3a * dlam3a - sigma_c * gap,
        )

        def direction_pure(rc1, rc2, rc3):
            """`direction` with zero primal/dual residual terms — the rhs of
            a pure centrality correction (reuses the iteration's factor)."""
            ex1 = -rc1 / sl1_
            ex2 = -rc2 / sl2_
            ex3 = -rc3 / sl3_
            qx = row_mulT(ex1)
            qu = jnp.einsum("rn,br->bn", Fu, ex2)
            qs = -ex1 - ex3
            dx, du, dsv = kkt_solve(
                fac, ws, qx, qu, jnp.zeros_like(rd_term), qs)
            drow1 = row_mul(dx[cx_nodes]) - dsv
            drow2 = jnp.einsum("rn,bn->br", Fu, du)
            dsl1 = -drow1
            dsl2 = -drow2
            dsl3 = dsv
            dlam1 = (-rc1 - lam1_ * dsl1) / sl1_
            dlam2 = (-rc2 - lam2_ * dsl2) / sl2_
            dlam3 = (-rc3 - lam3_ * dsl3) / sl3_
            return dx, du, dsv, dsl1, dlam1, dsl2, dlam2, dsl3, dlam3

        # Gondzio multiple centrality correctors (see QPIPMConfig.gondzio)
        for _ in range(cfg.gondzio):
            mu_t = sigma_c * gap + 1e-30
            a_cur = all_step(dc)
            ab = jnp.minimum(1.0, cfg.tau * a_cur + 0.3)
            (_, _, _, gdsl1, gdlam1, gdsl2, gdlam2, gdsl3, gdlam3) = dc
            cap = 10.0 * cfg.gondzio_bmax * mu_t

            def outlier(v, dv, lam, dlam):
                p = (v + ab * dv) * (lam + ab * dlam)
                t = jnp.clip(p, cfg.gondzio_bmin * mu_t,
                             cfg.gondzio_bmax * mu_t)
                # cap the correction: uncapped p − t on far-off-center rows
                # overflows through the 1/sl recovery and poisons the lane
                return jnp.clip(p - t, -cap, cap)

            dd = direction_pure(
                outlier(sl1_, gdsl1, lam1_, gdlam1),
                outlier(sl2_, gdsl2, lam2_, gdlam2),
                outlier(sl3_, gdsl3, lam3_, gdlam3))
            cand = tuple(c + e for c, e in zip(dc, dd))
            a_new = all_step(cand)
            # NaN components pass max_step unnoticed (NaN < 0 is False →
            # ratio ∞) — require explicit finiteness before accepting
            cand_ok = jnp.asarray(True)
            for c in cand:
                cand_ok = jnp.logical_and(cand_ok, jnp.all(jnp.isfinite(c)))
            accept = jnp.logical_and(a_new > a_cur, cand_ok)
            dc = tuple(jnp.where(accept, c, o) for c, o in zip(cand, dc))

        a0 = cfg.tau * all_step(dc)
        a0 = jnp.where(gap < cfg.gap_tol * (1.0 + jnp.abs(gap)), 0.0, a0)
        (dx, du, dsv, dsl1, dlam1, dsl2, dlam2, dsl3, dlam3) = dc

        def gap_at(a):
            return (
                jnp.sum((sl1_ + a * dsl1) * (lam1_ + a * dlam1))
                + jnp.sum((sl2_ + a * dsl2) * (lam2_ + a * dlam2))
                + jnp.sum((sl3_ + a * dsl3) * (lam3_ + a * dlam3))
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
        return (new, best_new), (gap, a)

    best0 = (x_i, u_i, s_i, jnp.asarray(np.inf, dtype))
    carry = ((x_i, u_i, s_i, sl1, lam1, sl2, lam2, sl3, lam3), best0)
    (state_f, best_f), (gaps, steps_tr) = jax.lax.scan(
        iteration, carry, jnp.arange(cfg.iters))
    gap_last = gaps[-1]
    bx_, bu_, bs_, bgap = best_f
    use_last = gap_last <= bgap
    x_f = jnp.where(use_last, state_f[0], bx_)
    u_f = jnp.where(use_last, state_f[1], bu_)
    s_f = jnp.where(use_last, state_f[2], bs_)
    gap_f = jnp.minimum(gap_last, bgap)
    # primal feasibility report
    rows1 = row_mul(x_f[cx_nodes]) - s_f
    rows2 = jnp.einsum("rn,bn->br", Fu, u_f)
    prim = jnp.maximum(
        jnp.max(jnp.maximum(rows1 - b1, 0.0)),
        jnp.maximum(jnp.max(jnp.maximum(rows2 - bu[None], 0.0)),
                    jnp.max(jnp.maximum(-s_f, 0.0))),
    )
    # gaps/steps: per-iteration complementarity and accepted step size —
    # convergence diagnostics (bench health checks, iteration-count tuning)
    aux = {"prim_res": prim, "gap": gap_f, "gaps": gaps, "steps": steps_tr}
    return x_f, u_f, s_f, aux
