"""Structured interior-point solver for the nested-CVaR tree SOCP.

The reference CVaR program (``MPC_branch.py:1598-2152``) is a convex QCQP (every
cone is a convex quadratic — see ``oracle/qcqp.py``). This solver runs a
Mehrotra predictor-corrector IPM whose Newton systems are solved structurally:

- variables: tree states/inputs (x, u), per-node collision slacks s, risk
  variables r = [ρ; σ; μ⁺; μ⁻] (the epigraph J is eliminated — it appears only
  in the root cone, so the objective becomes the root-cone expression
  ``u₀ᵀRu₀ + ρ₀ + Qslack₁·Σs₀`` directly);
- the λ-weighted Hessian is per-stage block-diagonal (each stage belongs to
  exactly one cost-to-go cone), so each Newton step is a tree-Riccati
  factorization + linear sweeps;
- the IPM's ``(λ_k/s_k)·∇q_k∇q_kᵀ`` terms (one per cone, K = bdim·m) are exact
  rank-one corrections applied by a Woodbury identity with columns from
  affine-free response sweeps;
- decision slacks s are eliminated per row; risk variables and the risk-
  recursion equalities (``Arisk``) live in a small dense KKT block.

Per-iteration cost: one tree factorization + O(K) linear sweeps. ~40-80
iterations reach ECOS-grade accuracy (vs thousands for cone ADMM).
Quirk-compatible μ-slot maps as in ``solvers/cvar.py``.

Precision note: in float64 (tests/closed-loop parity) this solver matches the
oracle to ~1e-4. Float32 conditioning is handled by (a) per-cone scaling
(``cscale`` below — raw cost-to-go cone values are O(1e3-1e4) and used to
stall/overflow f32 cold starts entirely) and (b) the near-feasible linear-row
start (``sl_min``). Measured on the full overtake config (B=256 random cold
starts, 40 iters, real v5e): every lane finite and bounded, gap p50 ~1.0,
p99 ~5 — no stalled-at-start lanes (was: p50 = p99 = initial gap 10). f32
gaps remain O(1) rather than parity-grade: Newton directions through the f32
tree factorization + Woodbury are noisy enough that the step-quality backoff
keeps steps short; f64 (CPU) convergence is unaffected. Candidate next step:
one round of iterative refinement per KKT solve.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from belief_planning_tpu.solvers.cvar import CVaRPlan, _psd_sqrt, build_cvar_plan
from belief_planning_tpu.solvers.tree_qp import (
    StageCost,
    _f32_precision,
    small_dense_inv,
    tree_lqr_factor,
    tree_lqr_forward,
    tree_lqr_linear,
)
from belief_planning_tpu.tree.engine import TreeState


@dataclass(frozen=True)
class CVaRIPMConfig:
    iters: int = 40
    reg: float = 1e-8
    tau: float = 0.99      # fraction-to-boundary
    a_cap_early: float = 0.7   # step cap for the first few (cold) iterations
    early_iters: int = 6
    w_max: float = 1e12    # clamp on barrier weights λ/s (numerical safety)
    # f32 clamp: min(w_max, w_max_f32) applies when the iterate dtype is f32.
    # The clamp changes the Newton SYSTEM (not just its conditioning) once
    # active-row weights exceed it — a candidate cause of the f32 stall at
    # gap~1.5 (f64 weights pass 1e6 right around that phase).
    w_max_f32: float = 1e6
    gap_tol: float = 1e-9  # freeze the iterate once the (scaled) gap is below
    # Iterative-refinement rounds per structured KKT solve: after the
    # factorized solve (tree Riccati + Woodbury + risk saddle), apply the full
    # KKT operator in closed form (m_apply below), and re-solve on the
    # residual. Costs one extra linear sweep pair per solve (2 per IPM
    # iteration). Measured (2026-08-18, overtake cold-start batch, f32 TPU):
    # does NOT fix the f32 convergence stall — the per-iteration gap
    # trajectories for refine 0/1/2 are identical until ~it16 (steps there are
    # fraction-to-boundary-limited, not direction-limited), and the late-phase
    # stall at gap~1.5 persists (refine=2 tames the worst gap excursions:
    # max 2.3e3 → 3.4e2, but p50 unchanged). Kept for targeted use; default
    # off. See scripts/cvar_f32_diag.py.
    refine: int = 0
    # Residual precision for refinement rounds: "same" computes M·v + q in the
    # iterate dtype; "f64" computes it in float64 (requires jax_enable_x64 —
    # silently falls back to f32 otherwise). Mixed-precision refinement (f32
    # factorization + f64 residuals) is the classical cure for the κ·eps32
    # forward-error wall: same-precision residuals only restore backward
    # stability, they cannot recover forward accuracy once κ(KKT)·eps32 ≳ 1,
    # which is exactly the late-phase stall measured in f32 (gap pinned ~1.5
    # while f64 converges to 1e-5 from the same iterate — cvar_f32_diag.py).
    refine_dtype: str = "same"
    # Outer-iteration precision: "same" runs everything in the iterate dtype;
    # "f64" carries the IPM state and ALL elementwise step mechanics
    # (residuals, dual/slack recovery dλ = (−rc − λ·dsl)/sl, σ, fraction-to-
    # boundary ratios) in float64, while the heavy structured solves (tree
    # Riccati factor/sweeps, Woodbury, risk-saddle inverse) stay in the
    # iterate dtype (f32 on TPU, where f64 LU is unsupported and f64 matmul is
    # emulated/slow). Requires jax_enable_x64 — silently falls back otherwise.
    # Motivation (measured, scripts/cvar_f32_diag.py, overtake cold batch):
    # the f32 stall at gap~1.5 is NOT direction noise — it is the f32 dual-
    # step recovery: cancellation in (−rc − λ·dsl) amplified by 1/sl produces
    # junk dλ components once slacks get small, and the fraction-to-boundary
    # rule then blocks every step (α→1e-9..0 from it~18) while f64 takes
    # α~0.6 steps at the SAME iterate. f64 hits the identical collapse only
    # at its own floor (gap~2e-5, it~36 — benign). The elementwise outer ops
    # are O(totalu·Nc) — negligible even emulated.
    outer_dtype: str = "same"
    # Slack floor of the starting point (see solvers/tree_qp_ipm.py — the same
    # near-feasible-start finding): sl = max(b - rows, sl_min) keeps the
    # (typically strictly feasible) rolled-out primal nearly feasible instead
    # of manufacturing |r|≈1 infeasibility on every inactive row. Unlike the
    # QP path (0.1), the cone rows here start heavily infeasible regardless
    # (risk variables at 0), and a very small linear-row floor destabilizes
    # the f64 40-iteration solves (measured: 0.1 → 2.6e-2 u-error on the
    # oracle-parity case vs 1.1e-4 at 0.3 and 1.8e-4 at 1.0). 0.3 also cuts
    # the f32 cold-start median gap 6× (10 → 1.6 at 40 iters, overtake batch).
    sl_min: float = 0.3


@_f32_precision
def cvar_ipm_solve(
    cplan: CVaRPlan,
    ts: TreeState,
    Q, R, Qslack, xRef, ralpha,
    Fx, bx, Fu, bu,
    x0,
    S=None,
    cfg: CVaRIPMConfig = CVaRIPMConfig(),
):
    """Solve the CVaR tree SOCP for one tree. Returns (x, u, s, risk, aux)."""
    plan = cplan.plan
    topo = plan.topo
    n, d, m = topo.n, topo.d, topo.m
    totalu, totalx = topo.totalu, topo.totalx
    bdim = cplan.bdim
    nrisk = cplan.nrisk
    K = bdim * m                       # number of child cones
    sdt = ts.x_lin.dtype               # solve dtype (factorizations, sweeps)
    use_f64_outer = (
        cfg.outer_dtype == "f64"
        and jax.config.jax_enable_x64
        and sdt != jnp.float64
    )
    # `dtype` below = OUTER dtype: iterate state + all elementwise mechanics.
    dtype = jnp.float64 if use_f64_outer else sdt

    Q = jnp.asarray(Q, dtype)
    R = jnp.asarray(R, dtype)
    Qslack1 = jnp.asarray(Qslack, dtype)[1]
    xRef = jnp.asarray(xRef, dtype)
    Fx = jnp.asarray(Fx, dtype)
    bx = jnp.asarray(bx, dtype)
    Fu = jnp.asarray(Fu, dtype)
    bu = jnp.asarray(bu, dtype)
    x0 = jnp.asarray(x0, dtype)
    nFx = Fx.shape[0]
    Nc = nFx + 1
    nFu = Fu.shape[0]

    if S is not None:
        S = jnp.asarray(S, dtype)
        Qx_cone = S.T @ Q @ S            # quirk: quadratic through S, linear not
        Fx_used = Fx @ S
    else:
        Qx_cone = Q
        Fx_used = Fx
    cx = -2.0 * (Q @ xRef)
    cconst = xRef @ Q @ xRef

    dh = jnp.asarray(ts.dh, dtype)
    if S is not None:
        d0 = dh[:, 0]
        d0 = jnp.sign(d0) * jnp.maximum(0.1, jnp.abs(d0))
        dh = dh.at[:, 0].set(d0)
    Fxc = jnp.concatenate(
        [-dh[:, None, :], jnp.broadcast_to(Fx_used, (totalu, nFx, n))], axis=1
    )
    b1 = jnp.concatenate(
        [jnp.asarray(ts.h0, dtype)[:, None],
         jnp.broadcast_to(bx, (totalu, nFx))], axis=1
    )

    # static maps ----------------------------------------------------------
    cx_nodes = np.asarray(topo.cnode_x)
    u_off = np.asarray(topo.u_off)
    N = topo.N
    # cone index per stage: root stage (0) → objective; stage of child branch c
    # (cone index k). Each non-root branch is a cone.
    cone_of_stage = np.full(totalu, -1, dtype=np.int64)
    stage_mask = np.zeros((K, totalu))
    f_risk = np.zeros((K, nrisk))
    kk = 0
    for idx in range(bdim):
        for i in range(m):
            c = int(cplan.child_of[idx, i])
            stages = u_off[c] + np.arange(N)
            cone_of_stage[stages] = kk
            stage_mask[kk, stages] = 1.0
            f_risk[kk, bdim + idx] += 1.0                       # σ_idx
            f_risk[kk, 2 * bdim + cplan.slotP[idx, i]] += 1.0   # μ⁺
            f_risk[kk, 2 * bdim + bdim * m + cplan.slotM[idx, i]] -= 1.0
            if cplan.child_nonleaf[idx, i]:
                f_risk[kk, c] += 1.0                            # ρ_child
            kk += 1
    stage_mask_raw = jnp.asarray(stage_mask, dtype)             # (K, totalu)
    f_risk_raw = jnp.asarray(f_risk, dtype)
    root_mask = jnp.zeros((totalu,), dtype).at[0].set(1.0)
    # objective linear parts: ρ0 and Qslack1 on root slack rows
    obj_r = jnp.zeros((nrisk,), dtype).at[0].set(1.0)
    obj_s = jnp.zeros((totalu, Nc), dtype).at[0].set(Qslack1)

    # risk equality rows
    p_nonleaf = ts.p[:bdim]
    Req = jnp.zeros((bdim, nrisk), dtype)
    for i in range(bdim):
        Req = Req.at[i, i].set(1.0)
        Req = Req.at[i, bdim + i].set(1.0)
        for c in range(m):
            Req = Req.at[i, 2 * bdim + bdim * m + i * m + c].set(
                -p_nonleaf[i, c] / ralpha
            )
    sgn_idx = np.concatenate([np.arange(bdim), np.arange(2 * bdim, nrisk)])
    nsgn = len(sgn_idx)
    sgn_idx_j = jnp.asarray(sgn_idx, np.int64)

    # cone evaluation ------------------------------------------------------

    def _per_stage_cost(x_nodes, u, s):
        xc = x_nodes[cx_nodes]
        return (
            jnp.einsum("bi,ij,bj->b", xc, Qx_cone, xc)
            + xc @ cx + cconst
            + jnp.einsum("bi,ij,bj->b", u, R, u)
            + Qslack1 * jnp.sum(s, axis=1)
        )

    # Per-cone scaling: the raw cost-to-go cone values at the start point are
    # O(1e3-1e4) on realistic configs (speed tracking over N nodes). Dividing
    # cone k by c_k = max(1, |q_k(v0)|) makes every cone O(1), which keeps the
    # Woodbury block (I − GᵀZ·diag(wq)) and the barrier products finite in
    # float32 — the raw scale is what stalled f32 cold starts (round-1 issue).
    # Exact-arithmetic equivalent: cone duals scale by c_k internally.
    q_raw0 = (
        stage_mask_raw @ _per_stage_cost(ts.x_lin, ts.u_lin,
                                         jnp.zeros((totalu, Nc), dtype))
        + f_risk_raw @ jnp.zeros((nrisk,), dtype)
    )
    cscale = jnp.maximum(jnp.abs(q_raw0), 1.0)                  # (K,)
    stage_mask_j = stage_mask_raw / cscale[:, None]
    f_risk_j = f_risk_raw / cscale[:, None]

    def cone_vals(x_nodes, u, s, risk):
        """q̃_k(v) for all K (scaled) cones: per-child Σ(node cost) + slack +
        risk terms, divided by c_k."""
        return stage_mask_j @ _per_stage_cost(x_nodes, u, s) + f_risk_j @ risk

    def cone_grads(x_nodes, u, s):
        """∇q_k pieces: gx (K,totalu,n), gu (K,totalu,d), gs (K,totalu,Nc),
        grisk = f_risk (constant)."""
        xc = x_nodes[cx_nodes]
        gx_stage = 2.0 * xc @ Qx_cone + cx[None, :]        # (totalu, n)
        gu_stage = 2.0 * u @ R
        gx = stage_mask_j[:, :, None] * gx_stage[None]
        gu = stage_mask_j[:, :, None] * gu_stage[None]
        gs = stage_mask_j[:, :, None] * (Qslack1 * jnp.ones((1, 1, Nc), dtype))
        return gx, gu, gs

    def obj_val(x_nodes, u, s, risk):
        return (
            jnp.einsum("i,ij,j->", u[0], R, u[0]) + risk[0]
            + Qslack1 * jnp.sum(s[0])
        )

    def obj_grad(u, risk):
        gu = jnp.zeros((totalu, d), dtype).at[0].set(2.0 * R @ u[0])
        return gu

    # -- initial point (dynamics- and risk-equality-feasible) --------------
    x_i = jnp.asarray(ts.x_lin, dtype)
    u_i = jnp.asarray(ts.u_lin, dtype)
    s_i = jnp.zeros((totalu, Nc), dtype)
    r_i = jnp.zeros((nrisk,), dtype)

    # centered start: λ = μ0/sl puts the initial point exactly on the central
    # path for the inequality part (λ=1 cold starts caused a 1e8 complementarity
    # transient on deeper trees)
    mu0 = 10.0
    rows1 = jnp.einsum("brn,bn->br", Fxc, x_i[cx_nodes]) - s_i
    sl1 = jnp.maximum(b1 - rows1, cfg.sl_min)
    lam1 = mu0 / sl1
    sl2 = jnp.maximum(bu[None] - jnp.einsum("rn,bn->br", Fu, u_i), cfg.sl_min)
    lam2 = mu0 / sl2
    sl3 = jnp.maximum(s_i, cfg.sl_min)
    lam3 = mu0 / sl3
    # risk sign rows start ON the boundary (r_i = 0); a unit slack keeps their
    # duals moderate while the risk variables move off zero in early iterations
    sl4 = jnp.ones((nsgn,), dtype)
    lam4 = mu0 * jnp.ones((nsgn,), dtype)
    sq = jnp.maximum(-cone_vals(x_i, u_i, s_i, r_i), 1.0)
    lq = mu0 / sq

    mtot = float(sl1.size + sl2.size + sl3.size + nsgn + K)
    # clamp is set by the SOLVE dtype: it protects the f32 factorization, not
    # the (possibly f64) outer arithmetic
    w_max_eff = (cfg.w_max if sdt == jnp.float64
                 else min(cfg.w_max, cfg.w_max_f32))

    def newton_factor(x_nodes, u, s, lam1_, sl1_, lam2_, sl2_, lam3_, sl3_,
                      lam4_, sl4_, lq_, sq_):
        """Factor the KKT: per-stage quadratics + tree factor + risk block +
        Woodbury columns for the cone-gradient outer products."""
        # per-stage cone weights: λ̃/c of the cone owning the stage (the scaled
        # cone's quadratic is (2Q)/c_k, so the stage Hessian weight is λ̃_k/c_k);
        # root → 1 (objective)
        clampw = lambda w: jnp.minimum(w, w_max_eff)
        lq_eff = lq_ / cscale
        lam_stage = jnp.where(
            jnp.asarray(cone_of_stage >= 0),
            lq_eff[jnp.maximum(jnp.asarray(cone_of_stage), 0)],
            0.0,
        ) + root_mask                     # root counts with weight 1 (objective)
        # x-blocks: 2 λ_stage Qx_cone (root stage has no x in its cone/objective)
        lam_x = lam_stage - root_mask     # exclude root for x
        Qx2 = 2.0 * lam_x[:, None, None] * Qx_cone[None]
        Ru2 = 2.0 * lam_stage[:, None, None] * R[None]
        # linear rows: W weights
        w1 = clampw(lam1_ / sl1_)         # (totalu, Nc)
        w2 = clampw(lam2_ / sl2_)         # (totalu, nFu)
        w3 = clampw(lam3_ / sl3_)         # (totalu, Nc)
        kap = w1 + w3 + cfg.reg           # s-row elimination denominators
        coefs = w1 - w1 * w1 / kap        # effective per-row x weights
        Hx_nc = Qx2 + cfg.reg * jnp.eye(n, dtype=dtype)[None]  # x-block w/o row coupling
        Qx2 = Hx_nc + jnp.einsum("br,bri,brj->bij", coefs, Fxc, Fxc)
        Ru2 = Ru2 + jnp.einsum("br,ri,rj->bij", w2, Fu, Fu)
        Ru2 = Ru2 + cfg.reg * jnp.eye(d, dtype=dtype)[None]
        Pterm2 = jnp.broadcast_to(
            cfg.reg * jnp.eye(n, dtype=dtype), (len(plan.leaf_ids), n, n)
        )
        # the factorization and its sweeps run in the solve dtype (f32 on TPU)
        zeros_u = jnp.zeros((totalu, d, d), sdt)
        cost = StageCost(
            Qx2=jnp.asarray(Qx2, sdt), qx=jnp.zeros((totalu, n), sdt),
            Ru2=jnp.asarray(Ru2, sdt),
            qu=jnp.zeros((totalu, d), sdt), Daa2=zeros_u, Dab2=zeros_u,
            Pterm2=jnp.asarray(Pterm2, sdt),
            qterm=jnp.zeros((len(plan.leaf_ids), n), sdt),
            slack_lin=jnp.zeros((totalu,), sdt),
            slack_quad=jnp.asarray(0.0, sdt),
        )
        fac = tree_lqr_factor(plan, cost, ts)

        # risk KKT block: [Hr, Reqᵀ; Req, 0] with Hr = diag sign-row weights + reg
        w4 = clampw(lam4_ / sl4_)
        Hr = cfg.reg * jnp.eye(nrisk, dtype=dtype)
        Hr = Hr + jnp.zeros((nrisk, nrisk), dtype).at[sgn_idx_j, sgn_idx_j].add(w4)
        Krk = jnp.zeros((nrisk + bdim, nrisk + bdim), dtype)
        Krk = Krk.at[:nrisk, :nrisk].set(Hr)
        Krk = Krk.at[:nrisk, nrisk:].set(Req.T)
        Krk = Krk.at[nrisk:, :nrisk].set(Req)
        Krk = Krk.at[nrisk:, nrisk:].set(-cfg.reg * jnp.eye(bdim, dtype=dtype))
        # f64 LU is unsupported on TPU; the inverse stays in the solve dtype
        # (refinement at the kkt_solve level recovers outer-dtype accuracy)
        Krk_inv = small_dense_inv(jnp.asarray(Krk, sdt))

        gx, gu, gs = cone_grads(x_nodes, u, s)

        def h0_apply(qx, qu, qs, qrisk, response=True):
            qx_eff = qx + jnp.einsum("brn,br->bn", Fxc, (w1 / kap) * qs)
            kff = tree_lqr_linear(
                plan, fac, jnp.asarray(qx_eff, sdt), jnp.asarray(qu, sdt),
                jnp.zeros((len(plan.leaf_ids), n), sdt), affine=False,
            )
            xr, ur = tree_lqr_forward(
                plan, fac, kff, jnp.zeros((n,), sdt), jnp.zeros((d,), sdt),
                affine=False,
            )
            sr = (jnp.einsum("br,brn,bn->br", w1, Fxc, xr[cx_nodes]) - qs) / kap
            rr = -(Krk_inv[:nrisk, :nrisk] @ qrisk)
            return xr, ur, sr, rr

        # Woodbury columns for cone gradients
        def col(konehot):
            qx = jnp.einsum("k,kjn->jn", konehot, gx)
            qu = jnp.einsum("k,kjd->jd", konehot, gu)
            qs = jnp.einsum("k,kjc->jc", konehot, gs)
            qr = konehot @ f_risk_j
            return h0_apply(qx, qu, qs, qr)

        eyeK = jnp.eye(K, dtype=dtype)
        Zx, Zu, Zs, Zr = jax.vmap(col)(eyeK)

        def gdot(xx, uu, ss, rr):
            xc = xx[cx_nodes]
            out = jnp.einsum("kjn,jn->k", gx, xc)
            out = out + jnp.einsum("kjd,jd->k", gu, uu)
            out = out + jnp.einsum("kjc,jc->k", gs, ss)
            out = out + f_risk_j @ rr
            return out

        GtZ = jax.vmap(lambda a, b, c, e: gdot(a, b, c, e))(Zx, Zu, Zs, Zr)
        wq = jnp.minimum(lq_ / sq_, w_max_eff)
        # φ = (I − GᵀZ·diag(wq))⁻¹ gᵀa  per Woodbury on H0 + Σ wq_k g_k g_kᵀ
        Wm = small_dense_inv(
            jnp.asarray(jnp.eye(K, dtype=dtype) - GtZ * wq[None, :], sdt))

        def base_solve(qx2, qu2, qs2, qr2):
            """(H0 + Σ wq g gᵀ)⁻¹ applied to −q (projected): factorized tree
            solve + Woodbury correction for the cone outer products."""
            ax, au, as_, ar = h0_apply(qx2, qu2, qs2, qr2)
            phi0 = gdot(ax, au, as_, ar)
            phi = Wm @ phi0
            corr = wq * phi
            dx = ax + jnp.einsum("k,kjn->jn", corr, Zx)
            du = au + jnp.einsum("k,kjd->jd", corr, Zu)
            dsv = as_ + jnp.einsum("k,kjc->jc", corr, Zs)
            dr = ar + corr @ Zr
            return dx, du, dsv, dr

        w3reg = w3 + cfg.reg
        rdt = jnp.float64 if cfg.refine_dtype == "f64" else dtype

        def m_apply(dx, du, dsv, dr):
            """Closed-form apply of the full KKT operator M = H0 + Σ wq g gᵀ
            over (x, u, s, r). Used only for iterative-refinement residuals;
            the direct apply is far more accurate than the factorized inverse
            (no f32 error accumulation through Riccati/Woodbury chains), and
            with refine_dtype="f64" it runs in float64 (mixed-precision
            refinement — the operator data stays f32-valued, the arithmetic is
            exact to f64). Terminal leaf x-nodes carry only reg·I and are
            omitted — their residual is O(reg·|x|), below refinement scale."""
            c = lambda a: jnp.asarray(a, rdt)
            dx, du, dsv, dr = c(dx), c(du), c(dsv), c(dr)
            Fxc_r, gx_r, gu_r, gs_r, fr_r = c(Fxc), c(gx), c(gu), c(gs), c(f_risk_j)
            xc = dx[cx_nodes]
            rowx = jnp.einsum("brn,bn->br", Fxc_r, xc) - dsv   # Fxc·x − s
            hx = jnp.einsum("bij,bj->bi", c(Hx_nc), xc)
            hx = hx + jnp.einsum("brn,br->bn", Fxc_r, c(w1) * rowx)
            hu = jnp.einsum("bij,bj->bi", c(Ru2), du)
            hs = -(c(w1) * rowx) + c(w3reg) * dsv
            hr = c(Hr) @ dr
            cg = c(wq) * (
                jnp.einsum("kjn,jn->k", gx_r, xc)
                + jnp.einsum("kjd,jd->k", gu_r, du)
                + jnp.einsum("kjc,jc->k", gs_r, dsv)
                + fr_r @ dr
            )                                                  # (K,)
            hx = hx + jnp.einsum("k,kjn->jn", cg, gx_r)
            hu = hu + jnp.einsum("k,kjd->jd", cg, gu_r)
            hs = hs + jnp.einsum("k,kjc->jc", cg, gs_r)
            hr = hr + cg @ fr_r
            return hx, hu, hs, hr

        def kkt_solve(qx, qu, qs, qrisk, extra_g):
            """Solve (H0 + Σ wq g gᵀ) dv = −(q + Σ extra_g_k g_k) with dynamics/
            risk equalities homogeneous. extra_g: (K,) coefficients of g_k in
            the rhs (from the eliminated cone duals). cfg.refine rounds of
            iterative refinement follow the factorized solve."""
            qx2 = qx + jnp.einsum("k,kjn->jn", extra_g, gx)
            qu2 = qu + jnp.einsum("k,kjd->jd", extra_g, gu)
            qs2 = qs + jnp.einsum("k,kjc->jc", extra_g, gs)
            qr2 = qrisk + extra_g @ f_risk_j
            dx, du, dsv, dr = base_solve(qx2, qu2, qs2, qr2)
            for _ in range(cfg.refine):
                hx, hu, hs, hr = m_apply(dx, du, dsv, dr)
                # residual formed in the refinement dtype, solved in f32
                rx = jnp.asarray(hx + jnp.asarray(qx2, hx.dtype), dtype)
                ru = jnp.asarray(hu + jnp.asarray(qu2, hu.dtype), dtype)
                rs = jnp.asarray(hs + jnp.asarray(qs2, hs.dtype), dtype)
                rr = jnp.asarray(hr + jnp.asarray(qr2, hr.dtype), dtype)
                ex, eu, es, er = base_solve(rx, ru, rs, rr)
                dx, du, dsv, dr = dx + ex, du + eu, dsv + es, dr + er
            return dx, du, dsv, dr

        return kkt_solve, gdot, (gx, gu, gs)

    def iteration(carry, it_idx):
        ((x_c, u_c, s_c, r_c, sl1_, lam1_, sl2_, lam2_, sl3_, lam3_,
          sl4_, lam4_, sq_, lq_), best) = carry

        rows1 = jnp.einsum("brn,bn->br", Fxc, x_c[cx_nodes]) - s_c
        rows2 = jnp.einsum("rn,bn->br", Fu, u_c)
        qv = cone_vals(x_c, u_c, s_c, r_c)
        r1 = rows1 + sl1_ - b1
        r2 = rows2 + sl2_ - bu[None]
        r3 = -s_c + sl3_
        r4 = -r_c[sgn_idx_j] + sl4_
        rq = qv + sq_
        gap = (
            jnp.sum(sl1_ * lam1_) + jnp.sum(sl2_ * lam2_) + jnp.sum(sl3_ * lam3_)
            + jnp.sum(sl4_ * lam4_) + jnp.sum(sq_ * lq_)
        ) / mtot

        kkt_solve, gdot, grads = newton_factor(
            x_c, u_c, s_c, lam1_, sl1_, lam2_, sl2_, lam3_, sl3_,
            lam4_, sl4_, lq_, sq_,
        )
        gx, gu, gs = grads

        # dual residual pieces (objective gradient + Aᵀλ + Σ λ_k ∇q_k)
        def dual_parts(lam1_, lam2_, lam3_, lam4_, lq_):
            qx = jnp.einsum("brn,br->bn", Fxc, lam1_)
            qx = qx + jnp.einsum("k,kjn->jn", lq_, gx)
            qu = obj_grad(u_c, r_c)
            qu = qu + jnp.einsum("rn,br->bn", Fu, lam2_)
            qu = qu + jnp.einsum("k,kjd->jd", lq_, gu)
            qs = obj_s - lam1_ - lam3_
            qs = qs + jnp.einsum("k,kjc->jc", lq_, gs)
            qr = obj_r + lq_ @ f_risk_j
            qr = qr.at[sgn_idx_j].add(-lam4_)
            return qx, qu, qs, qr

        rd_x, rd_u, rd_s, rd_r = dual_parts(lam1_, lam2_, lam3_, lam4_, lq_)

        def direction(rc1, rc2, rc3, rc4, rcq):
            # eliminate dsl/dλ per linear family and dsq/dλq per cone:
            #   dλ = (−rc − λ·dsl)/sl,  dsl = −r_fam − (row direction)
            ex1 = (-rc1 + lam1_ * r1) / sl1_
            ex2 = (-rc2 + lam2_ * r2) / sl2_
            ex3 = (-rc3 + lam3_ * r3) / sl3_
            ex4 = (-rc4 + lam4_ * r4) / sl4_
            exq = (-rcq + lq_ * rq) / sq_
            qx = -(rd_x + jnp.einsum("brn,br->bn", Fxc, ex1))
            qu = -(rd_u + jnp.einsum("rn,br->bn", Fu, ex2))
            qs = -(rd_s - ex1 - ex3)
            qr = -(rd_r + jnp.zeros((nrisk,), dtype).at[sgn_idx_j].add(-ex4))
            dx, du, dsv, dr = kkt_solve(-qx, -qu, -qs, -qr, exq)
            # recompute row directions
            drow1 = jnp.einsum("brn,bn->br", Fxc, dx[cx_nodes]) - dsv
            drow2 = jnp.einsum("rn,bn->br", Fu, du)
            dsl1 = -r1 - drow1
            dsl2 = -r2 - drow2
            dsl3 = -r3 + dsv
            dsl4 = -r4 + dr[sgn_idx_j]
            dq = gdot(dx, du, dsv, dr)
            dsq = -rq - dq
            dlam1 = (-rc1 - lam1_ * dsl1) / sl1_
            dlam2 = (-rc2 - lam2_ * dsl2) / sl2_
            dlam3 = (-rc3 - lam3_ * dsl3) / sl3_
            dlam4 = (-rc4 - lam4_ * dsl4) / sl4_
            dlq = (-rcq - lq_ * dsq) / sq_
            return dx, du, dsv, dr, dsl1, dlam1, dsl2, dlam2, dsl3, dlam3, dsl4, dlam4, dsq, dlq

        # predictor
        da = direction(sl1_ * lam1_, sl2_ * lam2_, sl3_ * lam3_,
                       sl4_ * lam4_, sq_ * lq_)

        def max_step(v, dv):
            ratio = jnp.where(dv < 0, -v / dv, jnp.inf)
            return jnp.minimum(1.0, jnp.min(ratio))

        def all_step(dirs):
            (_, _, _, _, dsl1, dlam1, dsl2, dlam2, dsl3, dlam3,
             dsl4, dlam4, dsq, dlq) = dirs
            a = jnp.minimum(max_step(sl1_, dsl1), max_step(lam1_, dlam1))
            a = jnp.minimum(a, jnp.minimum(max_step(sl2_, dsl2), max_step(lam2_, dlam2)))
            a = jnp.minimum(a, jnp.minimum(max_step(sl3_, dsl3), max_step(lam3_, dlam3)))
            a = jnp.minimum(a, jnp.minimum(max_step(sl4_, dsl4), max_step(lam4_, dlam4)))
            a = jnp.minimum(a, jnp.minimum(max_step(sq_, dsq), max_step(lq_, dlq)))
            return a

        a_aff = all_step(da)
        (_, _, _, _, dsl1a, dlam1a, dsl2a, dlam2a, dsl3a, dlam3a,
         dsl4a, dlam4a, dsqa, dlqa) = da
        gap_aff = (
            jnp.sum((sl1_ + a_aff * dsl1a) * (lam1_ + a_aff * dlam1a))
            + jnp.sum((sl2_ + a_aff * dsl2a) * (lam2_ + a_aff * dlam2a))
            + jnp.sum((sl3_ + a_aff * dsl3a) * (lam3_ + a_aff * dlam3a))
            + jnp.sum((sl4_ + a_aff * dsl4a) * (lam4_ + a_aff * dlam4a))
            + jnp.sum((sq_ + a_aff * dsqa) * (lq_ + a_aff * dlqa))
        ) / mtot
        sigma_c = jnp.clip((gap_aff / (gap + 1e-30)) ** 3, 0.0, 1.0)

        dc = direction(
            sl1_ * lam1_ + dsl1a * dlam1a - sigma_c * gap,
            sl2_ * lam2_ + dsl2a * dlam2a - sigma_c * gap,
            sl3_ * lam3_ + dsl3a * dlam3a - sigma_c * gap,
            sl4_ * lam4_ + dsl4a * dlam4a - sigma_c * gap,
            sq_ * lq_ + dsqa * dlqa - sigma_c * gap,
        )
        a0 = cfg.tau * all_step(dc)
        # freeze once converged (numerical breakdown guard: extreme barrier
        # weights at tiny gaps would otherwise corrupt later Newton systems)
        scale = 1.0 + jnp.abs(obj_val(x_c, u_c, s_c, r_c))
        a0 = jnp.where(gap < cfg.gap_tol * scale, 0.0, a0)
        (dx, du, dsv, dr, dsl1, dlam1, dsl2, dlam2, dsl3, dlam3,
         dsl4, dlam4, dsq, dlq) = dc

        def gap_at(a):
            return (
                jnp.sum((sl1_ + a * dsl1) * (lam1_ + a * dlam1))
                + jnp.sum((sl2_ + a * dsl2) * (lam2_ + a * dlam2))
                + jnp.sum((sl3_ + a * dsl3) * (lam3_ + a * dlam3))
                + jnp.sum((sl4_ + a * dsl4) * (lam4_ + a * dlam4))
                + jnp.sum((sq_ + a * dsq) * (lq_ + a * dlq))
            ) / mtot

        # step-quality backoff: damp (but still take) Mehrotra steps that
        # balloon complementarity by ≫ the usual transient factor
        grow = 10.0 * gap + 1e-9
        a0 = jnp.where(it_idx < cfg.early_iters,
                       jnp.minimum(a0, cfg.a_cap_early), a0)
        a1 = jnp.where(gap_at(a0) > grow, 0.3 * a0, a0)
        a = jnp.where(gap_at(a1) > grow, 0.3 * a1, a1)
        # f32 safety: a non-finite direction (overflowed barrier products on a
        # cold start) must not poison the iterate — freeze instead. Every
        # component must be checked (a NaN dual direction poisons the slacks
        # even at a=0 since 0·NaN = NaN), and the frozen branch must bypass
        # the arithmetic entirely.
        finite = jnp.isfinite(a)
        for dd in dc:
            finite = jnp.logical_and(finite, jnp.all(jnp.isfinite(dd)))
        a = jnp.where(finite, a, 0.0)

        def stepped(v, dv):
            return jnp.where(finite, v + a * dv, v)

        new = (
            stepped(x_c, dx), stepped(u_c, du), stepped(s_c, dsv),
            stepped(r_c, dr),
            stepped(sl1_, dsl1), stepped(lam1_, dlam1),
            stepped(sl2_, dsl2), stepped(lam2_, dlam2),
            stepped(sl3_, dsl3), stepped(lam3_, dlam3),
            stepped(sl4_, dsl4), stepped(lam4_, dlam4),
            stepped(sq_, dsq), stepped(lq_, dlq),
        )
        # best-iterate tracking (returned at the end)
        (bx_, bu_, bs_, br_, bgap) = best
        better = gap < bgap
        best_new = (
            jnp.where(better, x_c, bx_), jnp.where(better, u_c, bu_),
            jnp.where(better, s_c, bs_), jnp.where(better, r_c, br_),
            jnp.where(better, gap, bgap),
        )
        diag = {
            "gap": gap, "a": a, "a_aff": a_aff, "sigma": sigma_c,
            "wmax": jnp.maximum(jnp.max(lam1_ / sl1_), jnp.max(lq_ / sq_)),
            "prim1": jnp.max(jnp.abs(r1)), "rq": jnp.max(jnp.abs(rq)),
        }
        return (new, best_new), diag

    best0 = (x_i, u_i, s_i, r_i, jnp.asarray(np.inf, dtype))
    carry = ((x_i, u_i, s_i, r_i, sl1, lam1, sl2, lam2, sl3, lam3, sl4, lam4,
              sq, lq), best0)
    (state_f, best_f), diag_tr = jax.lax.scan(
        iteration, carry, jnp.arange(cfg.iters)
    )
    gaps = diag_tr["gap"]
    # compare the final iterate with the best seen; return the better one
    gap_last = gaps[-1]
    bx_, bu_, bs_, br_, bgap = best_f
    use_last = gap_last <= bgap
    x_f = jnp.where(use_last, state_f[0], bx_)
    u_f = jnp.where(use_last, state_f[1], bu_)
    s_f = jnp.where(use_last, state_f[2], bs_)
    r_f = jnp.where(use_last, state_f[3], br_)
    J = obj_val(x_f, u_f, s_f, r_f)
    # return in the caller's (solve) dtype regardless of the outer dtype
    x_f, u_f, s_f, r_f = (jnp.asarray(a, sdt) for a in (x_f, u_f, s_f, r_f))
    aux = {"J": jnp.asarray(J, sdt),
           "gap": jnp.asarray(jnp.where(use_last, gap_last, bgap), sdt),
           "risk": r_f,
           "gaps": jnp.asarray(gaps, sdt),
           "diag": {k: jnp.asarray(v, sdt) for k, v in diag_tr.items()}}
    return x_f, u_f, s_f, r_f, aux
