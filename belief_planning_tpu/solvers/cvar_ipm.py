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
p99 ~5 — no stalled-at-start lanes (was: p50 = p99 = initial gap 10).

Convergence anatomy (2026-08-19, scripts/cvar_f32_diag.py +
scripts/cvar_hard_oracle.py): the "gap stalls O(1)" behavior on adversarial
cold starts is NOT an f32 precision problem — f64 shows the identical jam on
the same hard batch. Mechanism: Mehrotra steps let individual complementarity
products drift ~9 decades off-center, a slack then pins near zero with a live
residual, and fraction-to-boundary blocks every subsequent step (σ→1,
α→1e-14). Gondzio centrality correctors (``gondzio=2``) are the effective
countermeasure: f64 hard-batch final gap p50 1.44→0.345, max 339→2.09; f32
p50 1.57→1.11. What matters downstream is unaffected sooner: the returned
best-iterate u0 matches the converged f64 oracle to p50 1e-4 / max 3e-3 on
the same jammed lanes (the residual gap lives in badly-scaled dual/cone
coordinates, and the dense reference-grade oracle IPM itself hits max_iter
on several of them). Tried and rejected: refinement (direction quality is
not the binding constraint), w_max increases (never binding in f64),
λ-only or λ+slack barrier restarts (destabilize — see ``recenter``), split
primal/dual steps (great primal residuals, worse gaps), carried residuals /
Sterbenz recovery (no measurable win; kept as options).
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
    # Route the K-cone mask/risk-map contractions ((K, totalu)@(totalu, T),
    # (totalu, K)@(K, T), selector maps) through 2-D ``jnp.dot`` — the MXU —
    # instead of broadcast-multiply-reduce on the VPU (fused kernel path,
    # ``cvar_pl`` only; the f32-precision context of the solver makes these
    # full-f32 3-pass MXU matmuls). Also avoids materializing the (K, totalu,
    # R, T) broadcast temporaries of the multi-RHS sweep in VMEM.
    mxu: bool = False
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
    # Primal-residual handling. "recompute" re-forms r = A·x + sl − b (and
    # rq = q(v) + sq) from the iterate every iteration — textbook, but in f32
    # the recompute cancels catastrophically on active rows (|A·x − b| ≪
    # |A·x|), and the O(eps·|A·x|) junk is then amplified by the barrier
    # weight λ/sl (up to w_max_f32) in the slack elimination ex = (λ·r −
    # rc)/sl — this, not direction noise, is what poisons the f32 steps.
    # "carried" threads the residuals through the scan and uses the EXACT
    # contraction identities instead: linear rows r⁺ = (1−α)·r (dsl is
    # defined as −r − drow), cones rq⁺ = (1−α)·rq + α²·quad(dv) (q is
    # quadratic, so the Taylor remainder is exactly the quadratic form of the
    # step). No cancellation anywhere; drift vs the true residual is O(eps)
    # per iteration and unamplified.
    resid: str = "recompute"
    # Dual/slack recovery algebra. "direct" is dλ = (−rc − λ·dsl)/sl with
    # rc = sl∘λ + corr. "stable" evaluates the algebraically identical
    # dλ = −λ·((sl + dsl)/sl) − corr/sl: when fraction-to-boundary is active
    # (dsl ≈ −sl) the sum sl + dsl is exact in floating point (Sterbenz), so
    # the recovery adds no rounding beyond dsl's own error, whereas forming
    # sl·λ and subtracting λ·dsl injects O(eps·λ·sl)/sl = O(eps·λ) junk.
    recovery: str = "direct"
    # Gondzio multiple centrality correctors. The measured failure mode of
    # plain Mehrotra on hard cold starts (scripts/cvar_f32_diag.py, f64 AND
    # f32): complementarity products drift 7+ orders of magnitude off-center
    # (min 1e-7·μ, max 80·μ), after which both the affine and the centering
    # directions are blocked by fraction-to-boundary on the cone slacks
    # (α→1e-14) and the gap pins at O(1) — an algorithmic jam, not a
    # precision one. Each corrector round re-uses the factorization: aim at
    # step ᾱ = min(1, τα+0.3), clip the trial products into
    # [βmin·σμ, βmax·σμ], and solve a pure complementarity correction for
    # the outliers; accept if the reachable step grows.
    gondzio: int = 0
    gondzio_bmin: float = 0.1
    gondzio_bmax: float = 10.0
    # Wide-neighborhood (N∞⁻) step safeguard: take the largest candidate
    # fraction of the fraction-to-boundary step with
    # min_i product_i(α) ≥ γ·μ(α) (or no worse than the current min ratio,
    # so recovery from an already-off-center iterate is not blocked). γ=0
    # disables. Without this, Mehrotra steps let single products collapse
    # 9 decades below μ (measured); the associated slack pins at ~1e-13
    # with a live residual and fraction-to-boundary jams every later step —
    # the true mechanism of the "gap stalls O(1)" failure, in f64 as well
    # as f32.
    neighborhood: float = 0.0
    # Separate primal/dual step lengths (Mehrotra's standard LP/QP practice):
    # the slack/iterate step α_P is limited only by the primal families, the
    # multiplier step α_D only by the dual families. Within one iteration
    # nothing couples λ to the primal rows (residuals are re-formed next
    # iteration), so a dual-side block need not kill primal progress and
    # vice versa.
    split_step: bool = False
    # Jam-recovery dual recentering: if the combined step collapses
    # (α < recenter_tol) for two consecutive iterations, reset every
    # multiplier to exact centrality at the current μ (λ := μ/sl). This
    # discards dual progress but keeps the primal iterate; the IPM restarts
    # from a perfectly centered dual and re-approaches. 0 disables.
    recenter: int = 0
    recenter_tol: float = 1e-5
    # Emit the extended per-iteration diagnostics (per-family step limits,
    # centrality spread, non-finite bitmasks, factor health). Costs extra
    # reductions every iteration — leave off outside debugging runs.
    diag_extra: bool = False


@_f32_precision
def cvar_ipm_solve(
    cplan: CVaRPlan,
    ts: TreeState,
    Q, R, Qslack, xRef, ralpha,
    Fx, bx, Fu, bu,
    x0,
    S=None,
    cfg: CVaRIPMConfig = CVaRIPMConfig(),
    dh0_floor=None,
):
    """Solve the CVaR tree SOCP for one tree. Returns (x, u, s, risk, aux).

    ``dh0_floor``: with ``S``, gates the warm-only dh[0] magnitude-floor quirk
    (None = always apply, legacy; bool/traced bool = apply iff True)."""
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
        # dh[0] magnitude floor (MPC_branch.py:2030). The reference applies it
        # ONLY in updateIneqConstr (warm re-solves) — the cold buildIneqConstr
        # (:1895-1898) uses the raw dh. ``dh0_floor`` replicates that:
        # None → legacy always-on; a (traced) bool → floor iff warm.
        d0 = dh[:, 0]
        d0f = jnp.sign(d0) * jnp.maximum(0.1, jnp.abs(d0))
        if dh0_floor is not None:
            d0f = jnp.where(jnp.asarray(dh0_floor), d0f, d0)
        dh = dh.at[:, 0].set(d0f)
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

    def cone_quad(dx_nodes, du):
        """Pure quadratic part of each scaled cone along a step direction:
        q_k(v + α·dv) = q_k(v) + α·∇q_k·dv + α²·cone_quad(dv)_k exactly
        (cones are quadratic in (x, u) and linear in (s, risk))."""
        xc = dx_nodes[cx_nodes]
        per = (jnp.einsum("bi,ij,bj->b", xc, Qx_cone, xc)
               + jnp.einsum("bi,ij,bj->b", du, R, du))
        return stage_mask_j @ per

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
    rows2_0 = jnp.einsum("rn,bn->br", Fu, u_i)
    sl2 = jnp.maximum(bu[None] - rows2_0, cfg.sl_min)
    lam2 = mu0 / sl2
    sl3 = jnp.maximum(s_i, cfg.sl_min)
    lam3 = mu0 / sl3
    # risk sign rows start ON the boundary (r_i = 0); a unit slack keeps their
    # duals moderate while the risk variables move off zero in early iterations
    sl4 = jnp.ones((nsgn,), dtype)
    lam4 = mu0 * jnp.ones((nsgn,), dtype)
    qv0 = cone_vals(x_i, u_i, s_i, r_i)
    sq = jnp.maximum(-qv0, 1.0)
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

        if cfg.diag_extra:
            dbg = {
                "finK": jnp.all(jnp.isfinite(Krk_inv)) * 1.0,
                "finW": jnp.all(jnp.isfinite(Wm)) * 1.0,
                "finZ": (jnp.all(jnp.isfinite(Zx)) & jnp.all(jnp.isfinite(Zu))
                         & jnp.all(jnp.isfinite(Zs))
                         & jnp.all(jnp.isfinite(Zr))) * 1.0,
                "finF": sum(jnp.sum(~jnp.isfinite(l_)) for l_ in
                            jax.tree_util.tree_leaves(fac)) * 1.0,
                "condW": jnp.max(jnp.abs(Wm)),
            }
        else:
            dbg = {}
        return kkt_solve, gdot, (gx, gu, gs), dbg

    def iteration(carry, it_idx):
        ((x_c, u_c, s_c, r_c, sl1_, lam1_, sl2_, lam2_, sl3_, lam3_,
          sl4_, lam4_, sq_, lq_), res_c, (jam_cnt, rc_used), best) = carry

        if cfg.resid == "carried":
            r1, r2, r3, r4, rq = res_c
        else:
            rows1 = jnp.einsum("brn,bn->br", Fxc, x_c[cx_nodes]) - s_c
            rows2 = jnp.einsum("rn,bn->br", Fu, u_c)
            qv = cone_vals(x_c, u_c, s_c, r_c)
            if cfg.recenter > 0:
                # Barrier restart (see CVaRIPMConfig.recenter): after two
                # jammed iterations, rebuild BOTH slacks and multipliers from
                # the current primal with the cold-start rule (sl from the
                # actual row values, λ = μ/sl). Resetting only λ makes it
                # worse — a crashed slack (1e-14) then gets a 1e13 dual.
                do_rc = jnp.logical_and(jam_cnt >= 2.0,
                                        rc_used < cfg.recenter)
                gap_pre = (
                    jnp.sum(sl1_ * lam1_) + jnp.sum(sl2_ * lam2_)
                    + jnp.sum(sl3_ * lam3_) + jnp.sum(sl4_ * lam4_)
                    + jnp.sum(sq_ * lq_)
                ) / mtot
                mu_c = jnp.maximum(gap_pre, 1e-3)

                def rst(sl_old, lam_old, feas, floor):
                    sl_new = jnp.where(
                        do_rc, jnp.maximum(feas, floor), sl_old)
                    return sl_new, jnp.where(do_rc, mu_c / sl_new, lam_old)

                sl1_, lam1_ = rst(sl1_, lam1_, b1 - rows1, cfg.sl_min)
                sl2_, lam2_ = rst(sl2_, lam2_, bu[None] - rows2, cfg.sl_min)
                sl3_, lam3_ = rst(sl3_, lam3_, s_c, cfg.sl_min)
                sl4_, lam4_ = rst(sl4_, lam4_, r_c[sgn_idx_j], cfg.sl_min)
                sq_, lq_ = rst(sq_, lq_, -qv, 0.3)
                rc_used = rc_used + jnp.where(do_rc, 1.0, 0.0)
                jam_cnt = jnp.where(do_rc, 0.0, jam_cnt)
            r1 = rows1 + sl1_ - b1
            r2 = rows2 + sl2_ - bu[None]
            r3 = -s_c + sl3_
            r4 = -r_c[sgn_idx_j] + sl4_
            rq = qv + sq_
        gap = (
            jnp.sum(sl1_ * lam1_) + jnp.sum(sl2_ * lam2_) + jnp.sum(sl3_ * lam3_)
            + jnp.sum(sl4_ * lam4_) + jnp.sum(sq_ * lq_)
        ) / mtot

        kkt_solve, gdot, grads, nf_dbg = newton_factor(
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

        def direction(rcs, corrs):
            # eliminate dsl/dλ per linear family and dsq/dλq per cone:
            #   dλ = (−rc − λ·dsl)/sl,  dsl = −r_fam − (row direction)
            # rc = sl∘λ + corr per family; both groupings are passed so each
            # recovery mode can use its numerically preferred form (see
            # CVaRIPMConfig.recovery).
            rc1, rc2, rc3, rc4, rcq = rcs
            corr1, corr2, corr3, corr4, corrq = corrs
            if cfg.recovery == "stable":
                ex1 = lam1_ * ((r1 - sl1_) / sl1_) - corr1 / sl1_
                ex2 = lam2_ * ((r2 - sl2_) / sl2_) - corr2 / sl2_
                ex3 = lam3_ * ((r3 - sl3_) / sl3_) - corr3 / sl3_
                ex4 = lam4_ * ((r4 - sl4_) / sl4_) - corr4 / sl4_
                exq = lq_ * ((rq - sq_) / sq_) - corrq / sq_
            else:
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
            if cfg.recovery == "stable":
                dlam1 = -lam1_ * ((sl1_ + dsl1) / sl1_) - corr1 / sl1_
                dlam2 = -lam2_ * ((sl2_ + dsl2) / sl2_) - corr2 / sl2_
                dlam3 = -lam3_ * ((sl3_ + dsl3) / sl3_) - corr3 / sl3_
                dlam4 = -lam4_ * ((sl4_ + dsl4) / sl4_) - corr4 / sl4_
                dlq = -lq_ * ((sq_ + dsq) / sq_) - corrq / sq_
            else:
                dlam1 = (-rc1 - lam1_ * dsl1) / sl1_
                dlam2 = (-rc2 - lam2_ * dsl2) / sl2_
                dlam3 = (-rc3 - lam3_ * dsl3) / sl3_
                dlam4 = (-rc4 - lam4_ * dsl4) / sl4_
                dlq = (-rcq - lq_ * dsq) / sq_
            return dx, du, dsv, dr, dsl1, dlam1, dsl2, dlam2, dsl3, dlam3, dsl4, dlam4, dsq, dlq

        def direction_pure(rcs):
            """Pure complementarity correction: the Newton system with zero
            primal/dual residuals and complementarity rhs rc per family
            (sl·dλ + λ·dsl = −rc). Used by the Gondzio corrector rounds —
            reuses the factorization (one back-solve)."""
            rc1, rc2, rc3, rc4, rcq = rcs
            ex1 = -rc1 / sl1_
            ex2 = -rc2 / sl2_
            ex3 = -rc3 / sl3_
            ex4 = -rc4 / sl4_
            exq = -rcq / sq_
            qx = -jnp.einsum("brn,br->bn", Fxc, ex1)
            qu = -jnp.einsum("rn,br->bn", Fu, ex2)
            qs = ex1 + ex3
            qr = -(jnp.zeros((nrisk,), dtype).at[sgn_idx_j].add(-ex4))
            dx, du, dsv, dr = kkt_solve(-qx, -qu, -qs, -qr, exq)
            drow1 = jnp.einsum("brn,bn->br", Fxc, dx[cx_nodes]) - dsv
            drow2 = jnp.einsum("rn,bn->br", Fu, du)
            dsl1 = -drow1
            dsl2 = -drow2
            dsl3 = dsv
            dsl4 = dr[sgn_idx_j]
            dsq = -gdot(dx, du, dsv, dr)
            dlam1 = (-rc1 - lam1_ * dsl1) / sl1_
            dlam2 = (-rc2 - lam2_ * dsl2) / sl2_
            dlam3 = (-rc3 - lam3_ * dsl3) / sl3_
            dlam4 = (-rc4 - lam4_ * dsl4) / sl4_
            dlq = (-rcq - lq_ * dsq) / sq_
            return (dx, du, dsv, dr, dsl1, dlam1, dsl2, dlam2, dsl3, dlam3,
                    dsl4, dlam4, dsq, dlq)

        # predictor (corr = 0: rc is exactly sl∘λ)
        zero = jnp.asarray(0.0, dtype)
        da = direction((sl1_ * lam1_, sl2_ * lam2_, sl3_ * lam3_,
                        sl4_ * lam4_, sq_ * lq_),
                       (zero, zero, zero, zero, zero))

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

        def p_step(dirs):
            """Primal-side fraction-to-boundary (slacks step with α_P)."""
            (_, _, _, _, dsl1, _, dsl2, _, dsl3, _, dsl4, _, dsq, _) = dirs
            a = jnp.minimum(max_step(sl1_, dsl1), max_step(sl2_, dsl2))
            a = jnp.minimum(a, jnp.minimum(max_step(sl3_, dsl3),
                                           max_step(sl4_, dsl4)))
            return jnp.minimum(a, max_step(sq_, dsq))

        def d_step(dirs):
            (_, _, _, _, _, dlam1, _, dlam2, _, dlam3, _, dlam4, _, dlq) = dirs
            a = jnp.minimum(max_step(lam1_, dlam1), max_step(lam2_, dlam2))
            a = jnp.minimum(a, jnp.minimum(max_step(lam3_, dlam3),
                                           max_step(lam4_, dlam4)))
            return jnp.minimum(a, max_step(lq_, dlq))

        if cfg.split_step:
            a_affP, a_affD = p_step(da), d_step(da)
        else:
            a_affP = a_affD = all_step(da)
        a_aff = jnp.minimum(a_affP, a_affD)
        (_, _, _, _, dsl1a, dlam1a, dsl2a, dlam2a, dsl3a, dlam3a,
         dsl4a, dlam4a, dsqa, dlqa) = da
        gap_aff = (
            jnp.sum((sl1_ + a_affP * dsl1a) * (lam1_ + a_affD * dlam1a))
            + jnp.sum((sl2_ + a_affP * dsl2a) * (lam2_ + a_affD * dlam2a))
            + jnp.sum((sl3_ + a_affP * dsl3a) * (lam3_ + a_affD * dlam3a))
            + jnp.sum((sl4_ + a_affP * dsl4a) * (lam4_ + a_affD * dlam4a))
            + jnp.sum((sq_ + a_affP * dsqa) * (lq_ + a_affD * dlqa))
        ) / mtot
        sigma_c = jnp.clip((gap_aff / (gap + 1e-30)) ** 3, 0.0, 1.0)

        corr_c = (
            dsl1a * dlam1a - sigma_c * gap,
            dsl2a * dlam2a - sigma_c * gap,
            dsl3a * dlam3a - sigma_c * gap,
            dsl4a * dlam4a - sigma_c * gap,
            dsqa * dlqa - sigma_c * gap,
        )
        dc = direction(
            (sl1_ * lam1_ + corr_c[0],
             sl2_ * lam2_ + corr_c[1],
             sl3_ * lam3_ + corr_c[2],
             sl4_ * lam4_ + corr_c[3],
             sq_ * lq_ + corr_c[4]),
            corr_c,
        )
        # Gondzio multiple centrality correctors (see CVaRIPMConfig.gondzio)
        for _ in range(cfg.gondzio):
            mu_t = sigma_c * gap + 1e-30
            a_cur = all_step(dc)
            ab = jnp.minimum(1.0, cfg.tau * a_cur + 0.3)
            (gdx, gdu, gdsv, gdr, gdsl1, gdlam1, gdsl2, gdlam2, gdsl3,
             gdlam3, gdsl4, gdlam4, gdsq, gdlq) = dc

            cap = 10.0 * cfg.gondzio_bmax * mu_t

            def outlier(v, dv, lam, dlam):
                p = (v + ab * dv) * (lam + ab * dlam)
                t = jnp.clip(p, cfg.gondzio_bmin * mu_t, cfg.gondzio_bmax * mu_t)
                # cap the correction: uncapped p − t on far-off-center rows
                # overflows through the 1/sl recovery and poisons the lane
                return jnp.clip(p - t, -cap, cap)

            rcs_g = (outlier(sl1_, gdsl1, lam1_, gdlam1),
                     outlier(sl2_, gdsl2, lam2_, gdlam2),
                     outlier(sl3_, gdsl3, lam3_, gdlam3),
                     outlier(sl4_, gdsl4, lam4_, gdlam4),
                     outlier(sq_, gdsq, lq_, gdlq))
            dd = direction_pure(rcs_g)
            cand = tuple(c + e for c, e in zip(dc, dd))
            a_new = all_step(cand)
            # NaN components pass max_step unnoticed (NaN < 0 is False →
            # ratio ∞) — require explicit finiteness before accepting
            cand_ok = jnp.asarray(True)
            for c in cand:
                cand_ok = jnp.logical_and(cand_ok, jnp.all(jnp.isfinite(c)))
            accept = jnp.logical_and(a_new > a_cur, cand_ok)
            dc = tuple(jnp.where(accept, c, o) for c, o in zip(cand, dc))

        if cfg.split_step:
            a0P, a0D = cfg.tau * p_step(dc), cfg.tau * d_step(dc)
        else:
            a0P = a0D = cfg.tau * all_step(dc)
        # freeze once converged (numerical breakdown guard: extreme barrier
        # weights at tiny gaps would otherwise corrupt later Newton systems)
        scale = 1.0 + jnp.abs(obj_val(x_c, u_c, s_c, r_c))
        conv = gap < cfg.gap_tol * scale
        a0P = jnp.where(conv, 0.0, a0P)
        a0D = jnp.where(conv, 0.0, a0D)
        (dx, du, dsv, dr, dsl1, dlam1, dsl2, dlam2, dsl3, dlam3,
         dsl4, dlam4, dsq, dlq) = dc

        def gap_at2(aP_, aD_):
            return (
                jnp.sum((sl1_ + aP_ * dsl1) * (lam1_ + aD_ * dlam1))
                + jnp.sum((sl2_ + aP_ * dsl2) * (lam2_ + aD_ * dlam2))
                + jnp.sum((sl3_ + aP_ * dsl3) * (lam3_ + aD_ * dlam3))
                + jnp.sum((sl4_ + aP_ * dsl4) * (lam4_ + aD_ * dlam4))
                + jnp.sum((sq_ + aP_ * dsq) * (lq_ + aD_ * dlq))
            ) / mtot

        def gap_at(a_):
            return gap_at2(a_, a_)

        # step-quality backoff: damp (but still take) Mehrotra steps that
        # balloon complementarity by ≫ the usual transient factor
        grow = 10.0 * gap + 1e-9
        early = it_idx < cfg.early_iters
        a0P = jnp.where(early, jnp.minimum(a0P, cfg.a_cap_early), a0P)
        a0D = jnp.where(early, jnp.minimum(a0D, cfg.a_cap_early), a0D)
        bk1 = gap_at2(a0P, a0D) > grow
        a1P = jnp.where(bk1, 0.3 * a0P, a0P)
        a1D = jnp.where(bk1, 0.3 * a0D, a0D)
        bk2 = gap_at2(a1P, a1D) > grow
        aP = jnp.where(bk2, 0.3 * a1P, a1P)
        aD = jnp.where(bk2, 0.3 * a1D, a1D)

        if cfg.neighborhood > 0:
            # N∞⁻(γ) wide-neighborhood line search over geometric candidates
            gam = cfg.neighborhood

            def min_prod(alP, alD):
                return jnp.minimum(jnp.minimum(
                    jnp.min((sl1_ + alP * dsl1) * (lam1_ + alD * dlam1)),
                    jnp.min((sl2_ + alP * dsl2) * (lam2_ + alD * dlam2))),
                    jnp.minimum(jnp.minimum(
                        jnp.min((sl3_ + alP * dsl3) * (lam3_ + alD * dlam3)),
                        jnp.min((sl4_ + alP * dsl4) * (lam4_ + alD * dlam4))),
                        jnp.min((sq_ + alP * dsq) * (lq_ + alD * dlq))))

            zero_d = jnp.asarray(0.0, dtype)
            mp0 = min_prod(zero_d, zero_d)

            def nbr_ok(f):
                mp = min_prod(f * aP, f * aD)
                # inside the neighborhood, or at least no worse than now
                # (so an off-center iterate can still take recovery steps)
                return jnp.logical_or(mp >= gam * gap_at2(f * aP, f * aD),
                                      mp >= mp0)

            fracs = jnp.asarray([1.0, 0.7, 0.5, 0.35, 0.25, 0.17, 0.12,
                                 0.08, 0.05, 0.03, 0.02, 0.01], dtype)
            oks = jax.vmap(nbr_ok)(fracs)
            fsel = jnp.where(jnp.any(oks), fracs[jnp.argmax(oks)], fracs[-1])
            aP = fsel * aP
            aD = fsel * aD
        # f32 safety: a non-finite direction (overflowed barrier products on a
        # cold start) must not poison the iterate — freeze instead. Every
        # component must be checked (a NaN dual direction poisons the slacks
        # even at a=0 since 0·NaN = NaN), and the frozen branch must bypass
        # the arithmetic entirely.
        finite = jnp.logical_and(jnp.isfinite(aP), jnp.isfinite(aD))
        for dd in dc:
            finite = jnp.logical_and(finite, jnp.all(jnp.isfinite(dd)))
        aP = jnp.where(finite, aP, 0.0)
        aD = jnp.where(finite, aD, 0.0)
        a = jnp.minimum(aP, aD)

        def stepped(v, dv):
            return jnp.where(finite, v + aP * dv, v)

        def stepped_d(v, dv):
            return jnp.where(finite, v + aD * dv, v)

        new = (
            stepped(x_c, dx), stepped(u_c, du), stepped(s_c, dsv),
            stepped(r_c, dr),
            stepped(sl1_, dsl1), stepped_d(lam1_, dlam1),
            stepped(sl2_, dsl2), stepped_d(lam2_, dlam2),
            stepped(sl3_, dsl3), stepped_d(lam3_, dlam3),
            stepped(sl4_, dsl4), stepped_d(lam4_, dlam4),
            stepped(sq_, dsq), stepped_d(lq_, dlq),
        )
        # jam counter for the barrier-restart logic (the restart itself
        # happens at the top of the next iteration, where fresh rows/cone
        # values are available)
        if cfg.recenter > 0:
            jam = jnp.logical_and(a < cfg.recenter_tol,
                                  jnp.logical_not(conv))
            jam_next = (jnp.where(jam, jam_cnt + 1.0, 0.0), rc_used)
        else:
            jam_next = (jam_cnt, rc_used)
        # best-iterate tracking (returned at the end)
        (bx_, bu_, bs_, br_, bgap) = best
        better = gap < bgap
        best_new = (
            jnp.where(better, x_c, bx_), jnp.where(better, u_c, bu_),
            jnp.where(better, s_c, bs_), jnp.where(better, r_c, br_),
            jnp.where(better, gap, bgap),
        )
        if cfg.resid == "carried":
            # exact residual contraction (see CVaRIPMConfig.resid): linear
            # families shrink by (1−α); the cone residual picks up the exact
            # quadratic Taylor remainder of the step.
            quad_c = cone_quad(dx, du)
            # a jammed lane's direction can overflow the quadratic form even
            # when the step is (near-)zero; 0·inf = NaN would poison the
            # carried residual permanently
            quad_c = jnp.where(jnp.isfinite(quad_c), quad_c, 0.0)
            om = 1.0 - aP

            def res_step(rv, extra=None):
                val = om * rv if extra is None else om * rv + (aP * aP) * extra
                return jnp.where(finite, val, rv)

            res_new = (res_step(r1), res_step(r2), res_step(r3),
                       res_step(r4), res_step(rq, quad_c))
        else:
            res_new = res_c
        diag = {
            "gap": gap, "a": a, "a_aff": a_aff, "sigma": sigma_c,
            "wmax": jnp.maximum(jnp.max(lam1_ / sl1_), jnp.max(lq_ / sq_)),
            "prim1": jnp.max(jnp.abs(r1)), "rq": jnp.max(jnp.abs(rq)),
        }
        if cfg.diag_extra:
            comp_all = jnp.concatenate([
                (sl1_ * lam1_).ravel(), (sl2_ * lam2_).ravel(),
                (sl3_ * lam3_).ravel(), (sl4_ * lam4_).ravel(),
                (sq_ * lq_).ravel()])
            diag.update({
                # per-family corrector step limits (which family blocks?)
                "a1s": max_step(sl1_, dsl1), "a1l": max_step(lam1_, dlam1),
                "a2s": max_step(sl2_, dsl2), "a2l": max_step(lam2_, dlam2),
                "a3s": max_step(sl3_, dsl3), "a3l": max_step(lam3_, dlam3),
                "a4s": max_step(sl4_, dsl4), "a4l": max_step(lam4_, dlam4),
                "aqs": max_step(sq_, dsq), "aql": max_step(lq_, dlq),
                # centrality spread: min/max product vs the mean
                "cmin": jnp.min(comp_all) / gap,
                "cmax": jnp.max(comp_all) / gap,
                # non-finite-direction bitmask (which of the 14 components
                # tripped the freeze guard) and extreme slack magnitudes
                "nfin": sum(jnp.where(jnp.all(jnp.isfinite(dd)), 0.0,
                                      2.0 ** i_)
                            for i_, dd in enumerate(dc)),
                "slmin": jnp.minimum(
                    jnp.minimum(jnp.min(sl1_), jnp.min(sl2_)),
                    jnp.minimum(jnp.minimum(jnp.min(sl3_), jnp.min(sl4_)),
                                jnp.min(sq_))),
                "lmax": jnp.maximum(
                    jnp.maximum(jnp.max(lam1_), jnp.max(lam2_)),
                    jnp.maximum(jnp.maximum(jnp.max(lam3_), jnp.max(lam4_)),
                                jnp.max(lq_))),
                **nf_dbg,
                "nfa": sum(jnp.where(jnp.all(jnp.isfinite(dd)), 0.0,
                                     2.0 ** i_)
                           for i_, dd in enumerate(da)),
            })
        return (new, res_new, jam_next, best_new), diag

    best0 = (x_i, u_i, s_i, r_i, jnp.asarray(np.inf, dtype))
    res0 = (rows1 + sl1 - b1, rows2_0 + sl2 - bu[None], -s_i + sl3,
            -r_i[sgn_idx_j] + sl4, qv0 + sq)
    jam0 = (jnp.asarray(0.0, dtype), jnp.asarray(0.0, dtype))
    carry = ((x_i, u_i, s_i, r_i, sl1, lam1, sl2, lam2, sl3, lam3, sl4, lam4,
              sq, lq), res0, jam0, best0)
    (state_f, _res_f, _jam_f, best_f), diag_tr = jax.lax.scan(
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
