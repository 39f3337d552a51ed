"""Fused batch-last CVaR IPM iteration: level-blocked algebra + Pallas kernel.

Same role for the nested-CVaR SOCP (``solvers/cvar_ipm.py``, reference
``MPC_branch.py:1598-2152``) as ``tree_qp_pl`` plays for the QP path: the
vmapped structured IPM lowers to hundreds of small XLA kernels per Mehrotra
iteration (tree factor + K Woodbury column sweeps + 2 KKT solves + cone/risk
bookkeeping); at B=1024 each iteration costs ~60 ms against ~1 GFLOP of
arithmetic. This module runs the whole iteration as ONE Pallas TPU kernel over
batch tiles (lanes = batch), with three structural rewrites that keep the math
identical but the kernel small:

- **Multi-RHS tree sweeps.** The K per-cone Woodbury response columns
  (``cvar_ipm.newton_factor``'s ``jax.vmap(col)(eyeK)``) and the predictor
  right-hand side share one backward/forward sweep pair with an extra RHS axis
  (R = K+1) broadcast against the factorization blocks — one code path, K+1×
  the vector FLOPs, no K-fold kernel-size blowup.
- **Per-branch risk solve.** The risk saddle ``[[Hr, Reqᵀ],[Req, −εI]]``
  decouples: equality row i touches only (ρᵢ, σᵢ, μ⁻ᵢ·), σ's Hessian is
  exactly ε, and μ⁺ is untouched. Eliminating the multiplier through the σ
  row (no 1/ε anywhere — the naive Schur/augmented forms cancel
  catastrophically there) leaves one (2+m)² system per branch, solved by
  Gauss-Jordan WITH partial pivoting (mask-based row selection — LU-grade
  accuracy, no gathers). Replaces the (nrisk+bdim)² dense inverse.
- **Factored cone gradients.** ``∇q_k = (mask_k / c_k) ⊗ (per-stage gradient)``
  is never materialized as (K, totalu, n); all contractions against it reduce
  to one per-stage dot followed by a (K, totalu) mask contraction.

Parity: ``use_pallas=False`` runs the identical level-blocked iteration as
plain XLA — pinned against the vmapped solver in ``tests/test_cvar_pl.py``
(f64 CPU: bit-near-identical gap trajectories until roundoff chaos; oracle
gates at the vmapped tolerances). On-chip f32 the kernel sits in the same
convergence regime as every f32 CVaR path (gap O(1), see ``cvar_ipm``'s
precision notes): gap p50 ≈ 1.0 matches the XLA variant, while pointwise u
comparisons between layouts scatter on hard lanes (u0 diff p50 0.05, p90
0.65 measured at B=256) — use f64 (CPU) where parity-grade CVaR solutions
are required. Differences from the vmapped path (beyond layout): Gauss-
Jordan in place of ``linalg.inv``/LU, and no ``refine``/``outer_dtype``
options. The merge state transform S is supported per lane: the cone
quadratic SᵀQS, transformed rows Fx·S, and their outer products enter as
per-lane tiled constants (``QxC``/``Fxl``/``FxFx``), so the kernel body is
identical with and without S.

Mosaic notes beyond ``tree_qp_pl``'s: 2-D shared constants cannot be
broadcast into rank-5 positions (lane-1 vector materialization) — tile them
against T in-VMEM first (``t3``); middle-axis ``jnp.sum`` over a *sliced*
operand lowers to an unsupported offset multi_reduction — unroll (``sum1``).

Measured (v5e, 40 iterations, tile 128): 422 solves/s (vmapped, B=1024) →
6.1k (B=256) / 14.8k (B=4096) / 15.2k (B=8192) — 36×.

MXU experiment (2026-08-21, ``CVaRIPMConfig.mxu``): routing the K-cone
mask/risk contractions through 2-D ``jnp.dot`` (full-f32 MXU matmuls,
verified bit-identical per iteration vs the VPU path) measured *slightly
slower* — interleaved A/B at B=8192/iters=24: VPU 14.7/15.0/14.6k vs MXU
14.0/14.8/11.6k solves/s. The contractions are too small ((12, 104)@(104,
128)) for MXU issue latency to beat the VPU, and the kernel's critical path
is the per-lane Riccati smalls either way. Kept as an option, default off.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from belief_planning_tpu.solvers.cvar import CVaRPlan
from belief_planning_tpu.solvers.cvar_ipm import CVaRIPMConfig
from belief_planning_tpu.solvers.tree_qp import _f32_precision
from belief_planning_tpu.solvers.tree_qp_pl import (
    _addvec,
    _eye2,
    _factor_blocks,
    _fold0,
    _repeat0,
    _ublk,
    _xblk,
    build_levels,
)


# ---------------------------------------------------------------------------
# Small helpers (batch-last, Mosaic-safe: slices/ints/None + broadcast/sum)
# ---------------------------------------------------------------------------


def _gj_inv_bl(M):
    """Unpivoted Gauss-Jordan inverse of (a, a, T) small matrices, batch-last.

    Row operations via slice+concat only (no gather/scatter). Used on the
    W^½-equilibrated Woodbury capacitance ``I − Dw GᵀZ Dw`` — symmetric
    positive definite with diagonal ≥ 1, where unpivoted elimination is
    stable (Cholesky-grade)."""
    a, _, T = M.shape
    dtype = M.dtype
    rows = []
    for i in range(a):
        parts = [p for p in
                 (jnp.zeros((1, i, T), dtype), jnp.ones((1, 1, T), dtype),
                  jnp.zeros((1, a - i - 1, T), dtype)) if p.shape[1]]
        eye_i = jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]
        rows.append(jnp.concatenate([M[i:i + 1], eye_i], axis=1))  # (1, 2a, T)
    for i in range(a):
        ri = rows[i] / rows[i][:, i:i + 1, :]
        new_rows = []
        for j in range(a):
            if j == i:
                new_rows.append(ri)
            else:
                new_rows.append(rows[j] - rows[j][:, i:i + 1, :] * ri)
        rows = new_rows
    return jnp.concatenate([r[:, a:, :] for r in rows], axis=0)


def _gj_solve_pivot_bl(A, B):
    """Solve A X = B for (nb, a, a, T) systems with (nb, a, R, T) right-hand
    sides, by Gauss-Jordan WITH partial pivoting. The pivot row is selected
    per lane with comparison masks and first-match one-hots (no gather/
    scatter/argmax — Mosaic-safe), so accuracy matches pivoted LU."""
    nb, a, _, T = A.shape
    dtype = A.dtype
    aug = jnp.concatenate([A, B], axis=2)                  # (nb, a, a+R, T)

    def cat1(parts):
        parts = [p for p in parts if p.shape[1]]
        return jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]

    for k in range(a):
        col = jnp.abs(aug[:, :, k, :])                     # (nb, a, T)
        rowmask = cat1([jnp.zeros((1, k, T), dtype),
                        jnp.ones((1, a - k, T), dtype)])
        eligible = col * rowmask
        mx = jnp.max(eligible, axis=1, keepdims=True)      # (nb, 1, T)
        # bool→dtype cast (a weak-float where(cond, 1.0, 0.0) promotes to f64
        # under x64; Mosaic has no f64 vectors)
        eq = (eligible >= mx).astype(dtype) * rowmask
        # first-match one-hot down the row axis
        taken = jnp.zeros((nb, 1, T), dtype)
        fo_rows = []
        for j in range(a):
            fj = eq[:, j:j + 1, :] * (1.0 - taken)
            fo_rows.append(fj)
            taken = taken + fj
        fo = jnp.concatenate(fo_rows, axis=1)              # (nb, a, T)
        pivrow = jnp.sum(fo[:, :, None, :] * aug, axis=1, keepdims=True)
        rowk = aug[:, k:k + 1]
        # swap: selected row := old row k, then row k := pivot row
        aug = jnp.where(fo[:, :, None, :] > 0.5,
                        jnp.broadcast_to(rowk, aug.shape), aug)
        aug = cat1([aug[:, :k], pivrow, aug[:, k + 1:]])
        rk = aug[:, k:k + 1] / aug[:, k:k + 1, k:k + 1, :]
        aug = aug - aug[:, :, k:k + 1, :] * rk
        aug = cat1([aug[:, :k], rk, aug[:, k + 1:]])
    return aug[:, :, a:, :]


def _mv_mr(A, v):
    """(nb, i, k, T) @ (nb, k, R, T) → (nb, i, R, T)."""
    return jnp.sum(A[:, :, :, None, :] * v[:, None, :, :, :], axis=2)


def _mtv_mr(A, v):
    """Aᵀv: (nb, k, i, T), (nb, k, R, T) → (nb, i, R, T)."""
    return jnp.sum(A[:, :, :, None, :] * v[:, :, None, :, :], axis=1)


def _linear_blocks_mr(levels, K_l, Hinv_l, Acl_l, B_st, qx_f, qu_f, n, d, m):
    """Backward linear sweep with an RHS axis: qx_f (totalx→stage-major? no —
    flat per-stage (totalu, n, R, T)), qu_f (totalu, d, R, T); terminal linear
    term is zero (the CVaR KKT has none). Returns per-level kff blocks
    (nb, l, d, R, T)."""
    NB = len(levels) - 1
    kff_l = [None] * (NB + 1)
    p_head_next = None
    R = qx_f.shape[2]
    for k in range(NB, -1, -1):
        mt = levels[k]
        nd = n + d
        if k == NB:
            T = qx_f.shape[-1]
            p = jnp.zeros((mt.nb, nd, R, T), qx_f.dtype)
        else:
            p = _fold0(p_head_next, m)
        qx_b = _ublk(qx_f, mt)
        qu_b = _ublk(qu_f, mt)
        B_b = _ublk(B_st, mt)
        kffs = []
        for j in range(mt.l - 1, -1, -1):
            l_u = qu_b[:, j] + _mtv_mr(B_b[:, j], p[:, :n]) + p[:, n:]
            kff = -_mv_mr(Hinv_l[k][:, j], l_u)
            pn = _mtv_mr(Acl_l[k][:, j], p) + _mtv_mr(K_l[k][:, j], qu_b[:, j])
            p = _addvec(pn, qx_b[:, j], 0)
            kffs.append(kff)
        kffs.reverse()
        kff_l[k] = jnp.stack(kffs, axis=1)
        p_head_next = p
    return kff_l


def _forward_blocks_mr(levels, K_l, Acl_l, B_st, kff_l, n, d, m, dtype, R, T):
    """Forward rollout with RHS axis (zero root state). Returns flat
    dx (totalx, n, R, T), du (totalu, d, R, T)."""
    NB = len(levels) - 1
    xi = jnp.zeros((1, n + d, R, T), dtype)
    dx_parts, du_parts = [], []
    for k in range(NB + 1):
        mt = levels[k]
        B_b = _ublk(B_st, mt)
        us, xs = [], []
        for j in range(mt.l):
            kf = kff_l[k][:, j]
            u = _mv_mr(K_l[k][:, j], xi) + kf
            xs.append(xi[:, :n])
            xi = _mv_mr(Acl_l[k][:, j], xi) + jnp.concatenate(
                [_mv_mr(B_b[:, j], kf), kf], axis=1)
            us.append(u)
        if mt.leaf:
            xs.append(xi[:, :n])
        du_parts.append(jnp.stack(us, axis=1).reshape(mt.nb * mt.l, d, R, T))
        dx_parts.append(jnp.stack(xs, axis=1).reshape(mt.nb * mt.lx, n, R, T))
        if k < NB:
            xi = _repeat0(xi, m)
    return jnp.concatenate(dx_parts, axis=0), jnp.concatenate(du_parts, axis=0)


# ---------------------------------------------------------------------------
# One fused CVaR IPM iteration (pure jnp on a batch tile, batch-last)
# ---------------------------------------------------------------------------


CV_CARRY_FIELDS = 14  # x, u, s, r, sl1, lam1, sl2, lam2, sl3, lam3, sl4, lam4, sq, lq

CV_CONST_ORDER = ["A_st", "B_st", "dh", "b1", "pa", "csc", "cx", "cc",
                  "QxC", "Fxl", "FxFx"]
CV_SHARED_ORDER = ["Fx", "Fu", "bu", "QxC", "Rm", "mask", "maskT",
                   "frisk", "friskT", "Ssgn", "SsgnT", "itv"]


def make_cvar_iteration(cplan: CVaRPlan, cfg: CVaRIPMConfig, dims: dict):
    """Returns iterate(consts..., shared..., carry...) → new carry + gap.

    dims: n, d, m, Nc, nFx, nFu, K, bdim, nrisk, nsgn, Qslack1 (float),
    mtot (float). All arrays batch-last with trailing tile axis T."""
    plan = cplan.plan
    topo = plan.topo
    n, d, m = dims["n"], dims["d"], dims["m"]
    Nc, nFu = dims["Nc"], dims["nFu"]
    K, bdim, nrisk, nsgn = dims["K"], dims["bdim"], dims["nrisk"], dims["nsgn"]
    Qslack1 = dims["Qslack1"]
    mtot = dims["mtot"]
    totalu, totalx = topo.totalu, topo.totalx
    levels = build_levels(plan)
    n_leaves = len(plan.leaf_ids)

    def cx_gather(x_f):
        """x at constrained nodes: flat (totalx, n, [R,] T) → (totalu, n, [R,] T)."""
        parts = []
        for mt in levels:
            xb = _xblk(x_f, mt)
            parts.append(xb[:, :mt.l].reshape((mt.nb * mt.l,) + x_f.shape[1:]))
        return jnp.concatenate(parts, axis=0)

    def iterate(
        # per-problem consts (tiled); pa = p_nonleaf/ralpha (bdim, m, T);
        # QxC (n,n,T) / Fxl (nFx,n,T) / FxFx (nFx,n,n,T) are per-lane so the
        # merge state transform S (Qx_cone = SᵀQS, rows Fx·S) rides the same
        # kernel — without S they are broadcasts of Q / Fx
        A_st, B_st, dh, b1, pa, csc, cxl, cc, QxC, Fxl, FxFx,
        # shared consts
        Fu, bu, Rm, mask, maskT, frisk, friskT, Ssgn, SsgnT, itv,
        # carry
        x_c, u_c, s_c, r_c, sl1, lam1, sl2, lam2, sl3, lam3, sl4, lam4, sq, lq,
    ):
        dtype = x_c.dtype
        T = x_c.shape[-1]
        w_max_eff = (cfg.w_max if dtype == jnp.float64
                     else min(cfg.w_max, cfg.w_max_f32))
        nFx = Nc - 1
        csc_inv = 1.0 / csc                                    # (K, T)


        def sum1(v):
            """Unrolled middle-axis sum (Mosaic: multi_reduction on sliced
            operands with sublane offsets is unsupported)."""
            out = v[:, 0]
            for c in range(1, v.shape[1]):
                out = out + v[:, c]
            return out

        def t3(C):
            """2D shared const -> (.., T)-tiled copy (in-VMEM broadcast)."""
            return jnp.broadcast_to(C[:, :, None], C.shape + (T,))

        MXU = bool(getattr(cfg, "mxu", False))

        def kdot(M2, v):
            """2-D shared const (a, b) @ lanes (b, T) → (a, T) on the MXU.
            The solver's f32-precision context makes this a full-f32 matmul
            (3-pass bf16); Mosaic supports 2-D jnp.dot natively."""
            return jnp.dot(M2, v, preferred_element_type=dtype)

        maskT_t, friskT_t = t3(maskT), t3(friskT)
        if not MXU:
            mask_t, frisk_t = t3(mask), t3(frisk)
            Ssgn_t, SsgnT_t = t3(Ssgn), t3(SsgnT)

        # ---- row/lane helpers (same conventions as tree_qp_pl) ------------
        def row_mul(xv):
            """x rows (totalu, n, [R,] T) → [−dh·x; Fx x] (totalu, Nc, [R,] T)."""
            if xv.ndim == 3:
                r0 = -jnp.sum(dh * xv, axis=1, keepdims=True)
                rr = jnp.sum(Fxl[None, :, :, :] * xv[:, None, :, :], axis=2)
            else:
                r0 = -jnp.sum(dh[:, :, None, :] * xv, axis=1, keepdims=True)
                rr = jnp.sum(Fxl[None, :, :, None, :]
                             * xv[:, None, :, :, :], axis=2)
            return jnp.concatenate([r0, rr], axis=1)

        def row_mulT(v):
            """Fxcᵀ v: (totalu, Nc, [R,] T) → (totalu, n, [R,] T)."""
            if v.ndim == 3:
                out = -dh * v[:, 0:1, :]
                return out + jnp.sum(
                    Fxl[None, :, :, :] * v[:, 1:][:, :, None, :], axis=1)
            out = -dh[:, :, None, :] * v[:, 0:1]
            return out + jnp.sum(
                Fxl[None, :, :, None, :] * (v[:, 1:])[:, :, None, :, :],
                axis=1)

        def fu_mul(uv):
            return jnp.sum(Fu[None, :, :, None] * uv[:, None, :, :], axis=2)

        def fu_mulT(v):
            return jnp.sum(Fu[None, :, :, None] * v[:, :, None, :], axis=1)

        def sum_lane(v):
            s = jnp.sum(v, axis=tuple(range(v.ndim - 1)), keepdims=True)
            return s.reshape(1, s.shape[-1])

        def min_lane(v):
            s = jnp.min(v, axis=tuple(range(v.ndim - 1)), keepdims=True)
            return s.reshape(1, s.shape[-1])

        def sgn_sel(v):
            """v[sgn_idx]: (nrisk, T) → (nsgn, T) via the 0/1 selector."""
            if MXU:
                return kdot(Ssgn, v)
            return jnp.sum(Ssgn_t * v[None, :, :], axis=1)

        def sgn_scatter(v):
            """zeros(nrisk).at[sgn_idx].add(v): (nsgn, T) → (nrisk, T)."""
            if MXU:
                return kdot(SsgnT, v)
            return jnp.sum(SsgnT_t * v[None, :, :], axis=1)

        def first_row_vec(val_row0, rest_rows, width):
            """(1, width, T) stacked over zeros → (totalu, width, T)."""
            return jnp.concatenate(
                [val_row0, jnp.zeros((rest_rows, width, T), dtype)], axis=0)

        # ---- per-stage cone pieces ----------------------------------------
        xc = cx_gather(x_c)                                    # (totalu, n, T)
        gx_stage = 2.0 * jnp.sum(
            xc[:, :, None, :] * QxC[None, :, :, :], axis=1) \
            + cxl[None, :, :]                                  # (totalu, n, T)
        gu_stage = 2.0 * jnp.sum(
            u_c[:, :, None, :] * Rm[None, :, :, None], axis=1)

        stage_cost = (
            jnp.sum(xc * (gx_stage - cxl[None, :, :]), axis=1) * 0.5
            + jnp.sum(xc * cxl[None, :, :], axis=1) + cc
            + jnp.sum(u_c * gu_stage, axis=1) * 0.5
            + Qslack1 * sum1(s_c)
        )                                                      # (totalu, T)
        # (xᵀQx = ½ x·(2Qx) = ½ x·(gx_stage − cx); then + x·cx + cconst)

        def cone_vals(stage_cost_, r_):
            if MXU:
                return (kdot(mask, stage_cost_) + kdot(frisk, r_)) * csc_inv
            q = jnp.sum(mask_t * stage_cost_[None, :, :], axis=1)
            q = q * csc_inv
            q = q + jnp.sum(frisk_t * r_[None, :, :], axis=1) * csc_inv
            return q                                           # (K, T)

        def gdot(xx_c, uu, ss, rr):
            """g_kᵀ v for all K cones; inputs may carry an R axis."""
            if xx_c.ndim == 3:
                ds = (jnp.sum(gx_stage * xx_c, axis=1)
                      + jnp.sum(gu_stage * uu, axis=1)
                      + Qslack1 * sum1(ss))                    # (totalu, T)
                if MXU:
                    return (kdot(mask, ds) + kdot(frisk, rr)) * csc_inv
                out = jnp.sum(mask_t * ds[None, :, :], axis=1)
                out = out * csc_inv
                out = out + jnp.sum(
                    frisk_t * rr[None, :, :], axis=1) * csc_inv
                return out                                     # (K, T)
            ds = (jnp.sum(gx_stage[:, :, None, :] * xx_c, axis=1)
                  + jnp.sum(gu_stage[:, :, None, :] * uu, axis=1)
                  + Qslack1 * sum1(ss))                        # (totalu, R, T)
            if MXU:
                # unrolled R small dots — avoids the (K, totalu, R, T) VMEM
                # broadcast temporary entirely
                R_ = ds.shape[1]
                outs = []
                for r_i in range(R_):
                    o = (kdot(mask, ds[:, r_i, :])
                         + kdot(frisk, rr[:, r_i, :])) * csc_inv
                    outs.append(o[:, None, :])
                return jnp.concatenate(outs, axis=1)           # (K, R, T)
            out = jnp.sum(mask_t[:, :, None, :] * ds[None], axis=1)
            out = out * csc_inv[:, None, :]
            out = out + jnp.sum(
                frisk_t[:, :, None, :] * rr[None, :, :, :], axis=1
            ) * csc_inv[:, None, :]
            return out                                         # (K, R, T)

        # ---- residuals -----------------------------------------------------
        rows1 = row_mul(xc) - s_c
        rows2 = fu_mul(u_c)
        qv = cone_vals(stage_cost, r_c)
        r1 = rows1 + sl1 - b1
        r2 = rows2 + sl2 - bu[:, :, None]
        r3 = -s_c + sl3
        r4 = -sgn_sel(r_c) + sl4
        rq = qv + sq
        gap = (sum_lane(sl1 * lam1) + sum_lane(sl2 * lam2)
               + sum_lane(sl3 * lam3) + sum_lane(sl4 * lam4)
               + sum_lane(sq * lq)) / mtot                     # (1, T)

        # ---- barrier-weighted factorization --------------------------------
        clampw = lambda w: jnp.minimum(w, w_max_eff)
        lq_eff = lq * csc_inv                                  # (K, T)
        lqs = (kdot(maskT, lq_eff) if MXU
               else jnp.sum(maskT_t * lq_eff[None, :, :], axis=1))  # (totalu, T)
        root_col = jnp.concatenate(
            [jnp.ones((1, T), dtype), jnp.zeros((totalu - 1, T), dtype)], axis=0)
        lam_stage = lqs + root_col
        w1 = clampw(lam1 / sl1)
        w2 = clampw(lam2 / sl2)
        w3 = clampw(lam3 / sl3)
        w4 = clampw(lam4 / sl4)
        wq = clampw(lq / sq)
        kap = w1 + w3 + cfg.reg
        coefs = w1 - w1 * w1 / kap
        eye_n = _eye2(n, dtype)[None, :, :, None]
        Qx2 = 2.0 * lqs[:, None, None, :] * QxC[None, :, :, :]
        Qx2 = Qx2 + cfg.reg * eye_n
        Qx2 = Qx2 + (coefs[:, 0:1][:, :, None, :]
                     * dh[:, :, None, :] * dh[:, None, :, :])
        Qx2 = Qx2 + jnp.sum(
            coefs[:, 1:][:, :, None, None, :] * FxFx[None, :, :, :, :],
            axis=1)
        FuFu = Fu[:, :, None] * Fu[:, None, :]
        Ru2 = 2.0 * lam_stage[:, None, None, :] * Rm[None, :, :, None]
        Ru2 = Ru2 + cfg.reg * _eye2(d, dtype)[None, :, :, None]
        Ru2 = Ru2 + jnp.sum(
            w2[:, :, None, None, :] * FuFu[None, :, :, :, None], axis=1)
        Pterm2 = jnp.broadcast_to(
            cfg.reg * eye_n, (n_leaves, n, n, T))
        Dab2 = jnp.zeros((totalu, d, d, T), dtype)
        K_l, Hinv_l, Acl_l = _factor_blocks(
            levels, Qx2, Dab2, Ru2, Pterm2, A_st, B_st, n, d, m, cfg.reg)

        # ---- risk block (diagonal Hr + Schur on the equality rows) --------
        hd = cfg.reg + sgn_scatter(w4)                         # (nrisk, T)
        # The saddle [[Hr, Reqᵀ],[Req, −εI]] decouples per branch: equality
        # row i touches only (ρ_i, σ_i, μ⁻_{i,·}), the σ Hessian is exactly ε
        # (σ has no sign row), and μ⁺ is untouched. Eliminating the multiplier
        # through the σ row (ν_i = q_σ − ε·v_σ — no division by ε, which is
        # what made the Schur form catastrophically cancel) leaves one
        # (2+m)×(2+m) system per branch, solved with PIVOTED Gauss-Jordan:
        #   [ h_ρ     −ε       0      ] [v_ρ]   [q_ρ − q_σ]
        #   [ 1       1+ε²    −paᵀ    ] [v_σ] = [ε·q_σ]
        #   [ 0       ε·pa    diag(h_μ)] [v_μ]  [q_μ + pa·q_σ]
        # with pa = p_i/α from the risk recursion (runtime branch probs).
        h_rho = hd[0:bdim]                                     # (bdim, T)
        h_muP = hd[2 * bdim:2 * bdim + bdim * m]               # (bdim·m, T)
        mu_m0 = 2 * bdim + bdim * m
        # (bdim, m, T) via stacked static slices — a reshape that splits the
        # sublane axis is an unsupported Mosaic shape cast
        h_muM = jnp.stack(
            [hd[mu_m0 + i * m:mu_m0 + (i + 1) * m] for i in range(bdim)],
            axis=0)
        eps = cfg.reg
        eye_m = _eye2(m, dtype)[None, :, :, None]
        row_rho = jnp.concatenate(
            [(h_rho[:, None, :])[:, :, None, :],
             jnp.full((bdim, 1, 1, T), -eps, dtype),
             jnp.zeros((bdim, 1, m, T), dtype)], axis=2)
        row_eq = jnp.concatenate(
            [jnp.ones((bdim, 1, 1, T), dtype),
             jnp.full((bdim, 1, 1, T), 1.0 + eps * eps, dtype),
             -pa[:, None, :, :]], axis=2)
        rows_mu = jnp.concatenate(
            [jnp.zeros((bdim, m, 1, T), dtype),
             eps * pa[:, :, None, :],
             h_muM[:, :, None, :] * eye_m], axis=2)
        M_risk = jnp.concatenate([row_rho, row_eq, rows_mu], axis=1)

        def risk_tl(q):
            """Top-left block of the risk saddle inverse applied to q
            ((nrisk, R, T)), via the per-branch ν-eliminated systems."""
            R_ = q.shape[1]
            q_rho = q[0:bdim]                                  # (bdim, R, T)
            q_sig = q[bdim:2 * bdim]
            q_muP = q[2 * bdim:2 * bdim + bdim * m]
            q_muM = jnp.stack(
                [q[mu_m0 + i * m:mu_m0 + (i + 1) * m] for i in range(bdim)],
                axis=0)                                        # (bdim,m,R,T)
            rhs = jnp.concatenate(
                [(q_rho - q_sig)[:, None], (eps * q_sig)[:, None],
                 q_muM + pa[:, :, None, :] * q_sig[:, None]], axis=1)
            v = _gj_solve_pivot_bl(M_risk, rhs)                # (bdim,2+m,R,T)
            v_muP = q_muP / h_muP[:, None, :]
            return jnp.concatenate(
                [v[:, 0], v[:, 1], v_muP,
                 v[:, 2:].reshape(bdim * m, R_, T)], axis=0)

        # ---- H0 solve (tree + rows + risk), multi-RHS ----------------------
        w1kap = w1 / kap

        def h0_apply(qx, qu, qs, qr):
            """Factorized solve of the row-eliminated H0 system. All inputs
            carry an R axis: qx (totalu, n, R, T), qu (totalu, d, R, T),
            qs (totalu, Nc, R, T), qr (nrisk, R, T)."""
            qx_eff = qx + row_mulT(w1kap[:, :, None, :] * qs)
            kff_l = _linear_blocks_mr(
                levels, K_l, Hinv_l, Acl_l, B_st, qx_eff, qu, n, d, m)
            R_ = qx.shape[2]
            xr, ur = _forward_blocks_mr(
                levels, K_l, Acl_l, B_st, kff_l, n, d, m, dtype, R_, T)
            sr = (w1[:, :, None, :] * row_mul(cx_gather(xr)) - qs) \
                / kap[:, :, None, :]
            rr = -risk_tl(qr)
            return xr, ur, sr, rr

        # ---- dual residual pieces ------------------------------------------
        obj_gu = first_row_vec(
            2.0 * jnp.sum(u_c[0:1][:, :, None, :] * Rm[None, :, :, None],
                          axis=1), totalu - 1, d)
        obj_s_col = first_row_vec(
            jnp.full((1, Nc, T), Qslack1, dtype), totalu - 1, Nc)
        obj_r = jnp.concatenate(
            [jnp.ones((1, T), dtype), jnp.zeros((nrisk - 1, T), dtype)], axis=0)

        rd_x = lqs[:, None, :] * gx_stage + row_mulT(lam1)
        rd_u = lqs[:, None, :] * gu_stage + obj_gu + fu_mulT(lam2)
        rd_s = obj_s_col + Qslack1 * lqs[:, None, :] - lam1 - lam3
        rd_r = obj_r + jnp.sum(
            friskT_t * lq_eff[None, :, :], axis=1) - sgn_scatter(lam4)

        # ---- Woodbury columns + predictor in one multi-RHS sweep ----------
        def direction_rhs(rc1, rc2, rc3, rc4, rcq):
            ex1 = (-rc1 + lam1 * r1) / sl1
            ex2 = (-rc2 + lam2 * r2) / sl2
            ex3 = (-rc3 + lam3 * r3) / sl3
            ex4 = (-rc4 + lam4 * r4) / sl4
            exq = (-rcq + lq * rq) / sq
            qx = rd_x + row_mulT(ex1)
            qu = rd_u + fu_mulT(ex2)
            qs = rd_s - ex1 - ex3
            qr = rd_r - sgn_scatter(ex4)
            # fold the eliminated cone duals into the rhs: + Σ exq_k g_k
            exqc = exq * csc_inv
            if MXU:
                eg = kdot(maskT, exqc)                         # (totalu, T)
                qr_add = kdot(friskT, exqc)
            else:
                eg = jnp.sum(maskT_t * exqc[None, :, :], axis=1)
                qr_add = jnp.sum(friskT_t * exqc[None, :, :], axis=1)
            qx = qx + eg[:, None, :] * gx_stage
            qu = qu + eg[:, None, :] * gu_stage
            qs = qs + Qslack1 * eg[:, None, :]
            qr = qr + qr_add
            return (qx, qu, qs, qr), (ex1, ex2, ex3, ex4, exq)

        rhs_a, _ = direction_rhs(sl1 * lam1, sl2 * lam2, sl3 * lam3,
                                 sl4 * lam4, sq * lq)
        qx_a, qu_a, qs_a, qr_a = rhs_a

        mT = maskT_t * csc_inv[None, :, :]                     # (totalu, K, T)
        qx_mr = jnp.concatenate(
            [mT[:, None, :, :] * gx_stage[:, :, None, :], qx_a[:, :, None, :]],
            axis=2)                                            # (totalu,n,K+1,T)
        qu_mr = jnp.concatenate(
            [mT[:, None, :, :] * gu_stage[:, :, None, :], qu_a[:, :, None, :]],
            axis=2)
        qs_mr = jnp.concatenate(
            [jnp.broadcast_to(Qslack1 * mT[:, None, :, :],
                              (totalu, Nc, K, T)), qs_a[:, :, None, :]],
            axis=2)
        fT = friskT_t * csc_inv[None, :, :]                    # (nrisk, K, T)
        qr_mr = jnp.concatenate([fT, qr_a[:, None, :]], axis=1)  # (nrisk,K+1,T)

        Zx, Zu, Zs, Zr = h0_apply(qx_mr, qu_mr, qs_mr, qr_mr)
        gd_all = gdot(cx_gather(Zx), Zu, Zs, Zr)               # (K, K+1, T)
        GtZ = gd_all[:, :K, :]
        # Woodbury capacitance M = I − GᵀZ·diag(wq) with −GᵀZ PSD (Z = −H₀⁻¹G).
        # Equilibrate by W^½: M' = I − Dw GᵀZ Dw is symmetric positive definite
        # with diagonal ≥ 1 → unpivoted GJ is stable; M⁻¹v = Dw⁻¹ M'⁻¹ Dw v.
        sw = jnp.sqrt(wq)                                      # (K, T)
        Wm_n = (_eye2(K, dtype)[:, :, None]
                - GtZ * sw[:, None, :] * sw[None, :, :])
        Wm_n_inv = _gj_inv_bl(Wm_n)

        ZxK, ZuK = Zx[:, :, :K, :], Zu[:, :, :K, :]
        ZsK, ZrK = Zs[:, :, :K, :], Zr[:, :K, :]

        def wb_correct(ax, au, as_, ar, phi0):
            phi = jnp.sum(Wm_n_inv * (sw * phi0)[None, :, :], axis=1) / sw
            corr = wq * phi
            dx = ax + jnp.sum(ZxK * corr[None, None, :, :], axis=2)
            du = au + jnp.sum(ZuK * corr[None, None, :, :], axis=2)
            dsv = as_ + jnp.sum(ZsK * corr[None, None, :, :], axis=2)
            dr = ar + jnp.sum(ZrK * corr[None, :, :], axis=1)
            return dx, du, dsv, dr

        def finish_direction(dx, du, dsv, dr):
            drow1 = row_mul(cx_gather(dx)) - dsv
            drow2 = fu_mul(du)
            dsl1 = -r1 - drow1
            dsl2 = -r2 - drow2
            dsl3 = -r3 + dsv
            dsl4 = -r4 + sgn_sel(dr)
            dq = gdot(cx_gather(dx), du, dsv, dr)
            dsq = -rq - dq
            return (dx, du, dsv, dr, dsl1, dsl2, dsl3, dsl4, dsq)

        def dual_steps(rc1, rc2, rc3, rc4, rcq, dirs):
            (dx, du, dsv, dr, dsl1, dsl2, dsl3, dsl4, dsq) = dirs
            dlam1 = (-rc1 - lam1 * dsl1) / sl1
            dlam2 = (-rc2 - lam2 * dsl2) / sl2
            dlam3 = (-rc3 - lam3 * dsl3) / sl3
            dlam4 = (-rc4 - lam4 * dsl4) / sl4
            dlq = (-rcq - lq * dsq) / sq
            return dirs + (dlam1, dlam2, dlam3, dlam4, dlq)

        # predictor: solution column K of the multi-RHS solve, Woodbury-fixed
        axp = Zx[:, :, K, :]
        aup = Zu[:, :, K, :]
        asp = Zs[:, :, K, :]
        arp = Zr[:, K, :]
        da_core = wb_correct(axp, aup, asp, arp, gd_all[:, K, :])
        rhs_pred = (sl1 * lam1, sl2 * lam2, sl3 * lam3, sl4 * lam4, sq * lq)
        da = dual_steps(*rhs_pred, finish_direction(*da_core))

        def max_step(v, dv):
            ratio = jnp.where(dv < 0, -v / dv,
                              jnp.asarray(jnp.inf, dtype))
            return jnp.minimum(1.0, min_lane(ratio))

        def all_step(dirs):
            (_, _, _, _, dsl1, dsl2, dsl3, dsl4, dsq,
             dlam1, dlam2, dlam3, dlam4, dlq) = dirs
            a = jnp.minimum(max_step(sl1, dsl1), max_step(lam1, dlam1))
            a = jnp.minimum(a, jnp.minimum(max_step(sl2, dsl2),
                                           max_step(lam2, dlam2)))
            a = jnp.minimum(a, jnp.minimum(max_step(sl3, dsl3),
                                           max_step(lam3, dlam3)))
            a = jnp.minimum(a, jnp.minimum(max_step(sl4, dsl4),
                                           max_step(lam4, dlam4)))
            a = jnp.minimum(a, jnp.minimum(max_step(sq, dsq),
                                           max_step(lq, dlq)))
            return a

        a_aff = all_step(da)
        (_, _, _, _, dsl1a, dsl2a, dsl3a, dsl4a, dsqa,
         dlam1a, dlam2a, dlam3a, dlam4a, dlqa) = da
        gap_aff = (
            sum_lane((sl1 + a_aff * dsl1a) * (lam1 + a_aff * dlam1a))
            + sum_lane((sl2 + a_aff * dsl2a) * (lam2 + a_aff * dlam2a))
            + sum_lane((sl3 + a_aff * dsl3a) * (lam3 + a_aff * dlam3a))
            + sum_lane((sl4 + a_aff * dsl4a) * (lam4 + a_aff * dlam4a))
            + sum_lane((sq + a_aff * dsqa) * (lq + a_aff * dlqa))
        ) / mtot
        sigma_c = jnp.clip((gap_aff / (gap + 1e-30)) ** 3,
                           jnp.asarray(0.0, dtype), jnp.asarray(1.0, dtype))

        rhs_corr = (
            sl1 * lam1 + dsl1a * dlam1a - sigma_c * gap,
            sl2 * lam2 + dsl2a * dlam2a - sigma_c * gap,
            sl3 * lam3 + dsl3a * dlam3a - sigma_c * gap,
            sl4 * lam4 + dsl4a * dlam4a - sigma_c * gap,
            sq * lq + dsqa * dlqa - sigma_c * gap,
        )
        rhs_c, _ex_c = direction_rhs(*rhs_corr)
        acx, acu, acs, acr = h0_apply(
            rhs_c[0][:, :, None, :], rhs_c[1][:, :, None, :],
            rhs_c[2][:, :, None, :], rhs_c[3][:, None, :])
        acx, acu = acx[:, :, 0, :], acu[:, :, 0, :]
        acs, acr = acs[:, :, 0, :], acr[:, 0, :]
        phi0_c = gdot(cx_gather(acx), acu, acs, acr)
        dc_core = wb_correct(acx, acu, acs, acr, phi0_c)
        dc = dual_steps(*rhs_corr, finish_direction(*dc_core))

        # Gondzio multiple centrality correctors (same scheme and measured
        # motivation as cvar_ipm — see CVaRIPMConfig.gondzio): each round is
        # one more factorization-reusing solve on a pure complementarity rhs
        # that pushes outlier trial products back into [βmin·σμ, βmax·σμ].
        def direction_pure(rc1, rc2, rc3, rc4, rcq):
            ex1 = -rc1 / sl1
            ex2 = -rc2 / sl2
            ex3 = -rc3 / sl3
            ex4 = -rc4 / sl4
            exq = -rcq / sq
            qx = row_mulT(ex1)
            qu = fu_mulT(ex2)
            qs = -ex1 - ex3
            qr = -sgn_scatter(ex4)
            exqc = exq * csc_inv
            if MXU:
                eg = kdot(maskT, exqc)
                qr_add = kdot(friskT, exqc)
            else:
                eg = jnp.sum(maskT_t * exqc[None, :, :], axis=1)
                qr_add = jnp.sum(friskT_t * exqc[None, :, :], axis=1)
            qx = qx + eg[:, None, :] * gx_stage
            qu = qu + eg[:, None, :] * gu_stage
            qs = qs + Qslack1 * eg[:, None, :]
            qr = qr + qr_add
            px, pu, ps, pr = h0_apply(
                qx[:, :, None, :], qu[:, :, None, :],
                qs[:, :, None, :], qr[:, None, :])
            px, pu = px[:, :, 0, :], pu[:, :, 0, :]
            ps, pr = ps[:, :, 0, :], pr[:, 0, :]
            phi0 = gdot(cx_gather(px), pu, ps, pr)
            px, pu, ps, pr = wb_correct(px, pu, ps, pr, phi0)
            drow1 = row_mul(cx_gather(px)) - ps
            drow2 = fu_mul(pu)
            pdsl1 = -drow1
            pdsl2 = -drow2
            pdsl3 = ps
            pdsl4 = sgn_sel(pr)
            pdsq = -gdot(cx_gather(px), pu, ps, pr)
            pdlam1 = (-rc1 - lam1 * pdsl1) / sl1
            pdlam2 = (-rc2 - lam2 * pdsl2) / sl2
            pdlam3 = (-rc3 - lam3 * pdsl3) / sl3
            pdlam4 = (-rc4 - lam4 * pdsl4) / sl4
            pdlq = (-rcq - lq * pdsq) / sq
            return (px, pu, ps, pr, pdsl1, pdsl2, pdsl3, pdsl4, pdsq,
                    pdlam1, pdlam2, pdlam3, pdlam4, pdlq)

        for _ in range(cfg.gondzio):
            mu_t = sigma_c * gap + 1e-30                       # (1, T)
            a_cur = all_step(dc)
            ab = jnp.minimum(1.0, cfg.tau * a_cur + 0.3)       # (1, T)
            lo_t = cfg.gondzio_bmin * mu_t
            hi_t = cfg.gondzio_bmax * mu_t
            cap_t = 10.0 * hi_t
            (gdx, gdu, gdsv, gdr, gdsl1, gdsl2, gdsl3, gdsl4, gdsq,
             gdlam1, gdlam2, gdlam3, gdlam4, gdlq) = dc

            def outlier(v, dv, lam_, dlam_):
                if v.ndim == 3:
                    abv = ab[None, :, :].reshape(1, 1, T)
                    lo_, hi_, cap_ = (w[None, :, :].reshape(1, 1, T)
                                      for w in (lo_t, hi_t, cap_t))
                else:
                    abv, lo_, hi_, cap_ = ab, lo_t, hi_t, cap_t
                p = (v + abv * dv) * (lam_ + abv * dlam_)
                t = jnp.clip(p, lo_, hi_)
                return jnp.clip(p - t, -cap_, cap_)

            dd = direction_pure(
                outlier(sl1, gdsl1, lam1, gdlam1),
                outlier(sl2, gdsl2, lam2, gdlam2),
                outlier(sl3, gdsl3, lam3, gdlam3),
                outlier(sl4, gdsl4, lam4, gdlam4),
                outlier(sq, gdsq, lq, gdlq))
            cand = tuple(c + e for c, e in zip(dc, dd))
            a_new = all_step(cand)
            cand_ok = jnp.ones((1, T), dtype) > 0.5
            for cc_ in cand:
                fin = jnp.min(jnp.isfinite(cc_).astype(dtype),
                              axis=tuple(range(cc_.ndim - 1)), keepdims=True)
                cand_ok = jnp.logical_and(cand_ok, fin.reshape(1, T) > 0.5)
            accept = jnp.logical_and(a_new > a_cur, cand_ok)   # (1, T)

            def pick(c_, o_):
                if c_.ndim == 3:
                    return jnp.where(accept[None, :, :].reshape(1, 1, T),
                                     c_, o_)
                return jnp.where(accept, c_, o_)

            dc = tuple(pick(c_, o_) for c_, o_ in zip(cand, dc))

        a0 = cfg.tau * all_step(dc)
        obj_now = (0.5 * sum_lane(u_c[0:1] * obj_gu[0:1])
                   + r_c[0:1, :] + Qslack1 * sum_lane(s_c[0:1]))
        scale = 1.0 + jnp.abs(obj_now)
        a0 = jnp.where(gap < cfg.gap_tol * scale, jnp.asarray(0.0, dtype), a0)
        a0 = jnp.where(itv < cfg.early_iters,
                       jnp.minimum(a0, cfg.a_cap_early), a0)
        (dx, du, dsv, dr, dsl1, dsl2, dsl3, dsl4, dsq,
         dlam1, dlam2, dlam3, dlam4, dlq) = dc

        def gap_at(a):
            return (
                sum_lane((sl1 + a * dsl1) * (lam1 + a * dlam1))
                + sum_lane((sl2 + a * dsl2) * (lam2 + a * dlam2))
                + sum_lane((sl3 + a * dsl3) * (lam3 + a * dlam3))
                + sum_lane((sl4 + a * dsl4) * (lam4 + a * dlam4))
                + sum_lane((sq + a * dsq) * (lq + a * dlq))
            ) / mtot

        grow = 10.0 * gap + 1e-9
        a1 = jnp.where(gap_at(a0) > grow, 0.3 * a0, a0)
        a = jnp.where(gap_at(a1) > grow, 0.3 * a1, a1)

        finite = jnp.isfinite(a)
        for dd in dc:
            fin = jnp.min(jnp.isfinite(dd).astype(a.dtype),
                          axis=tuple(range(dd.ndim - 1)), keepdims=True)
            finite = jnp.logical_and(finite, fin.reshape(1, T) > 0.5)
        a = jnp.where(finite, a, jnp.asarray(0.0, dtype))

        def stepped(v, dv):
            if v.ndim == 3:
                return jnp.where(finite[None, :, :].reshape(1, 1, T),
                                 v + a[None, :, :].reshape(1, 1, T) * dv, v)
            return jnp.where(finite, v + a * dv, v)

        return (
            stepped(x_c, dx), stepped(u_c, du), stepped(s_c, dsv),
            stepped(r_c, dr),
            stepped(sl1, dsl1), stepped(lam1, dlam1),
            stepped(sl2, dsl2), stepped(lam2, dlam2),
            stepped(sl3, dsl3), stepped(lam3, dlam3),
            stepped(sl4, dsl4), stepped(lam4, dlam4),
            stepped(sq, dsq), stepped(lq, dlq),
            gap,
        )

    return iterate


# ---------------------------------------------------------------------------
# Solve driver: prep + init + scan over fused iterations (+ optional Pallas)
# ---------------------------------------------------------------------------


def _static_maps(cplan: CVaRPlan, ralpha: float):
    """Static cone/risk index matrices (NumPy), mirroring
    ``cvar_ipm.cvar_ipm_solve``'s construction (quirk slot maps included)."""
    topo = cplan.plan.topo
    totalu = topo.totalu
    bdim, nrisk, m, N = cplan.bdim, cplan.nrisk, topo.m, topo.N
    K = bdim * m
    u_off = np.asarray(topo.u_off)
    stage_mask = np.zeros((K, totalu))
    f_risk = np.zeros((K, nrisk))
    kk = 0
    for idx in range(bdim):
        for i in range(m):
            c = int(cplan.child_of[idx, i])
            stages = u_off[c] + np.arange(N)
            stage_mask[kk, stages] = 1.0
            f_risk[kk, bdim + idx] += 1.0
            f_risk[kk, 2 * bdim + cplan.slotP[idx, i]] += 1.0
            f_risk[kk, 2 * bdim + bdim * m + cplan.slotM[idx, i]] -= 1.0
            if cplan.child_nonleaf[idx, i]:
                f_risk[kk, c] += 1.0
            kk += 1
    sgn_idx = np.concatenate([np.arange(bdim), np.arange(2 * bdim, nrisk)])
    nsgn = len(sgn_idx)
    Ssgn = np.zeros((nsgn, nrisk))
    Ssgn[np.arange(nsgn), sgn_idx] = 1.0
    return stage_mask, f_risk, Ssgn, nsgn


def _succ_transitions(plan, A_bl, B_bl):
    topo = plan.topo
    sx_all = np.zeros(topo.totalu, dtype=np.int64)
    for k in range(topo.NB + 1):
        si = plan.stage_idx[k]
        sx = plan.succ_x_idx[k]
        sx_all[si.T.reshape(-1)] = sx.T.reshape(-1)
    return A_bl[sx_all], B_bl[sx_all]


@_f32_precision
def cvar_ipm_solve_pl(
    cplan: CVaRPlan,
    A_bl, B_bl, dh_bl, h0_bl, x_lin_bl, u_lin_bl, p_bl,
    Q, R, Qslack, xRef_bl, ralpha,
    Fx, bx, Fu, bu,
    cfg: CVaRIPMConfig = CVaRIPMConfig(),
    use_pallas: bool = True,
    tile_b: int = 128,
    S_bl=None,
    interpret: bool = False,
    s_warm_bl=None,
    r_warm_bl=None,
    dh0_floor=None,
):
    """Batch-last fused-iteration CVaR IPM. Inputs are ``_to_bl``-transposed
    tree arrays; ``xRef_bl`` is (n, Z); ``p_bl`` is (n_branches, m, Z).
    Semantics = ``cvar_ipm_solve`` with default precision options (refine=0,
    outer_dtype=same). ``S_bl`` (n, n, Z) applies the merge state transform
    per lane (cone quadratic SᵀQS, rows Fx·S, dh[0] floor quirk — the linear
    cone term stays untransformed, as in ``cvar_ipm_solve``); ``bx`` may be
    (nFx,) shared or (nFx, Z) per-lane (runtime ramp bounds). Returns
    (x, u, s, r, aux) batch-last."""
    plan = cplan.plan
    topo = plan.topo
    n, d, m = topo.n, topo.d, topo.m
    totalu, totalx = topo.totalu, topo.totalx
    bdim, nrisk = cplan.bdim, cplan.nrisk
    K = bdim * m
    dtype = x_lin_bl.dtype
    Z = x_lin_bl.shape[-1]
    Fx = np.asarray(Fx, np.float64)
    nFx, nFu = Fx.shape[0], np.asarray(Fu).shape[0]
    Nc = nFx + 1
    Qslack1 = float(np.asarray(Qslack)[1])

    mask_np, frisk_np, Ssgn_np, nsgn = _static_maps(cplan, float(ralpha))
    mtot = float(totalu * Nc + totalu * nFu + totalu * Nc + nsgn + K)

    A_st, B_st = _succ_transitions(plan, A_bl, B_bl)
    bx_j = jnp.asarray(bx, dtype)
    bx_row = (bx_j[None, :, None] if bx_j.ndim == 1
              else bx_j[None, :, :])                            # (1, nFx, Z?)
    pa = jnp.asarray(p_bl[:bdim], dtype) / ralpha               # (bdim, m, Z)
    Qm = jnp.asarray(Q, dtype)
    Fx_j = jnp.asarray(Fx, dtype)
    if S_bl is not None:
        S_bl = jnp.asarray(S_bl, dtype)                        # (n, n, Z)
        # quirk parity with cvar_ipm_solve: quadratic through S, linear not;
        # collision-row x-component floored away from zero
        QxC_c = jnp.einsum("jit,jk,klt->ilt", S_bl, Qm, S_bl)
        Fxl_c = jnp.einsum("rj,jnt->rnt", Fx_j, S_bl)
        # warm-only quirk gate (see cvar_ipm_solve): dh0_floor None = always
        # (legacy), else a scalar or per-lane (Z,) bool — floor iff True
        d0 = dh_bl[:, 0, :]
        d0f = jnp.sign(d0) * jnp.maximum(0.1, jnp.abs(d0))
        if dh0_floor is not None:
            fl = jnp.asarray(dh0_floor)
            d0f = jnp.where(fl[None, :] if fl.ndim == 1 else fl, d0f, d0)
        dh_bl = dh_bl.at[:, 0, :].set(d0f)
    else:
        QxC_c = jnp.broadcast_to(Qm[:, :, None], (n, n, Z))
        Fxl_c = jnp.broadcast_to(Fx_j[:, :, None], (nFx, n, Z))
    FxFx_c = Fxl_c[:, :, None, :] * Fxl_c[:, None, :, :]
    b1 = jnp.concatenate(
        [h0_bl[:, None, :],
         jnp.broadcast_to(bx_row, (totalu, nFx, Z))], axis=1)
    cx = -2.0 * jnp.einsum("ij,jt->it", Qm, xRef_bl)            # (n, Z)
    cc = jnp.sum(xRef_bl * jnp.einsum("ij,jt->it", Qm, xRef_bl),
                 axis=0, keepdims=True)                         # (1, Z)

    consts = dict(A_st=A_st, B_st=B_st, dh=dh_bl, b1=b1, pa=pa, cx=cx, cc=cc,
                  QxC=QxC_c, Fxl=Fxl_c, FxFx=FxFx_c)
    shared = dict(
        Fu=jnp.asarray(Fu, dtype),
        bu=jnp.asarray(bu, dtype).reshape(1, -1),
        Rm=jnp.asarray(R, dtype),
        mask=jnp.asarray(mask_np, dtype), maskT=jnp.asarray(mask_np.T, dtype),
        frisk=jnp.asarray(frisk_np, dtype),
        friskT=jnp.asarray(frisk_np.T, dtype),
        Ssgn=jnp.asarray(Ssgn_np, dtype), SsgnT=jnp.asarray(Ssgn_np.T, dtype),
    )

    # ---- initial point (mirrors cvar_ipm_solve) ---------------------------
    levels = build_levels(plan)

    def cx_gather(x_f):
        parts = []
        for mt in levels:
            xb = _xblk(x_f, mt)
            parts.append(xb[:, :mt.l].reshape((mt.nb * mt.l,) + x_f.shape[1:]))
        return jnp.concatenate(parts, axis=0)

    x_i, u_i = x_lin_bl, u_lin_bl
    s_i = (jnp.zeros((totalu, Nc, Z), dtype) if s_warm_bl is None
           else jnp.asarray(s_warm_bl, dtype))
    r_i = (jnp.zeros((nrisk, Z), dtype) if r_warm_bl is None
           else jnp.asarray(r_warm_bl, dtype))
    xc0 = cx_gather(x_i)
    rows1 = jnp.concatenate(
        [-jnp.sum(dh_bl * xc0, axis=1, keepdims=True),
         jnp.einsum("rnt,jnt->jrt", Fxl_c, xc0)], axis=1) - s_i
    mu0 = 10.0
    sl1 = jnp.maximum(b1 - rows1, cfg.sl_min)
    lam1 = mu0 / sl1
    rows2 = jnp.einsum("rn,jnt->jrt", shared["Fu"], u_i)
    sl2 = jnp.maximum(shared["bu"][:, :, None] - rows2, cfg.sl_min)
    lam2 = mu0 / sl2
    sl3 = jnp.maximum(s_i, cfg.sl_min)
    lam3 = mu0 / sl3
    sl4 = jnp.ones((nsgn, Z), dtype)
    lam4 = mu0 * jnp.ones((nsgn, Z), dtype)
    # raw cone values at the start → per-cone scales
    sc0 = (jnp.einsum("jnt,nmt,jmt->jt", xc0, QxC_c, xc0)
           + jnp.sum(xc0 * cx[None, :, :], axis=1) + cc
           + jnp.einsum("jnt,nm,jmt->jt", u_i, shared["Rm"], u_i))
    q_raw0 = jnp.einsum("kj,jt->kt", shared["mask"], sc0)       # (K, Z)
    csc = jnp.maximum(jnp.abs(q_raw0), 1.0)
    sq = jnp.maximum(-q_raw0 / csc, 1.0)
    lq = mu0 / sq
    consts["csc"] = csc

    const_args = [consts[k] for k in CV_CONST_ORDER]
    shared_args = [shared[k] for k in
                   ["Fu", "bu", "Rm", "mask", "maskT",
                    "frisk", "friskT", "Ssgn", "SsgnT"]]
    dims = dict(n=n, d=d, m=m, Nc=Nc, nFx=nFx, nFu=nFu, K=K, bdim=bdim,
                nrisk=nrisk, nsgn=nsgn, Qslack1=Qslack1, mtot=mtot)
    iterate = make_cvar_iteration(cplan, cfg, dims)

    if use_pallas:
        step_fn = _make_pallas_cvar_iteration(
            cplan, cfg, dims, totalx, totalu, dtype, tile_b, interpret)
    else:
        def step_fn(*args):
            return iterate(*args)

    carry0 = (x_i, u_i, s_i, r_i, sl1, lam1, sl2, lam2, sl3, lam3,
              sl4, lam4, sq, lq)

    def scan_body(state, itv):
        (carry, best) = state
        itv2 = jnp.full((1, 1), itv, dtype)
        out = step_fn(*const_args, *shared_args, itv2, *carry)
        new_carry = out[:CV_CARRY_FIELDS]
        gap = out[CV_CARRY_FIELDS].reshape(-1)
        (bx_, bu_, bs_, br_, bgap) = best
        better = gap < bgap
        best_new = (
            jnp.where(better, carry[0], bx_), jnp.where(better, carry[1], bu_),
            jnp.where(better, carry[2], bs_), jnp.where(better, carry[3], br_),
            jnp.where(better, gap, bgap),
        )
        return (new_carry, best_new), gap

    best0 = (x_i, u_i, s_i, r_i, jnp.full((Z,), np.inf, dtype))
    (carry_f, best_f), gaps = jax.lax.scan(
        scan_body, (carry0, best0), jnp.arange(cfg.iters, dtype=dtype))
    gap_last = gaps[-1]
    bx_, bu_, bs_, br_, bgap = best_f
    use_last = gap_last <= bgap
    x_f = jnp.where(use_last, carry_f[0], bx_)
    u_f = jnp.where(use_last, carry_f[1], bu_)
    s_f = jnp.where(use_last, carry_f[2], bs_)
    r_f = jnp.where(use_last, carry_f[3], br_)
    J = (jnp.einsum("dt,de,et->t", u_f[0], jnp.asarray(R, dtype), u_f[0])
         + r_f[0] + Qslack1 * jnp.sum(s_f[0], axis=0))
    aux = {"J": J, "gap": jnp.where(use_last, gap_last, bgap), "gaps": gaps}
    return x_f, u_f, s_f, r_f, aux


# ---------------------------------------------------------------------------
# Pallas wrapper
# ---------------------------------------------------------------------------


def _make_pallas_cvar_iteration(cplan, cfg, dims, totalx, totalu, dtype,
                                tile_b, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    iterate = make_cvar_iteration(cplan, cfg, dims)
    n, d, Nc, nFu = dims["n"], dims["d"], dims["Nc"], dims["nFu"]
    nFx, K, bdim = dims["nFx"], dims["K"], dims["bdim"]
    nrisk, nsgn = dims["nrisk"], dims["nsgn"]

    tiled_const = {
        "A_st": (totalu, n, n), "B_st": (totalu, n, d), "dh": (totalu, n),
        "b1": (totalu, Nc), "pa": (bdim, dims["m"]), "csc": (K,), "cx": (n,),
        "cc": (1,), "QxC": (n, n), "Fxl": (nFx, n), "FxFx": (nFx, n, n),
    }
    shared_shapes = [
        ("Fu", (nFu, d)), ("bu", (1, nFu)),
        ("Rm", (d, d)), ("mask", (K, totalu)),
        ("maskT", (totalu, K)), ("frisk", (K, nrisk)),
        ("friskT", (nrisk, K)), ("Ssgn", (nsgn, nrisk)),
        ("SsgnT", (nrisk, nsgn)), ("itv", (1, 1)),
    ]
    carry_shapes = [
        (totalx, n), (totalu, d), (totalu, Nc), (nrisk,),
        (totalu, Nc), (totalu, Nc), (totalu, nFu), (totalu, nFu),
        (totalu, Nc), (totalu, Nc), (nsgn,), (nsgn,), (K,), (K,),
    ]
    n_const = len(CV_CONST_ORDER)
    n_shared = len(shared_shapes)

    def kernel(*refs):
        vals = [r[...] for r in refs[:n_const + n_shared + CV_CARRY_FIELDS]]
        outs = iterate(*vals)
        for r, v in zip(refs[n_const + n_shared + CV_CARRY_FIELDS:], outs):
            r[...] = v

    def step_fn(*args):
        Z = args[0].shape[-1]
        # Mosaic rejects degenerate batch tiles (T=1 hits an unsupported
        # (a,b)->(a,b,1,1) shape cast); any T<128 also just wastes vector
        # lanes. Pad small batches up to the lane width with edge replication
        # (lane-parallel kernel: padded lanes cannot affect real ones) and
        # slice the outputs back below.
        Z_in = Z
        pad_to = min(tile_b, 128)
        if Z < pad_to:
            def _pad(a):
                pw = [(0, 0)] * (a.ndim - 1) + [(0, pad_to - Z)]
                return jnp.pad(a, pw, mode="edge")
            args = (tuple(_pad(a) for a in args[:n_const])
                    + tuple(args[n_const:n_const + n_shared])
                    + tuple(_pad(a) for a in args[n_const + n_shared:]))
            Z = pad_to
        if Z % tile_b == 0 and Z >= tile_b:
            grid, tb = (Z // tile_b,), tile_b
        else:
            grid, tb = (1,), Z
        in_specs = []
        for name in CV_CONST_ORDER:
            base = tiled_const[name]
            idx = (lambda nd_: (lambda i: (np.int32(0),) * nd_ + (i,)))(len(base))
            in_specs.append(pl.BlockSpec(base + (tb,), idx,
                                         memory_space=pltpu.VMEM))
        for _name, shp in shared_shapes:
            in_specs.append(pl.BlockSpec(
                shp, (lambda nd_: (lambda i: (np.int32(0),) * nd_))(len(shp)),
                memory_space=pltpu.VMEM))
        out_specs, out_shapes = [], []
        for shp in carry_shapes:
            idx = (lambda nd_: (lambda i: (np.int32(0),) * nd_ + (i,)))(len(shp))
            in_specs.append(pl.BlockSpec(shp + (tb,), idx,
                                         memory_space=pltpu.VMEM))
            out_specs.append(pl.BlockSpec(shp + (tb,), idx,
                                          memory_space=pltpu.VMEM))
            out_shapes.append(jax.ShapeDtypeStruct(shp + (Z,), dtype))
        out_specs.append(pl.BlockSpec((1, tb), lambda i: (np.int32(0), i),
                                      memory_space=pltpu.VMEM))
        out_shapes.append(jax.ShapeDtypeStruct((1, Z), dtype))
        try:
            cparams = pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024)
        except TypeError:
            cparams = pltpu.TPUCompilerParams(vmem_limit_bytes=110 * 1024 * 1024)
        outs = pl.pallas_call(kernel, grid=grid, in_specs=in_specs,
                              out_specs=tuple(out_specs),
                              out_shape=tuple(out_shapes),
                              compiler_params=cparams,
                              interpret=interpret)(*args)
        if Z_in != Z:
            outs = tuple(o[..., :Z_in] for o in outs)
        return outs

    return step_fn
