"""TPU-native nested-CVaR tree SOCP solver.

Replaces the reference's dense ECOS path (``BranchMPC_CVaR``,
``MPC_branch.py:1598-2152``) with a structure-exploiting cone ADMM whose v-update
rides the same tree-Riccati factorization as the QP solver:

- The per-child cost-to-go cones (``:1940-1984``) are decomposed with per-stage
  epigraph scalars: shifting ``t_j ← t'_j + c_xᵀx_j + const`` turns each into a
  *stage-local* rotated second-order cone ‖(2W₁x_j, 2W_u u_j, 1−t'_j)‖ ≤ 1+t'_j,
  so the ADMM penalty stays block-diagonal per stage and the Riccati sweep is
  unchanged. The per-cone aggregation rows Σ_j t_j + (risk terms) ≤ 0 and the
  epigraph root row J ≥ … are the only non-local rows — a handful of rank-one
  couplings handled exactly by a Woodbury correction with columns precomputed
  from the factorized tree (affine-free linear-response passes).
- The dual-CVaR risk recursion (``Arisk``, ``:1790-1800``), sign rows (``Frisk``)
  and the slack-inside-cone cost (``:1959``) are preserved; the reference's
  μ-slot aliasing quirk (``:1950``) is reproduced via slot maps
  (``replicate_quirks``) or corrected.

Single-tree functions; batch with ``jax.vmap``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from belief_planning_tpu.solvers.tree_qp import (
    Factors,
    StageCost,
    StagePlan,
    _f32_precision,
    build_stage_plan,
    tree_lqr_factor,
    tree_lqr_forward,
    tree_lqr_linear,
)
from belief_planning_tpu.tree.engine import TreeState
from belief_planning_tpu.tree.topology import TreeTopology


# ---------------------------------------------------------------------------
# Static plan
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class CVaRPlan:
    plan: StagePlan
    bdim: int                      # number of non-leaf branches (= risk branches)
    nrisk: int                     # ρ,σ,μ⁺,μ⁻ count (no J)
    slotP: np.ndarray              # (bdim, m) flat μ⁺ slot per (branch, child)
    slotM: np.ndarray              # (bdim, m) flat μ⁻ slot
    child_of: np.ndarray           # (bdim, m) child branch id
    child_nonleaf: np.ndarray      # (bdim, m) bool
    # sum rows: bdim·m child rows (the root epigraph row is eliminated into the
    # objective: min J s.t. J ≥ e(v) ⟺ min e(v) since J appears nowhere else)
    n_sum_rows: int


def build_cvar_plan(topo: TreeTopology, replicate_quirks: bool = True) -> CVaRPlan:
    plan = build_stage_plan(topo)
    bdim = int(np.sum(~np.asarray(topo.is_leaf)))
    m = topo.m
    slotP = np.zeros((bdim, m), dtype=np.int64)
    slotM = np.zeros((bdim, m), dtype=np.int64)
    for idx in range(bdim):
        for i in range(m):
            slot = idx + i if replicate_quirks else idx * m + i
            slotP[idx, i] = slot
            slotM[idx, i] = slot
    child_of = np.asarray(topo.children[:bdim], dtype=np.int64)
    child_nonleaf = ~np.asarray(topo.is_leaf)[child_of]
    return CVaRPlan(
        plan=plan,
        bdim=bdim,
        nrisk=bdim * (2 + 2 * m),
        slotP=slotP,
        slotM=slotM,
        child_of=child_of,
        child_nonleaf=child_nonleaf,
        n_sum_rows=bdim * m,
    )


@dataclass(frozen=True)
class CVaRConfig:
    rho1: float = 5.0      # state rows [−dh; Fx·S]x − s ≤ [h0; bx]
    rho2: float = 5.0      # input rows Fu u ≤ bu
    rho3: float = 5.0      # slack positivity
    rho4: float = 1.0      # per-stage rotated cones
    rho5: float = 1.0      # per-cone aggregation rows (Woodbury)
    rho_eq: float = 10.0   # risk recursion equalities
    rho_sign: float = 5.0  # ρ, μ± sign rows
    sigma: float = 1e-6
    alpha: float = 1.6
    iters: int = 400


class CVaRState(NamedTuple):
    x: Any
    u: Any
    s: Any
    t: Any       # shifted epigraph t'
    risk: Any    # (nrisk,) [ρ; σ; μ⁺; μ⁻]
    z1: Any
    y1: Any
    z2: Any
    y2: Any
    z3: Any
    y3: Any
    z4: Any      # (totalu, 2+n+d) cone copies
    y4: Any
    z5: Any      # (n_sum_rows,)
    y5: Any
    zeq: Any     # (bdim,)
    yeq: Any
    zs: Any      # (bdim + 2·bdim·m,) sign rows for [ρ; μ⁺; μ⁻]
    ys: Any


def _psd_sqrt(Q):
    w, V = jnp.linalg.eigh(Q)
    return (V * jnp.sqrt(jnp.maximum(w, 0.0))[None, :]) @ V.T


def _proj_soc_batch(v):
    """Projection onto SOC for (batch, k) vectors with v[:,0] the cone scalar."""
    t = v[:, 0]
    u = v[:, 1:]
    nu = jnp.linalg.norm(u, axis=1)
    inside = nu <= t
    below = nu <= -t
    a = 0.5 * (1.0 + t / jnp.maximum(nu, 1e-30))
    proj_t = a * nu
    proj_u = a[:, None] * u
    out_t = jnp.where(inside, t, jnp.where(below, 0.0, proj_t))
    out_u = jnp.where(inside[:, None], u, jnp.where(below[:, None], 0.0, proj_u))
    return jnp.concatenate([out_t[:, None], out_u], axis=1)


@_f32_precision
def cvar_solve(
    cplan: CVaRPlan,
    ts: TreeState,
    Q, R, Qslack, xRef, ralpha,
    Fx, bx, Fu, bu,
    x0,
    S=None,
    cfg: CVaRConfig = CVaRConfig(),
    dh0_floor=None,
):
    """Solve the nested-CVaR tree SOCP for one tree.

    Returns (x_nodes, u, J, aux dict). The reference applies no dR terms in the
    CVaR program (``Wdu`` is computed but unused), so the Riccati runs without
    rate-coupling edges.
    """
    plan = cplan.plan
    topo = plan.topo
    n, d, m = topo.n, topo.d, topo.m
    totalu, totalx = topo.totalu, topo.totalx
    bdim = cplan.bdim
    nrisk = cplan.nrisk
    dtype = ts.x_lin.dtype

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

    Wx = _psd_sqrt(Q)
    Wu = _psd_sqrt(R)
    if S is not None:
        S = jnp.asarray(S, dtype)
        W1 = Wx @ S
        Fx_used = Fx @ S
    else:
        W1 = Wx
        Fx_used = Fx
    cx = -2.0 * (Q @ xRef)                      # linear x term inside each cone
    cconst = xRef @ Q @ xRef                    # per-node constant inside cones
    # epigraph scaling: per-node costs are O(cconst) while the cone's unit rows
    # are O(1); substituting t' = tscale·t̂ balances the cone components (without
    # it the SOC projection is catastrophically ill-conditioned and ADMM crawls)
    tscale = cconst + 1.0
    tsqrt = jnp.sqrt(tscale)

    # state rows (with the dh[0] magnitude floor when S is given,
    # MPC_branch.py:2030 — warm re-solves only in the reference; dh0_floor
    # None = always apply (legacy), bool = apply iff True)
    dh = ts.dh
    if S is not None:
        d0 = dh[:, 0]
        d0f = jnp.sign(d0) * jnp.maximum(0.1, jnp.abs(d0))
        if dh0_floor is not None:
            d0f = jnp.where(jnp.asarray(dh0_floor), d0f, d0)
        dh = dh.at[:, 0].set(d0f)
    Fxc = jnp.concatenate(
        [-dh[:, None, :], jnp.broadcast_to(Fx_used, (totalu, nFx, n))], axis=1
    )
    b1 = jnp.concatenate(
        [ts.h0[:, None], jnp.broadcast_to(bx, (totalu, nFx))], axis=1
    )

    sigma = cfg.sigma
    rho1, rho2, rho3 = cfg.rho1, cfg.rho2, cfg.rho3
    rho4, rho5 = cfg.rho4, cfg.rho5
    rho_eq, rho_sign = cfg.rho_eq, cfg.rho_sign
    kappa = sigma + rho1 + rho3                 # slack has no direct cost here

    # --- tree factorization (quadratics fixed for the whole solve) ---------
    coef = rho1 - rho1 * rho1 / kappa
    Qx2_eff = coef * jnp.einsum("bri,brj->bij", Fxc, Fxc)
    Qx2_eff = Qx2_eff + (4.0 * rho4 / tscale) * (W1.T @ W1)[None]
    Qx2_eff = Qx2_eff + sigma * jnp.eye(n, dtype=dtype)[None]
    Ru2_eff = jnp.broadcast_to(
        rho2 * (Fu.T @ Fu) + (4.0 * rho4 / tscale) * (Wu.T @ Wu)
        + sigma * jnp.eye(d, dtype=dtype),
        (totalu, d, d),
    )
    Pterm2 = jnp.broadcast_to(
        sigma * jnp.eye(n, dtype=dtype), (len(plan.leaf_ids), n, n)
    )
    zeros_u = jnp.zeros((totalu, d, d), dtype)
    cost = StageCost(
        Qx2=Qx2_eff, qx=jnp.zeros((totalu, n), dtype), Ru2=Ru2_eff,
        qu=jnp.zeros((totalu, d), dtype), Daa2=zeros_u, Dab2=zeros_u,
        Pterm2=Pterm2, qterm=jnp.zeros((len(plan.leaf_ids), n), dtype),
        slack_lin=jnp.zeros((totalu,), dtype), slack_quad=jnp.asarray(0.0, dtype),
    )
    fac = tree_lqr_factor(plan, cost, ts)

    cx_nodes = np.asarray(topo.cnode_x)
    leaf_term = plan.leaf_term_idx

    # diag quadratic of the scalar blocks
    Ht = 2.0 * rho4 + sigma                     # t'
    # risk block: sigma + sign penalties + equality rank-ones
    sgn_mask = np.zeros(nrisk)
    sgn_mask[:bdim] = 1.0                                        # ρ rows
    sgn_mask[2 * bdim:] = 1.0                                    # μ± rows
    Hrisk = jnp.diag(jnp.asarray(sigma + rho_sign * sgn_mask, dtype))
    # equality rows r_i: ρ_i + σ_i − (p_i/α)·μ⁻_{i·m + c}
    p_nonleaf = ts.p[:bdim]                                      # (bdim, m)
    Req = jnp.zeros((bdim, nrisk), dtype)
    for i in range(bdim):
        Req = Req.at[i, i].set(1.0)
        Req = Req.at[i, bdim + i].set(1.0)
        for c in range(m):
            Req = Req.at[i, 2 * bdim + bdim * m + i * m + c].set(
                -p_nonleaf[i, c] / ralpha
            )
    Hrisk = Hrisk + rho_eq * Req.T @ Req
    Hrisk_inv = jnp.linalg.inv(Hrisk)

    # --- sum rows (Woodbury columns) --------------------------------------
    # child row (idx, i): Σ_{j∈child}(t'_j + cxᵀx_j + cconst) + Qslack1·Σ s_child
    #                     + σ_idx + μ⁺ − μ⁻ + [ρ_child] ≤ 0
    # root row: t'_0 + Qslack1·Σ s_root + ρ_0 − J ≤ 0
    nrows5 = cplan.n_sum_rows
    u_off = np.asarray(topo.u_off)
    N = topo.N

    f_t = np.zeros((nrows5, totalu))
    f_s = np.zeros((nrows5, totalu, Nc))
    f_r = np.zeros((nrows5, nrisk))
    row_const = np.zeros((nrows5,))
    x_mask = np.zeros((nrows5, totalu))
    r = 0
    for idx in range(bdim):
        for i in range(m):
            c = int(cplan.child_of[idx, i])
            stages = u_off[c] + np.arange(N)
            x_mask[r, stages] = 1.0
            f_t[r, stages] = 1.0
            f_s[r, stages, :] = 1.0           # × Qslack1 at trace time
            f_r[r, bdim + idx] += 1.0         # σ_idx
            f_r[r, 2 * bdim + cplan.slotP[idx, i]] += 1.0
            f_r[r, 2 * bdim + bdim * m + cplan.slotM[idx, i]] -= 1.0
            if cplan.child_nonleaf[idx, i]:
                f_r[r, c] += 1.0              # ρ_child (branchidx == branch id)
            row_const[r] = N  # × cconst at trace time
            r += 1

    x_mask_j = jnp.asarray(x_mask, dtype)                  # (nrows5, totalu)
    f_t_j = jnp.asarray(f_t, dtype) * tscale               # t' = tscale·t̂
    f_s_j = jnp.asarray(f_s, dtype) * Qslack1
    f_r_j = jnp.asarray(f_r, dtype)
    const5 = jnp.asarray(row_const, dtype) * cconst        # (nrows5,)
    fx_j = x_mask_j[:, :, None] * cx[None, None, :]        # (nrows5, totalu, n)

    # eliminated root epigraph: objective = t'_0 + Qslack1·Σ s_root + ρ_0
    obj_t = jnp.zeros((totalu,), dtype).at[0].set(1.0) * tscale
    obj_s = jnp.zeros((totalu, Nc), dtype).at[0].set(Qslack1)
    obj_r = jnp.zeros((nrisk,), dtype).at[0].set(1.0)

    # --- H0 apply ----------------------------------------------------------

    def h0_apply(qx, qu, qterm, qs, qt, qrisk, response: bool):
        """argmin ½vᵀH0v + ⟨q, v⟩ s.t. dynamics (response=True: zero constants,
        zero x0). Returns (x, u, s, t, risk)."""
        # slack elimination: stage s-terms ½κ‖s‖² + sᵀ(qs − ρ1·Fxc x)
        #   → s*(x) = (ρ1·Fxc x − qs)/κ; induced x-linear: +(ρ1/κ)Fxcᵀqs
        qx_eff = qx + (rho1 / kappa) * jnp.einsum("brn,br->bn", Fxc, qs)
        kff = tree_lqr_linear(plan, fac, qx_eff, qu, qterm, affine=not response)
        x_nodes, u = tree_lqr_forward(
            plan, fac, kff,
            jnp.zeros_like(x0) if response else x0,
            jnp.zeros((d,), dtype),
            affine=not response,
        )
        s = (rho1 * jnp.einsum("brn,bn->br", Fxc, x_nodes[cx_nodes]) - qs) / kappa
        t = -qt / Ht
        risk = -Hrisk_inv @ qrisk
        return x_nodes, u, s, t, risk

    def dot_rows(x_nodes, u, s, t, risk):
        """Uᵀv for the sum rows: (nrows5,)."""
        xc = x_nodes[cx_nodes]                               # (totalu, n)
        out = jnp.einsum("rjn,jn->r", fx_j, xc)
        out = out + f_t_j @ t
        out = out + jnp.einsum("rjc,jc->r", f_s_j, s)
        out = out + f_r_j @ risk
        return out

    # Woodbury columns: response of H0 to linear term f_r
    def col_apply(ridx_onehot):
        qx = jnp.einsum("r,rjn->jn", ridx_onehot, fx_j)
        qu = jnp.zeros((totalu, d), dtype)
        qterm = jnp.zeros((len(plan.leaf_ids), n), dtype)
        qs = jnp.einsum("r,rjc->jc", ridx_onehot, f_s_j)
        qt = ridx_onehot @ f_t_j
        qrisk = ridx_onehot @ f_r_j
        return h0_apply(qx, qu, qterm, qs, qt, qrisk, response=True)

    eye5 = jnp.eye(nrows5, dtype=dtype)
    Zx, Zu, Zs, Zt, Zr = jax.vmap(col_apply)(eye5)           # leading dim nrows5
    # UᵀZ (nrows5, nrows5)
    UtZ = jax.vmap(lambda xx, uu, ss, tt, rr: dot_rows(xx, uu, ss, tt, rr))(
        Zx, Zu, Zs, Zt, Zr
    )
    Wmat = jnp.linalg.inv(eye5 - rho5 * UtZ)

    # --- ADMM state init ---------------------------------------------------
    x_i = ts.x_lin
    u_i = ts.u_lin
    s_i = jnp.zeros((totalu, Nc), dtype)
    t_i = jnp.zeros((totalu,), dtype)
    risk_i = jnp.zeros((nrisk,), dtype)
    cone_dim = 2 + n + d

    def cone_rows(x_nodes, u, t):
        xc = x_nodes[cx_nodes]
        r0 = 1.0 + t
        rx = (2.0 / tsqrt) * jnp.einsum("ij,bj->bi", W1, xc)
        ru = (2.0 / tsqrt) * jnp.einsum("ij,bj->bi", Wu, u)
        rl = 1.0 - t
        # root stage has no x rows in its cone (MPC_branch.py:1976-1978)
        rx = rx.at[0].set(jnp.zeros((n,), dtype))
        return jnp.concatenate([r0[:, None], rx, ru, rl[:, None]], axis=1)

    state = CVaRState(
        x=x_i, u=u_i, s=s_i, t=t_i, risk=risk_i,
        z1=jnp.minimum(jnp.einsum("brn,bn->br", Fxc, x_i[cx_nodes]), b1),
        y1=jnp.zeros((totalu, Nc), dtype),
        z2=jnp.minimum(jnp.einsum("rn,bn->br", Fu, u_i), bu[None]),
        y2=jnp.zeros((totalu, nFu), dtype),
        z3=jnp.zeros((totalu, Nc), dtype),
        y3=jnp.zeros((totalu, Nc), dtype),
        z4=_proj_soc_batch(cone_rows(x_i, u_i, t_i)),
        y4=jnp.zeros((totalu, cone_dim), dtype),
        z5=jnp.zeros((nrows5,), dtype),
        y5=jnp.zeros((nrows5,), dtype),
        zeq=jnp.zeros((bdim,), dtype),
        yeq=jnp.zeros((bdim,), dtype),
        zs=jnp.zeros((bdim + 2 * bdim * m,), dtype),
        ys=jnp.zeros((bdim + 2 * bdim * m,), dtype),
    )

    sgn_rows = jnp.asarray(
        np.concatenate([np.arange(bdim), np.arange(2 * bdim, nrisk)]), np.int64
    )  # risk indices carrying sign rows (ρ then μ±)

    a_relax = cfg.alpha

    def iteration(st: CVaRState):
        w1 = st.z1 - st.y1 / rho1
        w2 = st.z2 - st.y2 / rho2
        w3 = st.z3 - st.y3 / rho3
        w4 = st.z4 - st.y4 / rho4
        w5 = st.z5 - st.y5 / rho5
        weq = st.zeq - st.yeq / rho_eq
        ws = st.zs - st.ys / rho_sign

        # linear terms of the v-update (½-form):
        # R1: ρ1/2‖Fxc x − s − w1‖² → qx += −ρ1 Fxcᵀw1 ; qs += +ρ1 w1
        # R3: ρ3/2‖s − w3‖² → qs += −ρ3 w3
        # cones: ρ4/2‖rows(x,u,t) − w4‖²:
        #   row0 = 1+t: lin t: ρ4(1 − w4[0]) ; rowlast = 1−t: lin t: −ρ4(1 − w4[-1])
        #   x rows: −2ρ4 W1ᵀ w4_x ; u rows: −2ρ4 Wuᵀ w4_u
        qx = -rho1 * jnp.einsum("brn,br->bn", Fxc, w1)     # (totalu, n) per stage
        w4x = w4[:, 1:1 + n]
        w4x = w4x.at[0].set(jnp.zeros((n,), dtype))    # root cone has no x rows
        qx = qx - (2.0 * rho4 / tsqrt) * jnp.einsum("ij,bi->bj", W1, w4x)
        qx = qx - sigma * st.x[cx_nodes]               # σ-prox on stage nodes
        qterm = -sigma * st.x[leaf_term]
        qu = (
            -rho2 * jnp.einsum("rn,br->bn", Fu, w2)
            - (2.0 * rho4 / tsqrt) * jnp.einsum("ij,bi->bj", Wu, w4[:, 1 + n:1 + n + d])
            - sigma * st.u
        )
        qs = rho1 * w1 - rho3 * w3 - sigma * st.s
        qt = rho4 * (1.0 - w4[:, 0]) - rho4 * (1.0 - w4[:, -1]) - sigma * st.t
        qrisk = -rho_eq * Req.T @ weq - sigma * st.risk
        qrisk = qrisk.at[sgn_rows].add(-rho_sign * ws)

        # eliminated-J objective: + t'_0 + Qslack1·Σ s_root + ρ_0
        qt = qt + obj_t
        qs = qs + obj_s
        qrisk = qrisk + obj_r

        # sum rows: ρ5/2‖Uᵀv + const5 − w5‖² → external linear ρ5 U(const5 − w5)
        tau = w5 - const5
        qx = qx + rho5 * jnp.einsum("r,rjn->jn", -tau, fx_j)
        qs = qs + rho5 * jnp.einsum("r,rjc->jc", -tau, f_s_j)
        qt = qt + rho5 * ((-tau) @ f_t_j)
        qrisk = qrisk + rho5 * ((-tau) @ f_r_j)

        ax, au, as_, at, ar = h0_apply(qx, qu, qterm, qs, qt, qrisk, False)
        phi0 = dot_rows(ax, au, as_, at, ar)
        phi = Wmat @ phi0
        corr = rho5 * phi
        x_n = ax + jnp.einsum("r,rin->in", corr, Zx)
        u_n = au + jnp.einsum("r,rid->id", corr, Zu)
        s_n = as_ + jnp.einsum("r,ric->ic", corr, Zs)
        t_n = at + corr @ Zt
        r_n = ar + corr @ Zr

        # row evaluations
        y1t = jnp.einsum("brn,bn->br", Fxc, x_n[cx_nodes]) - s_n
        y2t = jnp.einsum("rn,bn->br", Fu, u_n)
        y3t = s_n
        y4t = cone_rows(x_n, u_n, t_n)
        y5t = dot_rows(x_n, u_n, s_n, t_n, r_n) + const5
        yeqt = Req @ r_n
        yst = r_n[sgn_rows]

        # relax + project + dual update
        def upd(yt, z, y, rho, proj):
            yh = a_relax * yt + (1 - a_relax) * z
            z_new = proj(yh + y / rho)
            y_new = y + rho * (yh - z_new)
            return z_new, y_new

        z1, y1 = upd(y1t, st.z1, st.y1, rho1, lambda v: jnp.minimum(v, b1))
        z2, y2 = upd(y2t, st.z2, st.y2, rho2, lambda v: jnp.minimum(v, bu[None]))
        z3, y3 = upd(y3t, st.z3, st.y3, rho3, lambda v: jnp.maximum(v, 0.0))
        z4, y4 = upd(y4t, st.z4, st.y4, rho4, _proj_soc_batch)
        z5, y5 = upd(y5t, st.z5, st.y5, rho5, lambda v: jnp.minimum(v, 0.0))
        zeq, yeq = upd(yeqt, st.zeq, st.yeq, rho_eq, lambda v: jnp.zeros_like(v))
        zs_, ys_ = upd(yst, st.zs, st.ys, rho_sign, lambda v: jnp.maximum(v, 0.0))

        return CVaRState(
            x=x_n, u=u_n, s=s_n, t=t_n, risk=r_n,
            z1=z1, y1=y1, z2=z2, y2=y2, z3=z3, y3=y3, z4=z4, y4=y4,
            z5=z5, y5=y5, zeq=zeq, yeq=yeq, zs=zs_, ys=ys_,
        ), (y1t, y2t, y5t, yeqt)

    def body(i, st):
        st, _ = iteration(st)
        return st

    state = jax.lax.fori_loop(0, cfg.iters, body, state)
    state, (y1t, y2t, y5t, yeqt) = iteration(state)

    prim = jnp.maximum(
        jnp.max(jnp.maximum(y1t - b1, 0.0)),
        jnp.maximum(
            jnp.max(jnp.maximum(y2t - bu[None], 0.0)),
            jnp.maximum(jnp.max(jnp.maximum(y5t, 0.0)), jnp.max(jnp.abs(yeqt))),
        ),
    )
    # reconstruct the eliminated epigraph value J = t'_0 + Qslack1·Σ s_root + ρ_0
    J = tscale * state.t[0] + Qslack1 * jnp.sum(state.s[0]) + state.risk[0]
    aux = {"prim_res": prim, "J": J, "risk": state.risk, "t": tscale * state.t}
    return state.x, state.u, state.s, state, aux
