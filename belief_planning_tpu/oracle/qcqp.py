"""Dense convex-QCQP interior-point solver (oracle backend for the CVaR SOCP).

Solves      min ½vᵀP₀v + q₀ᵀv
            s.t.  G v = g
                  A v ≤ b                          (linear rows)
                  ½vᵀH_k v + c_kᵀv + d_k ≤ 0       (convex quadratic rows)

Every second-order cone in the reference CVaR program (``MPC_branch.py:
1940-1984``) has the form (1−a, F₂v, 1+a) with a = F₁v + const, equivalent to the
convex quadratic ¼‖F₂v‖² + a ≤ 0 — so the SOCP is exactly a QCQP and a
primal-dual IPM with the Lagrangian Hessian gives ECOS-grade accuracy without
NT-scaled cone machinery. Pure NumPy/SciPy float64; parity fixture only.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import numpy as np
import scipy.linalg


@dataclass
class QCQPSolution:
    v: np.ndarray
    y: np.ndarray
    lam_lin: np.ndarray
    lam_q: np.ndarray
    iterations: int
    status: str
    gap: float
    # final-iterate residuals (inf-norm, normalized like the convergence
    # test) so callers can judge a ``max_iter`` exit on more than the
    # complementarity gap alone
    prim_res: float = np.inf
    dual_res: float = np.inf


def solve_qcqp(
    P0: Optional[np.ndarray],
    q0: np.ndarray,
    A: Optional[np.ndarray],
    b: Optional[np.ndarray],
    G: Optional[np.ndarray],
    g: Optional[np.ndarray],
    quads: Sequence[Tuple[np.ndarray, np.ndarray, float]] = (),
    tol: float = 1e-9,
    max_iter: int = 100,
    reg: float = 1e-10,
) -> QCQPSolution:
    q0 = np.asarray(q0, np.float64).ravel()
    nv = q0.shape[0]
    P0 = np.zeros((nv, nv)) if P0 is None else np.asarray(P0, np.float64)
    has_lin = A is not None and A.shape[0] > 0
    A = np.asarray(A, np.float64) if has_lin else np.zeros((0, nv))
    b = np.asarray(b, np.float64).ravel() if has_lin else np.zeros(0)
    has_eq = G is not None and G.shape[0] > 0
    G = np.asarray(G, np.float64) if has_eq else np.zeros((0, nv))
    g = np.asarray(g, np.float64).ravel() if has_eq else np.zeros(0)
    mi = A.shape[0]
    me = G.shape[0]
    K = len(quads)
    Hs = [np.asarray(H, np.float64) for H, c, d in quads]
    cs = [np.asarray(c, np.float64).ravel() for H, c, d in quads]
    ds = [float(d) for H, c, d in quads]

    def qval(v):
        return np.array([0.5 * v @ Hs[k] @ v + cs[k] @ v + ds[k] for k in range(K)])

    def qgrad(v):
        return np.stack([Hs[k] @ v + cs[k] for k in range(K)]) if K else np.zeros((0, nv))

    v = np.zeros(nv)
    y = np.zeros(me)
    s_lin = np.maximum(b - A @ v, 1.0)
    lam_lin = np.ones(mi)
    s_q = np.maximum(-qval(v), 1.0) if K else np.zeros(0)
    lam_q = np.ones(K)

    mtot = mi + K
    status = "max_iter"
    gap = np.inf
    it = 0
    for it in range(1, max_iter + 1):
        Gq = qgrad(v)                     # (K, nv)
        r_dual = P0 @ v + q0 + G.T @ y + A.T @ lam_lin + (Gq.T @ lam_q if K else 0.0)
        r_eq = G @ v - g
        r_lin = A @ v + s_lin - b
        r_q = qval(v) + s_q if K else np.zeros(0)
        gap = float((np.dot(s_lin, lam_lin) + np.dot(s_q, lam_q)) / max(mtot, 1))

        if (
            np.linalg.norm(r_dual, np.inf) < tol * (1 + np.linalg.norm(q0, np.inf))
            and (me == 0 or np.linalg.norm(r_eq, np.inf) < tol * (1 + np.linalg.norm(g, np.inf) + 1))
            and (mi == 0 or np.linalg.norm(r_lin, np.inf) < tol * (1 + np.linalg.norm(b, np.inf)))
            and (K == 0 or np.linalg.norm(r_q, np.inf) < tol * 10)
            and gap < tol
        ):
            status = "optimal"
            break

        # Lagrangian Hessian + eliminated dual curvature
        P = P0 + reg * np.eye(nv)
        for k in range(K):
            P = P + lam_q[k] * Hs[k]
        W_lin = lam_lin / s_lin
        if mi:
            P = P + (A.T * W_lin) @ A
        if K:
            P = P + (Gq.T * (lam_q / s_q)) @ Gq
        Kmat = np.zeros((nv + me, nv + me))
        Kmat[:nv, :nv] = P
        Kmat[:nv, nv:] = G.T
        Kmat[nv:, :nv] = G
        Kmat[nv:, nv:] = -reg * np.eye(me)
        lu, piv = scipy.linalg.lu_factor(Kmat)

        def solve_dir(rc_lin, rc_q):
            rhs_z = -r_dual
            if mi:
                rhs_z = rhs_z - A.T @ ((-rc_lin + lam_lin * r_lin) / s_lin)
            if K:
                rhs_z = rhs_z - Gq.T @ ((-rc_q + lam_q * r_q) / s_q)
            sol = scipy.linalg.lu_solve((lu, piv), np.concatenate([rhs_z, -r_eq]))
            dv = sol[:nv]
            dy = sol[nv:]
            ds_lin = -r_lin - A @ dv
            dlam_lin = (-rc_lin - lam_lin * ds_lin) / s_lin if mi else np.zeros(0)
            ds_q = -r_q - Gq @ dv if K else np.zeros(0)
            dlam_q = (-rc_q - lam_q * ds_q) / s_q if K else np.zeros(0)
            return dv, dy, ds_lin, dlam_lin, ds_q, dlam_q

        # predictor
        dv_a, dy_a, dsl_a, dll_a, dsq_a, dlq_a = solve_dir(s_lin * lam_lin, s_q * lam_q)

        def max_step(vv, dvv):
            neg = dvv < 0
            if not np.any(neg):
                return 1.0
            return min(1.0, float(np.min(-vv[neg] / dvv[neg])))

        alpha_aff = min(
            max_step(s_lin, dsl_a), max_step(lam_lin, dll_a),
            max_step(s_q, dsq_a) if K else 1.0, max_step(lam_q, dlq_a) if K else 1.0,
        )
        mu = gap
        mu_aff = (
            np.dot(s_lin + alpha_aff * dsl_a, lam_lin + alpha_aff * dll_a)
            + (np.dot(s_q + alpha_aff * dsq_a, lam_q + alpha_aff * dlq_a) if K else 0.0)
        ) / max(mtot, 1)
        sigma = (mu_aff / mu) ** 3 if mu > 0 else 0.0

        # corrector
        rc_lin = s_lin * lam_lin + dsl_a * dll_a - sigma * mu
        rc_q = s_q * lam_q + dsq_a * dlq_a - sigma * mu if K else np.zeros(0)
        dv, dy, dsl, dll, dsq, dlq = solve_dir(rc_lin, rc_q)

        alpha = 0.99 * min(
            max_step(s_lin, dsl), max_step(lam_lin, dll),
            max_step(s_q, dsq) if K else 1.0, max_step(lam_q, dlq) if K else 1.0,
        )
        v += alpha * dv
        y += alpha * dy
        s_lin += alpha * dsl
        lam_lin += alpha * dll
        if K:
            s_q += alpha * dsq
            lam_q += alpha * dlq

    # recompute residuals at the returned iterate (the in-loop values are
    # stale by one step on a max_iter exit)
    Gq = qgrad(v)
    r_dual = P0 @ v + q0 + G.T @ y + A.T @ lam_lin + (Gq.T @ lam_q if K else 0.0)
    prim = max(
        np.linalg.norm(G @ v - g, np.inf) / (1 + np.linalg.norm(g, np.inf) + 1) if me else 0.0,
        np.linalg.norm(np.maximum(A @ v - b, 0.0), np.inf) / (1 + np.linalg.norm(b, np.inf)) if mi else 0.0,
        np.linalg.norm(np.maximum(qval(v), 0.0), np.inf) / 10.0 if K else 0.0,
    )
    dual = np.linalg.norm(r_dual, np.inf) / (1 + np.linalg.norm(q0, np.inf))
    gap = float((np.dot(s_lin, lam_lin) + np.dot(s_q, lam_q)) / max(mtot, 1))
    return QCQPSolution(v, y, lam_lin, lam_q, it, status, gap,
                        prim_res=float(prim), dual_res=float(dual))


def soc_rows_to_quad(F1: np.ndarray, F2: np.ndarray, b1: float):
    """Convert a reference-style cone (b1 − F1·v, −F2·v, b3 + F1·v) with
    b1 = 1 − const, b3 = 1 + const into the quadratic
    ¼‖F2 v‖² + F1·v + const ≤ 0, returned as (H, c, d) for :func:`solve_qcqp`."""
    const = 1.0 - b1
    H = 0.5 * (F2.T @ F2)
    return H, F1.copy(), const
