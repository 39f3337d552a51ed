"""Dense primal-dual interior-point QP solver (oracle backend).

Solves     min ½ zᵀP z + qᵀ z
           s.t.  A z ≤ b,   G z = g

with a Mehrotra predictor-corrector method. This stands in for the reference's
OSQP backend (``MPC_branch.py:461-487``): OSQP is run with ``polish=True`` there,
which refines the ADMM iterate to the exact optimum, so a high-accuracy IPM is the
correct oracle for parity.

P must be PSD (may be singular — a small static regularization keeps the KKT
factorizable). Pure NumPy/SciPy, float64.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np
import scipy.linalg


@dataclass
class QPSolution:
    z: np.ndarray
    y_eq: Optional[np.ndarray]
    lam: Optional[np.ndarray]
    s: Optional[np.ndarray]
    iterations: int
    status: str           # "optimal" | "max_iter"
    gap: float


def solve_qp(
    P: np.ndarray,
    q: np.ndarray,
    A: Optional[np.ndarray] = None,
    b: Optional[np.ndarray] = None,
    G: Optional[np.ndarray] = None,
    g: Optional[np.ndarray] = None,
    tol: float = 1e-9,
    max_iter: int = 60,
    reg: float = 1e-10,
) -> QPSolution:
    P = np.asarray(P, dtype=np.float64)
    q = np.asarray(q, dtype=np.float64).ravel()
    nz = q.shape[0]
    has_ineq = A is not None and A.shape[0] > 0
    has_eq = G is not None and G.shape[0] > 0
    A = np.asarray(A, dtype=np.float64) if has_ineq else np.zeros((0, nz))
    b = np.asarray(b, dtype=np.float64).ravel() if has_ineq else np.zeros(0)
    G = np.asarray(G, dtype=np.float64) if has_eq else np.zeros((0, nz))
    g = np.asarray(g, dtype=np.float64).ravel() if has_eq else np.zeros(0)
    mi = A.shape[0]
    me = G.shape[0]

    if mi == 0:
        # equality-constrained QP: single KKT solve
        K = np.zeros((nz + me, nz + me))
        K[:nz, :nz] = P + reg * np.eye(nz)
        K[:nz, nz:] = G.T
        K[nz:, :nz] = G
        K[nz:, nz:] = -reg * np.eye(me)
        rhs = np.concatenate([-q, g])
        sol = scipy.linalg.solve(K, rhs, assume_a="sym")
        z = sol[:nz]
        y = sol[nz:]
        return QPSolution(z, y, np.zeros(0), np.zeros(0), 1, "optimal", 0.0)

    # -- initialization ----------------------------------------------------
    z = np.zeros(nz)
    y = np.zeros(me)
    s = np.ones(mi)
    lam = np.ones(mi)

    def kkt_factor(Wdiag):
        """Factor [[P+AᵀWA+reg, Gᵀ],[G, -reg]]."""
        K = np.zeros((nz + me, nz + me))
        K[:nz, :nz] = P + (A.T * Wdiag) @ A
        K[:nz, :nz] += reg * np.eye(nz)
        K[:nz, nz:] = G.T
        K[nz:, :nz] = G
        K[nz:, nz:] = -reg * np.eye(me)
        lu, piv = scipy.linalg.lu_factor(K)
        return lu, piv

    status = "max_iter"
    gap = np.inf
    it = 0
    for it in range(1, max_iter + 1):
        r_dual = P @ z + q + G.T @ y + A.T @ lam
        r_eq = G @ z - g
        r_ineq = A @ z + s - b
        gap = float(np.dot(s, lam) / mi)

        if (
            np.linalg.norm(r_dual, np.inf) < tol * (1 + np.linalg.norm(q, np.inf))
            and (me == 0 or np.linalg.norm(r_eq, np.inf) < tol * (1 + np.linalg.norm(g, np.inf)))
            and np.linalg.norm(r_ineq, np.inf) < tol * (1 + np.linalg.norm(b, np.inf))
            and gap < tol
        ):
            status = "optimal"
            break

        W = lam / s
        lu, piv = kkt_factor(W)

        def solve_dir(rd, re, ri, rc):
            # eliminate (ds, dlam):  ds = −ri − A dz,  dlam = (−rc − λ·ds)/s
            # ⇒ dual row becomes (P + Aᵀ(λ/s)A) dz + Gᵀ dy = −rd − Aᵀ((−rc + λ·ri)/s)
            rhs_z = -rd - A.T @ ((-rc + lam * ri) / s)
            rhs = np.concatenate([rhs_z, -re])
            sol = scipy.linalg.lu_solve((lu, piv), rhs)
            dz = sol[:nz]
            dy = sol[nz:]
            ds = -ri - A @ dz
            dlam = (-rc - lam * ds) / s
            return dz, dy, ds, dlam

        # affine (predictor) direction: rc_aff = s*lam
        dz_a, dy_a, ds_a, dlam_a = solve_dir(r_dual, r_eq, r_ineq, s * lam)

        def max_step(v, dv):
            neg = dv < 0
            if not np.any(neg):
                return 1.0
            return min(1.0, float(np.min(-v[neg] / dv[neg])))

        alpha_aff = min(max_step(s, ds_a), max_step(lam, dlam_a))
        mu = gap
        mu_aff = float(np.dot(s + alpha_aff * ds_a, lam + alpha_aff * dlam_a) / mi)
        sigma = (mu_aff / mu) ** 3 if mu > 0 else 0.0

        # corrector
        rc = s * lam + ds_a * dlam_a - sigma * mu
        dz, dy, ds, dlam = solve_dir(r_dual, r_eq, r_ineq, rc)

        alpha = 0.99 * min(max_step(s, ds), max_step(lam, dlam))
        z += alpha * dz
        y += alpha * dy
        s += alpha * ds
        lam += alpha * dlam

    return QPSolution(z, y, lam, s, it, status, gap)
