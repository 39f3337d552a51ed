"""Dense SOCP solver (oracle backend) — SCS-style operator splitting.

Solves      min qᵀv
            s.t. G v = g                     (zero cone)
                 F v + s = b,  s ∈ K         (K = R₊^l × SOC(q₁) × SOC(q₂) × …)

standing in for the reference's ECOS call (``ecos_solve_socp``,
``MPC_branch.py:2125-2152``; same (q, F, b, dims, G, g) interface). Plain ADMM
with a single cached normal-equations factorization, cone-uniform Ruiz row
equilibration, and over-relaxation; run to high accuracy in float64 — a parity
fixture, not a performance path.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional

import numpy as np
import scipy.linalg


@dataclass
class SOCPSolution:
    v: np.ndarray
    s: np.ndarray
    y: np.ndarray
    iterations: int
    status: str
    prim_res: float
    dual_res: float


def _proj_soc(x):
    """Projection onto the second-order cone {(t, u): ‖u‖ ≤ t}."""
    t = x[0]
    u = x[1:]
    nu = np.linalg.norm(u)
    if nu <= t:
        return x
    if nu <= -t:
        return np.zeros_like(x)
    a = 0.5 * (1.0 + t / nu)
    out = np.empty_like(x)
    out[0] = a * nu
    out[1:] = a * u
    return out


def solve_socp(
    q: np.ndarray,
    F: np.ndarray,
    b: np.ndarray,
    dims: Dict,
    G: Optional[np.ndarray] = None,
    g: Optional[np.ndarray] = None,
    rho: float = 1.0,
    alpha: float = 1.7,
    max_iter: int = 40000,
    tol: float = 1e-9,
    reg: float = 1e-9,
    plateau_checks: int = 40,
    plateau_rtol: float = 5e-4,
) -> SOCPSolution:
    q = np.asarray(q, np.float64).ravel()
    F = np.asarray(F, np.float64)
    b = np.asarray(b, np.float64).ravel()
    nl = int(dims.get("l", 0))
    socs: List[int] = list(dims.get("q", []))
    me = 0 if G is None else G.shape[0]
    if G is None:
        A = F
        rhs_b = b
    else:
        A = np.vstack([np.asarray(G, np.float64), F])
        rhs_b = np.concatenate([np.asarray(g, np.float64).ravel(), b])
    m, nv = A.shape

    # cone segment bookkeeping over the stacked rows: [zero(me), pos(nl), socs...]
    seg = []
    off = me + nl
    for qd in socs:
        seg.append((off, off + qd))
        off += qd
    assert off == m, (off, m)

    # cone-uniform Ruiz row scaling + column scaling (3 passes)
    Dr = np.ones(m)
    Dc = np.ones(nv)
    As = A.copy()
    for _ in range(3):
        rn = np.linalg.norm(As, axis=1)
        rn[rn == 0] = 1.0
        # uniform within each SOC block
        for lo, hi in seg:
            rn[lo:hi] = np.exp(np.mean(np.log(rn[lo:hi] + 1e-300)))
        rs = 1.0 / np.sqrt(rn)
        As = As * rs[:, None]
        Dr = Dr * rs
        cn = np.linalg.norm(As, axis=0)
        cn[cn == 0] = 1.0
        cs = 1.0 / np.sqrt(cn)
        As = As * cs[None, :]
        Dc = Dc * cs
    bs = rhs_b * Dr
    qs = q * Dc

    M = As.T @ As + reg * np.eye(nv)
    cho = scipy.linalg.cho_factor(M)

    def proj_K(x):
        out = x.copy()
        out[:me] = 0.0
        out[me:me + nl] = np.maximum(out[me:me + nl], 0.0)
        for lo, hi in seg:
            out[lo:hi] = _proj_soc(out[lo:hi])
        return out

    v = np.zeros(nv)
    s = proj_K(bs.copy())
    y = np.zeros(m)

    status = "max_iter"
    it = 0
    pr = dr = np.inf
    s_prev = s
    # Plateau early-exit: residuals are sampled every 100 iterations; if the
    # best combined residual fails to improve by a relative `plateau_rtol`
    # over `plateau_checks` consecutive samples (default: 4000 iterations at
    # <0.05% per-sample improvement), exit with status="stalled" and let the
    # caller's tier logic classify the final iterate. Motivated by the
    # overtake reference-scale gate, where a jammed program burned the full
    # 120k budget (~8 min host-CPU/step on this box) before being tiered
    # 'failed' anyway (evidence/gate_overtake_2026-08-22.log, t=25/t=28) —
    # hard jams pin with ~zero improvement, so the threshold can be this
    # strict and still exit them in seconds. rtol was originally 5e-3, which
    # cut SLOWLY-CONVERGING fallbacks near their floor: a merge-gate step's
    # fallback exited at pr/dr~1e-5 where the full budget reached far lower,
    # and the κ-amplified u0 was 3.7e-3 off on a tier-'tight' step (merge
    # gate rerun 2026-08-22 t=27). Callers must also treat 'stalled' as at
    # most loose — see reference_cvar._quality.
    best_res = np.inf
    since_best = 0
    for it in range(1, max_iter + 1):
        rhs = -qs / rho + As.T @ (bs - s - y / rho)
        v = scipy.linalg.cho_solve(cho, rhs)
        Av = As @ v
        Av_rel = alpha * Av + (1 - alpha) * (bs - s)
        s_prev = s
        s = proj_K(bs - Av_rel - y / rho)
        y = y + rho * (Av_rel + s - bs)
        if it % 100 == 0 or it == max_iter:
            # residuals in the ORIGINAL (unscaled) problem
            pr_vec = (Av + s - bs) / Dr
            pr = np.linalg.norm(pr_vec, np.inf)
            dual_vec = (qs + As.T @ y) / Dc
            dr = np.linalg.norm(dual_vec, np.inf)
            if pr < tol * (1 + np.linalg.norm(rhs_b, np.inf)) and dr < tol * (
                1 + np.linalg.norm(q, np.inf)
            ):
                status = "optimal"
                break
            comb = max(pr, dr)
            if comb < best_res * (1.0 - plateau_rtol):
                best_res = comb
                since_best = 0
            else:
                since_best += 1
                if plateau_checks and since_best >= plateau_checks:
                    status = "stalled"
                    break

    return SOCPSolution(
        v=v * Dc, s=s / Dr, y=y * Dr, iterations=it, status=status,
        prim_res=float(pr), dual_res=float(dr),
    )
