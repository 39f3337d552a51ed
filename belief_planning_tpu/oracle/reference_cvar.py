"""NumPy transcription of the reference ``BranchMPC_CVaR`` (parity oracle).

Re-implements the nested-CVaR tree SOCP assembly of ``MPC_branch.py:1598-2152``
operation for operation: risk-variable layout ``[x, u, ρ, σ, μ⁺, μ⁻, slack, J]``,
the dual-CVaR risk recursion equalities (``Arisk``, ``:1790-1800``), the per-child
second-order cones encoding the probability-weighted cost-to-go bound
(``:1940-1984``), the epigraph root cone, the state-transform ``S`` path with the
``dh[0]`` magnitude floor (``:2030``), and runtime ``bx`` override. Solved with
``oracle.socp.solve_socp`` (ECOS stand-in).

Reference quirks reproduced deliberately (gate with ``replicate_quirks=False``
for the corrected formulation):
- μ±-variable index aliasing in the cone rows: branch ``idx`` child ``i`` uses
  flat slot ``idx + i`` (``:1950-1951``) while the risk equality uses
  ``idx·m + i`` (``:1797``) — adjacent branches share μ slots;
- the linear slack cost rides inside the cones (``:1959``) rather than the
  objective.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np
import scipy.linalg as sla

from belief_planning_tpu.oracle.reference_tree import OracleModelAdapter, _Branch
from belief_planning_tpu.oracle.socp import solve_socp


class OracleCVaRController:
    def __init__(self, params, model: OracleModelAdapter, ralpha: float,
                 S=None, replicate_quirks: bool = True):
        self.N = params.N
        self.NB = params.NB
        self.Qslack = np.asarray(params.Qslack, np.float64)
        self.Q = np.asarray(params.Q, np.float64)
        self.Qf = np.asarray(params.Qf, np.float64)
        self.R = np.asarray(params.R, np.float64)
        self.dR = np.asarray(params.dR, np.float64)
        self.n = params.n
        self.d = params.d
        self.Fx = np.asarray(params.Fx, np.float64)
        self.Fu = np.asarray(params.Fu, np.float64)
        self.bx = np.asarray(params.bx, np.float64).ravel()
        self.bu = np.asarray(params.bu, np.float64).ravel()
        self.xRef = np.asarray(params.xRef, np.float64)
        self.psimax = self.bx[2]
        self.S = S
        self.ralpha = ralpha
        self.model = model
        self.m = model.m
        self.replicate_quirks = replicate_quirks

        try:
            self.Wx = np.linalg.cholesky(self.Q).T
        except np.linalg.LinAlgError:
            self.Wx = np.real(sla.sqrtm(self.Q))
        try:
            self.Wu = np.linalg.cholesky(self.R).T
        except np.linalg.LinAlgError:
            self.Wu = np.real(sla.sqrtm(self.R))

        self.BT: Optional[_Branch] = None
        self.ndx: Dict[_Branch, int] = {}
        self.ndu: Dict[_Branch, int] = {}
        self.branchidx: Dict[_Branch, int] = {}
        self.branchdim = 0
        self.totalx = 0
        self.totalu = 0
        self.slackweight = None
        self.OldInput = np.zeros(self.d)
        self.uLin = None
        self.xLin = None
        self.xPred = None
        self.uPred = None
        self.feasible = 0

    # -- tree (same construction as the QP controllers + branch numbering) --

    def inittree(self, x, z):
        u = np.zeros(self.d)
        self.BT = _Branch(np.reshape(x, (1, self.n)), np.reshape(z, (1, self.n)),
                          np.reshape(u, (1, self.d)), 1.0, 0)
        q = [self.BT]
        countx = countu = countbranch = 0
        self.uLin = np.reshape(u, (1, self.d))
        self.xLin = np.reshape(x, (1, self.n))
        self.ndx = {}
        self.ndu = {}
        self.branchidx = {}
        self.ndx[self.BT] = countx
        self.ndu[self.BT] = countu
        A, B, C, xp = self.model.dyn_linearization(x, u)
        self.BT.dynmatr[0] = (A, B, C)
        countx += 1
        countu += 1
        while q:
            cur = q.pop(0)
            if cur.depth < self.NB:
                self.branchidx[cur] = countbranch
                countbranch += 1
                zPred = self.model.zpred_eval(cur.ztraj[-1])
                p, dp = self.model.branch_eval(cur.xtraj[-1], cur.ztraj[-1])
                cur.p = p
                cur.dp = dp
                for i in range(self.m):
                    nb = _Branch(np.zeros((self.N, self.n)),
                                 zPred[:, self.n * i:self.n * (i + 1)],
                                 np.zeros((self.N, self.d)),
                                 p[i] * cur.w, cur.depth + 1)
                    A, B, C, xp = self.model.dyn_linearization(cur.xtraj[-1], cur.utraj[-1])
                    nb.xtraj[0] = xp
                    for t in range(self.N):
                        A, B, C, xp = self.model.dyn_linearization(nb.xtraj[t], nb.utraj[t])
                        nb.dynmatr[t] = (A, B, C)
                        if t < self.N - 1:
                            nb.xtraj[t + 1] = xp
                    self.ndx[nb] = countx
                    self.ndu[nb] = countu
                    self.xLin = np.vstack((self.xLin, nb.xtraj))
                    self.uLin = np.vstack((self.uLin, nb.utraj))
                    countx += nb.xtraj.shape[0] + (1 if nb.depth == self.NB else 0)
                    countu += nb.xtraj.shape[0]
                    cur.children.append(nb)
                    q.append(nb)
        self.totalx = countx
        self.totalu = countu
        self.branchdim = countbranch
        self.slackweight = np.zeros(self.totalx * (self.Fx.shape[0] + 1))

    def updatetree(self, x, z):
        for br in self.ndx:
            l = br.utraj.shape[0]
            br.utraj[0:l - 1] = self.uLin[self.ndu[br] + 1:self.ndu[br] + l]
            if br.depth < self.NB:
                idx = int(np.argmax(br.p))
                ndu = self.ndu[br.children[idx]]
                br.utraj[-1] = self.uLin[ndu]
            else:
                br.utraj[-1] = br.utraj[-2]
        self.BT.ztraj = np.reshape(z, (1, self.n))
        self.BT.xtraj = np.reshape(x, (1, self.n))
        for i in range(self.BT.xtraj.shape[0]):
            A, B, C, xp = self.model.dyn_linearization(self.BT.xtraj[i], self.BT.utraj[i])
            self.BT.dynmatr[i] = (A, B, C)
        q = [self.BT]
        while q:
            cur = q.pop(0)
            if cur.depth < self.NB:
                zPred = self.model.zpred_eval(cur.ztraj[-1])
                p, dp = self.model.branch_eval(cur.xtraj[-1], cur.ztraj[-1])
                cur.p = p
                cur.dp = dp
                for i in range(self.m):
                    ch = cur.children[i]
                    ch.w = cur.w * p[i]
                    ch.ztraj = zPred[:, i * self.n:(i + 1) * self.n]
                    A, B, C, xp = self.model.dyn_linearization(cur.xtraj[-1], cur.utraj[-1])
                    ch.xtraj[0] = xp
                    for t in range(self.N):
                        A, B, C, xp = self.model.dyn_linearization(ch.xtraj[t], ch.utraj[t])
                        ch.dynmatr[t] = (A, B, C)
                        if t < self.N - 1:
                            ch.xtraj[t + 1] = xp
                    q.append(ch)

    # -- assembly ----------------------------------------------------------

    def _nvar(self):
        offset = self.totalx * self.n + self.totalu * self.d
        nslack = self.slackweight.shape[0]
        return offset + self.branchdim * (self.m * 2 + 2) + nslack + 1

    def buildEqConstr(self):
        # MPC_branch.py:1752-1804
        n, d, m = self.n, self.d, self.m
        Gx = np.eye(self.totalx * n)
        Gu = np.zeros((self.totalx * n, self.totalu * d))
        E = np.zeros((self.totalx * n, n))
        E[0:n] = np.eye(n)
        L = np.zeros(self.totalx * n)
        for br in self.ndx:
            l = br.xtraj.shape[0]
            ndx = self.ndx[br]
            ndu = self.ndu[br]
            for t in range(1, l):
                A, B, C = br.dynmatr[t - 1]
                Gx[(ndx + t) * n:(ndx + t + 1) * n, (ndx + t - 1) * n:(ndx + t) * n] = -A
                Gu[(ndx + t) * n:(ndx + t + 1) * n, (ndu + t - 1) * d:(ndu + t) * d] = -B
                L[(ndx + t) * n:(ndx + t + 1) * n] = C
            A, B, C = br.dynmatr[-1]
            if br.depth < self.NB:
                for ch in br.children:
                    ndxc = self.ndx[ch]
                    Gx[ndxc * n:(ndxc + 1) * n, (ndx + l - 1) * n:(ndx + l) * n] = -A
                    Gu[ndxc * n:(ndxc + 1) * n, (ndu + l - 1) * d:(ndu + l) * d] = -B
                    L[ndxc * n:(ndxc + 1) * n] = C
            else:
                Gx[(ndx + l) * n:(ndx + l + 1) * n, (ndx + l - 1) * n:(ndx + l) * n] = -A
                Gu[(ndx + l) * n:(ndx + l + 1) * n, (ndu + l - 1) * d:(ndu + l) * d] = -B
                L[(ndx + l) * n:(ndx + l + 1) * n] = C

        bdim = self.branchdim
        Arisk = np.zeros((bdim, bdim * (m * 2 + 2)))
        for br in self.branchidx:
            idx = self.branchidx[br]
            Arisk[idx, idx] = 1.0
            Arisk[idx, bdim + idx] = 1.0
            Arisk[idx, bdim * (m + 2) + idx * m:bdim * (m + 2) + (idx + 1) * m] = (
                -br.p / self.ralpha
            )
        self.G = sla.block_diag(np.hstack((Gx, Gu)), Arisk)
        self.E = np.vstack((E, np.zeros((Arisk.shape[0], n))))
        self.L = np.append(L, np.zeros(Arisk.shape[0]))
        self.G = np.hstack((self.G, np.zeros((self.G.shape[0], self.slackweight.shape[0] + 1))))

    def buildIneqConstr(self):
        # MPC_branch.py:1869-1990
        n, d, m = self.n, self.d, self.m
        Nc = self.Fx.shape[0] + 1
        slackweight_x = np.zeros(self.totalx * Nc)
        bdim = self.branchdim
        nslack = slackweight_x.shape[0]
        offset = self.totalx * n + self.totalu * d
        nvar = offset + bdim * (m * 2 + 2) + nslack + 1
        Fxtot = np.zeros((Nc * self.totalx, self.totalx * n))
        bxtot = np.zeros(Nc * self.totalx)
        for br in self.ndx:
            l = br.utraj.shape[0]
            for i in range(l):
                h, dh = self.model.col_eval(br.xtraj[i], br.ztraj[i])
                idx = self.ndx[br] + i
                Fx_used = self.Fx if self.S is None else self.Fx @ self.S
                Fxtot[idx * Nc:(idx + 1) * Nc, idx * n:(idx + 1) * n] = np.vstack((-dh, Fx_used))
                bxtot[idx * Nc:(idx + 1) * Nc] = np.append(h, self.bx)
                slackweight_x[idx * Nc:(idx + 1) * Nc] = br.w
        self.slackweight = slackweight_x
        Futot = sla.block_diag(*([self.Fu] * self.totalu))
        butot = np.tile(self.bu, self.totalu)

        Frisk = np.zeros((bdim * (2 * m + 1), bdim * (m * 2 + 2)))
        Frisk[0:bdim, 0:bdim] = -np.eye(bdim)
        Frisk[bdim:, bdim * 2:bdim * (2 + 2 * m)] = -np.eye(2 * bdim * m)

        F_hard = sla.block_diag(Fxtot, Futot, Frisk)
        nc_x = Fxtot.shape[0]
        addSlack = np.zeros((F_hard.shape[0], nc_x + 1))
        addSlack[0:nc_x, 0:nc_x] = -np.eye(nc_x)
        Positivity = np.hstack(
            (np.zeros((nc_x, F_hard.shape[1])), -np.eye(nc_x), np.zeros((nc_x, 1)))
        )
        Fl = np.vstack((np.hstack((F_hard, addSlack)), Positivity))
        bl = np.hstack((bxtot, butot, np.zeros(Frisk.shape[0] + nc_x)))

        Fq = np.empty((0, nvar))
        bq = np.empty(0)
        dims = {"q": []}
        W1 = self.Wx if self.S is None else self.Wx @ self.S
        Jcons = self.xRef @ self.Q @ self.xRef
        for br in self.branchidx:
            idx = self.branchidx[br]
            for i in range(m):
                ch = br.children[i]
                nx = ch.xtraj.shape[0]
                nu = ch.utraj.shape[0]
                ndx = self.ndx[ch]
                ndu = self.ndu[ch]
                F1 = np.zeros(nvar)
                F1[offset + bdim + idx] = 1.0                       # σ_idx
                if self.replicate_quirks:
                    F1[offset + bdim * 2 + idx + i] = 1.0           # μ⁺ (aliased)
                    F1[offset + bdim * (2 + m) + idx + i] = -1.0    # μ⁻ (aliased)
                else:
                    F1[offset + bdim * 2 + idx * m + i] = 1.0
                    F1[offset + bdim * (2 + m) + idx * m + i] = -1.0
                if ch.depth < self.NB:
                    F1[offset + self.branchidx[ch]] = 1.0           # ρ_child
                F2 = np.zeros((nx * n + nu * d, nvar))
                for j in range(nx):
                    F2[j * n:(j + 1) * n, (ndx + j) * n:(ndx + j + 1) * n] = -2 * W1
                    F1[(ndx + j) * n:(ndx + j + 1) * n] = -2 * (self.xRef @ self.Q)
                    F1[offset + bdim * (m * 2 + 2) + (ndx + j) * Nc:
                       offset + bdim * (m * 2 + 2) + (ndx + j + 1) * Nc] = (
                        self.Qslack[1] * np.ones(Nc)
                    )
                for j in range(nu):
                    F2[nx * n + j * d:nx * n + (j + 1) * d,
                       self.totalx * n + (ndu + j) * d:self.totalx * n + (ndu + j + 1) * d] = -2 * self.Wu
                F3 = -F1.copy()
                Fqi = np.vstack((F1, F2, F3))
                bqi = np.hstack((1 - Jcons * nx, np.zeros(F2.shape[0]), 1 + Jcons * nx))
                Fq = np.vstack((Fq, Fqi))
                bq = np.append(bq, bqi)
                dims["q"].append(bqi.shape[0])

        # root epigraph cone: J ≥ ρ₀ + u₀ᵀRu₀ (+ slack-in-cone, MPC_branch.py:1969-1984)
        F1 = np.zeros(nvar)
        idx = self.branchidx[self.BT]
        F1[-1] = -1.0
        F1[offset + idx] = 1.0
        F1[offset + bdim * (m * 2 + 2):offset + bdim * (m * 2 + 2) + Nc] = (
            self.Qslack[1] * np.ones(Nc)
        )
        F2 = np.zeros((d, nvar))
        uidx = self.totalx * n + self.ndu[self.BT] * d
        F2[:, uidx:uidx + d] = -2 * self.Wu
        F3 = -F1.copy()
        Fq = np.vstack((Fq, np.vstack((F1, F2, F3))))
        bq = np.append(bq, np.hstack((1.0, np.zeros(d), 1.0)))
        dims["q"].append(2 + d)

        dims["l"] = Fl.shape[0]
        self.F = np.vstack((Fl, Fq))
        self.b = np.append(bl, bq)
        self.dims = dims

    def updateIneqConstr(self):
        # MPC_branch.py:1993-2036
        n, m = self.n, self.m
        Nc = self.Fx.shape[0] + 1
        W1 = self.Wx if self.S is None else self.Wx @ self.S
        Jcons = self.xRef @ self.Q @ self.xRef
        counter = self.dims["l"]
        for br in self.branchidx:
            for i in range(m):
                ch = br.children[i]
                nx = ch.xtraj.shape[0]
                nu = ch.utraj.shape[0]
                ndx = self.ndx[ch]
                for j in range(nx):
                    self.F[counter + 1 + j * n:counter + 1 + (j + 1) * n,
                           (ndx + j) * n:(ndx + j + 1) * n] = -2 * W1
                    self.F[counter, (ndx + j) * n:(ndx + j + 1) * n] = -2 * (self.xRef @ self.Q)
                    self.F[counter + 1 + nx * n + nu * self.d,
                           (ndx + j) * n:(ndx + j + 1) * n] = 2 * (self.xRef @ self.Q)
                counter = counter + 2 + nx * n + nu * self.d
        # knife-edge diagnostic: the dh[0] magnitude floor flips the whole
        # collision row by 0.2 when dh[0] crosses zero, so a step whose raw
        # min |dh[0]| is within rounding distance of 0 solves a DIFFERENT
        # program than a re-linearization that lands on the other side —
        # even teacher-forced from the same warm start (PARITY.md
        # bifurcation section). Recorded per update for gate forensics.
        self.min_abs_dh0 = np.inf
        for br in self.ndx:
            l = br.utraj.shape[0]
            for i in range(l):
                h, dh = self.model.col_eval(br.xtraj[i], br.ztraj[i])
                idx = self.ndx[br] + i
                if self.S is None:
                    self.F[idx * Nc, idx * n:(idx + 1) * n] = -dh
                    self.b[idx * Nc] = h
                else:
                    dh = dh.copy()
                    self.min_abs_dh0 = min(self.min_abs_dh0, abs(dh[0]))
                    dh[0] = np.sign(dh[0]) * max(0.1, abs(dh[0]))   # MPC_branch.py:2030
                    self.F[idx * Nc:(idx + 1) * Nc, idx * n:(idx + 1) * n] = np.vstack(
                        (-dh, self.Fx @ self.S)
                    )
                    self.b[idx * Nc:(idx + 1) * Nc] = np.append(h, self.bx)
                self.slackweight[idx * Nc:(idx + 1) * Nc] = br.w

    # -- solve --------------------------------------------------------------

    @staticmethod
    def _quality(sol):
        """Convergence tier of a solver exit — ECOS-semantics graded
        (``MPC_branch.py:2141`` accepts exitFlag>=0, which spans ECOS_OPTIMAL
        through ECOS_INACC):

        - ``"tight"``: optimal, or a max_iter iterate whose gap AND
          residuals are at solver precision — u0 trustworthy to ~1e-6
          (knife-edge warm exits, merge-gate probe 2026-08-21);
        - ``"loose"``: near-converged (residuals < 3e-2) — usable, but u0
          carries ~1e-3-1e-2 uncertainty, so parity gates must not hold the
          engine to 1e-3 against it (the ECOS_INACC analog);
        - ``"failed"``: anything worse (a max_iter iterate with tiny s·λ but
          O(1) residuals must never silently gate parity tests)."""
        gap = getattr(sol, "gap", None)
        pr = float(getattr(sol, "prim_res", np.inf))
        dr = float(getattr(sol, "dual_res", np.inf))
        if sol.status != "stalled" and (sol.status == "optimal" or (
                (gap is None or float(gap) < 1e-5) and pr < 1e-5 and dr < 1e-5)):
            return "tight"
        # A 'stalled' exit (cone-ADMM plateau, oracle/socp.py) is never
        # 'tight' regardless of residuals: the stall marks a program where
        # the ADMM hit its floor, and residual→solution amplification there
        # produced a measured 3.7e-3 u0 error at pr/dr<1e-5 (merge-gate
        # rerun 2026-08-22 t=27) — 'tight' must mean u0 trustworthy to ~1e-6.
        if (gap is None or float(gap) < 1e-4) and pr < 3e-2 and dr < 3e-2:
            return "loose"
        return "failed"

    @classmethod
    def _accept(cls, sol):
        return cls._quality(sol) != "failed"

    def solve(self, x, z, xRef=None, S=None, Fx=None, bx=None, method="qcqp",
              **solver_kw):
        x = np.asarray(x, np.float64)
        z = np.asarray(z, np.float64)
        if xRef is not None:
            self.xRef = np.asarray(xRef, np.float64)
        self.S = S
        if Fx is not None:
            self.Fx = np.asarray(Fx, np.float64)
        if bx is not None:
            self.bx = np.asarray(bx, np.float64).ravel()
        if self.BT is None:
            self.inittree(x, z)
            self.buildIneqConstr()
        else:
            self.updatetree(x, z)
            self.updateIneqConstr()
        self.buildEqConstr()
        qv = np.zeros(self.F.shape[1])
        qv[-1] = 1.0
        geq = self.E @ x + self.L
        if method == "qcqp":
            # every reference cone is a convex quadratic — solve with the IPM
            from belief_planning_tpu.oracle.qcqp import solve_qcqp, soc_rows_to_quad

            nl = self.dims["l"]
            quads = []
            off = nl
            for qd in self.dims["q"]:
                quads.append(
                    soc_rows_to_quad(
                        self.F[off], self.F[off + 1:off + qd - 1], self.b[off]
                    )
                )
                off += qd
            sol = solve_qcqp(None, qv, self.F[:nl], self.b[:nl], self.G, geq,
                             quads, **solver_kw)
            sol.v = sol.v  # interface alignment
        else:
            sol = solve_socp(qv, self.F, self.b, self.dims, self.G, geq, **solver_kw)
        # Mehrotra-jam fallback (measured on the overtake reference-scale
        # gate, 2026-08-21): on ~10% of maneuver-window steps the dense QCQP
        # IPM drives complementarity to ~1e-8 while the primal residual pins
        # at O(1) (fraction-to-boundary blocks every step — the same jam
        # mechanism documented for the engine in cvar_ipm.py). The SCS-style
        # cone-ADMM (oracle/socp.py) has no step-length mechanism to jam, so
        # failed steps fall back to it; ECOS (a non-Mehrotra IPM with
        # centrality safeguards) would not exhibit the jam in the first place.
        if method == "qcqp" and self._quality(sol) != "tight":
            sol2 = solve_socp(qv, self.F, self.b, self.dims, self.G, geq,
                              tol=solver_kw.get("tol", 1e-9),
                              max_iter=120000)
            rank = {"tight": 2, "loose": 1, "failed": 0}
            q1, q2 = rank[self._quality(sol)], rank[self._quality(sol2)]
            res = lambda s: max(float(getattr(s, "prim_res", np.inf)),
                                float(getattr(s, "dual_res", np.inf)))
            if q2 > q1 or (q2 == q1 and res(sol2) < res(sol)):
                sol = sol2
        self.solution = sol
        self.quality = self._quality(sol)
        # ECOS semantics (MPC_branch.py:2141): exitFlag >= 0 counts as
        # feasible, which includes "close to optimal" (ECOS_INACC, flag 10)
        # — a max_iter exit whose final iterate is near-converged. Mirror
        # that: accept the final iterate when the duality gap is small even
        # if the strict optimal test (residuals + gap < tol) didn't fire,
        # instead of silently keeping the PREVIOUS uPred.
        # A non-optimal exit is accepted only when BOTH the complementarity
        # gap (absent on the SOCP path — SOCPSolution stores residuals only)
        # AND the primal/dual residuals of the final iterate are small, so a
        # max_iter iterate with tiny s·λ but a large residual can't silently
        # gate downstream parity tests. Residual bound 1e-4 (normalized):
        # warm-started solves at the measured Mehrotra knife edge can exit
        # max_iter at gap ~1e-6 with residuals ~1e-5 while their u0 is within
        # ~1e-6 of the converged optimum (merge-gate probe 2026-08-21); 1e-4
        # still rejects genuinely-unconverged iterates by 10x margin vs the
        # 1e-3 closed-loop gate.
        close = self._accept(sol)
        self.feasible = 1 if close else 0
        if self.feasible:
            n, d = self.n, self.d
            self.xPred = sol.v[: self.totalx * n].reshape(-1, n)
            self.uPred = sol.v[self.totalx * n: self.totalx * n + self.totalu * d].reshape(-1, d)
            self.xLin = self.xPred
            self.uLin = np.vstack((self.uPred, self.uPred[-1]))
        if self.uPred is None:
            # Infeasible on the very first solve: there is no prior plan to
            # fall back on (the reference env's infeasible-step backup reuses
            # the previous uPred, Highway_env_branch.py:155-160). Raise a
            # diagnosable error instead of a TypeError on None.
            raise RuntimeError(
                "oracle CVaR solve failed on the first step (tier="
                f"{self.quality}, status={sol.status}, pr="
                f"{float(getattr(sol, 'prim_res', np.nan)):.3g}, dr="
                f"{float(getattr(sol, 'dual_res', np.nan)):.3g}); no prior "
                "uPred to fall back on")
        self.OldInput = self.uPred[0, :].copy()
        return self.uPred[0].copy()

    def branches_bfs(self):
        out = []
        q = [self.BT]
        while q:
            cur = q.pop(0)
            out.append(cur)
            q.extend(cur.children)
        return out
