"""NumPy oracle transcription of the reference HMM-belief LTV MPC
(``PredictiveControllers.py:56-340``).

Chain MPC over the belief-augmented state ``xb = (x, b)`` with belief-gated
collision rows. Reference semantics replicated exactly:

  - ``get_xLin`` runs EVERY solve (``solve:141``): the linearization
    trajectory is re-rolled from the measured augmented state through the
    model's own linearization step (``C + A·xb + B·u`` = the nonlinear step,
    since C is the linearization residual); only ``uLin`` persists between
    solves (shifted prediction, last input repeated)
  - ``computeLTVdynamics`` linearizes row i at the NEXT node
    ``(xLin[i+1], uLin[i+1])`` (``:170`` — off-by-one quirk)
  - collision rows exist for nodes 1..N−1 only; row (j, k) at node i+1 uses
    ``Jh[i+1]`` (linearized at ``xLin[i+2]``) but gates on the belief at
    ``xLin[i+1]`` (``:204-221``); the terminal state has NO Fx rows
    (``NoTerminalConstr``, ``:196``)
  - cost: Q×N + Qf terminal, R+2·diag(dR) inputs with −dR temporal
    off-diagonals and the last block reduced by diag(dR); OldInput rate term
    in the corrected diagonal form (``buildCost:279-301``)
  - ``xRef`` is padded with zeros over the belief block (``solve:136``)

The QP uses the in-repo dense Mehrotra IPM (``oracle.qp``) instead of OSQP.
Model derivatives come from the same jitted :class:`HMMPredictiveModel`
functions the controller uses (they are independently parity-tested against
the formulas); the oracle independently checks the CONTROLLER layer — row
gating, off-by-one indices, cost assembly, warm-start handling.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import scipy.linalg as sla

from belief_planning_tpu.oracle.qp import solve_qp


class OracleHMMController:
    def __init__(self, params, model, thres: float = 0.1):
        self.N = int(params.N)
        self.d = int(params.d)
        self.model = model
        self.n = int(model.n)                 # augmented dim nx + M·m
        self.nx = int(model.nx)
        self.M = int(model.M)
        self.m = int(model.m)
        self.thres = thres
        self.Q = np.asarray(params.Q, np.float64)
        self.R = np.asarray(params.R, np.float64)
        self.Qf = np.asarray(params.Qf, np.float64)
        self.dR = np.asarray(params.dR, np.float64).ravel()
        self.Qslack = np.asarray(params.Qslack, np.float64).ravel()
        self.Fx = np.asarray(params.Fx, np.float64)
        self.bx = np.asarray(params.bx, np.float64).ravel()
        self.Fu = np.asarray(params.Fu, np.float64)
        self.bu = np.asarray(params.bu, np.float64).ravel()
        self.xRef = np.zeros(self.n)
        self.uLin: Optional[np.ndarray] = None
        self.OldInput = np.zeros(self.d)
        self.feasible = 0
        self.xPred = None
        self.uPred = None

    def _ral(self, xb, xbk, u):
        """regressionAndLinearization: (A, B, C, h0 (M, m), Jh (M, m, n))."""
        import jax.numpy as jnp

        A, B, C, h0, Jh = self.model.linearize(
            jnp.asarray(xb, jnp.float64), jnp.asarray(u, jnp.float64),
            jnp.asarray(xbk, jnp.float64),
        )
        return (np.asarray(A), np.asarray(B), np.asarray(C),
                np.asarray(h0), np.asarray(Jh))

    def solve(self, x0, b0, xbackup, xRef=None):
        n, d, N = self.n, self.d, self.N
        x0 = np.asarray(x0, np.float64).ravel()
        b0 = np.asarray(b0, np.float64)
        xbackup = np.asarray(xbackup, np.float64)   # (N, M·m, nx)
        if xRef is not None:
            xRef = np.asarray(xRef, np.float64).ravel()
            if xRef.shape[0] == self.nx:
                xRef = np.append(xRef, np.zeros(self.M * self.m))
            self.xRef = xRef

        # ---- get_xLin (every solve) ----------------------------------------
        if self.uLin is None:
            self.uLin = np.zeros((N, d))
        self.uLin = np.vstack([self.uLin, self.uLin[-1]])   # (N+1, d)
        xLin = np.zeros((N + 1, n))
        xb = np.append(x0, b0.reshape(-1))
        xLin[0] = xb
        for i in range(N):
            Ai, Bi, Ci, _, _ = self._ral(xb, xbackup[i], self.uLin[i])
            xb = Ci + Ai @ xb + Bi @ self.uLin[i]
            xLin[i + 1] = xb

        # ---- computeLTVdynamics (off-by-one points) ------------------------
        A, B, C, h0l, Jhl = [], [], [], [], []
        for i in range(N):
            Ai, Bi, Ci, h0i, Jhi = self._ral(
                xLin[i + 1], xbackup[i], self.uLin[i + 1])
            A.append(Ai)
            B.append(Bi)
            C.append(Ci)
            h0l.append(h0i)
            Jhl.append(Jhi)

        # ---- inequality rows ----------------------------------------------
        nFx = self.Fx.shape[0]
        Fxtot = np.hstack([
            sla.block_diag(*([self.Fx] * N)), np.zeros((nFx * N, n))])
        bxtot = np.tile(self.bx, N)
        rows, rhs = [], []
        for i in range(N - 1):
            bmat = xLin[i + 1][self.nx:].reshape(self.M, self.m)
            for j in range(self.M):
                for k in range(self.m):
                    if bmat[j, k] > self.thres:
                        row = np.zeros(n * (N + 1))
                        row[(i + 1) * n:(i + 2) * n] = -Jhl[i + 1][j][k]
                        rows.append(row)
                        rhs.append(float(h0l[i + 1][j][k]))
        if rows:
            Fxtot = np.vstack([Fxtot, np.array(rows)])
            bxtot = np.append(bxtot, rhs)
        slackdim = Fxtot.shape[0]
        Futot = sla.block_diag(*([self.Fu] * N))
        butot = np.tile(self.bu, N)
        F_hard = sla.block_diag(Fxtot, Futot)
        addSlack = np.zeros((F_hard.shape[0], slackdim))
        addSlack[:slackdim, :slackdim] = -np.eye(slackdim)
        positivity = np.hstack([
            np.zeros((slackdim, F_hard.shape[1])), -np.eye(slackdim)])
        F = np.vstack([np.hstack([F_hard, addSlack]), positivity])
        b = np.hstack([bxtot, butot, np.zeros(slackdim)])

        # ---- equality rows -------------------------------------------------
        Gx = np.eye(n * (N + 1))
        Gu = np.zeros((n * (N + 1), d * N))
        E = np.zeros((n * (N + 1), n))
        E[:n] = np.eye(n)
        L = np.zeros(n * (N + 1))
        for i in range(N):
            Gx[n + i * n:2 * n + i * n, i * n:(i + 1) * n] = -A[i]
            Gu[n + i * n:2 * n + i * n, i * d:(i + 1) * d] = -B[i]
            L[n + i * n:2 * n + i * n] = C[i]
        G = np.hstack([Gx, Gu, np.zeros((Gx.shape[0], slackdim))])

        # ---- cost ----------------------------------------------------------
        Hx = sla.block_diag(*([self.Q] * N))
        Hu = sla.block_diag(*([self.R + 2 * np.diag(self.dR)] * N))
        for i in range(d):
            Hu[i - d, i - d] -= self.dR[i]
        offdiag = -np.tile(self.dR, N - 1)
        np.fill_diagonal(Hu[d:], offdiag)
        np.fill_diagonal(Hu[:, d:], offdiag)
        qlin = -2.0 * np.dot(
            np.append(np.tile(self.xRef, N + 1), np.zeros(d * N)),
            sla.block_diag(Hx, self.Qf, Hu),
        )
        qlin[n * (N + 1):n * (N + 1) + d] = \
            -2.0 * self.OldInput @ np.diag(self.dR)
        H = sla.block_diag(Hx, self.Qf, Hu, self.Qslack[0] * np.eye(slackdim))
        qfull = np.append(qlin, self.Qslack[1] * np.ones(slackdim))
        H = 2.0 * H

        xb0 = np.append(x0, b0.reshape(-1))
        sol = solve_qp(H, qfull, A=F, b=b, G=G, g=E @ xb0 + L, max_iter=80)
        self.feasible = 1 if sol.status == "optimal" else 0
        zsol = sol.z
        self.xPred = zsol[:n * (N + 1)].reshape(N + 1, n)
        self.uPred = zsol[n * (N + 1):n * (N + 1) + d * N].reshape(N, d)
        # only uLin persists (xLin is re-rolled next solve)
        self.uLin = np.vstack([self.uPred[1:], self.uPred[-1]])
        self.OldInput = self.uPred[0].copy()
        return self.uPred[0].copy()
