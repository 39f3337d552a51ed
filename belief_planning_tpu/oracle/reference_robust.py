"""NumPy oracle transcription of the reference ``robustMPC`` benchmark
controller (``MPC_branch.py:1275-1595``).

Single ego trajectory (``Nx = N·NB+2`` states, ``Nu = N·NB+1`` inputs) that
must avoid EVERY obstacle node of the scenario tree simultaneously: the tree
stores only obstacle trajectories, flattened into per-time-step node lists
``zPred[t]`` (``inittree``, ``MPC_branch.py:1338-1361``), and each (t, node)
pair contributes one linearized collision row.

Reference semantics replicated exactly:
  - cold start linearizes around a zero-input rollout (``get_xLin:1326``);
    warm starts shift the previous prediction by one with the last state/input
    repeated (``solve:1429-1431``)
  - cost (``buildCost:1544``): blockdiag(Q×(Nx−1), Qf) states, inputs
    R+2·diag(dR) per block with the LAST block reduced to R+diag(dR), −dR
    temporal off-diagonals, OldInput rate term −2·OldInput·diag(dR) (the
    CORRECTED diagonal form — unlike the branch controllers this path has no
    scalar-broadcast quirk); probability weights do NOT appear anywhere
  - branch probabilities are evaluated by the reference but never used (it
    calls ``branch_eval`` on an UNINITIALIZED ``np.empty`` ego trajectory,
    ``MPC_branch.py:1346``, and only stores the result) — the oracle skips the
    call entirely
  - inequality rows (``buildIneqConstr:1469``): Nx blocks of Fx, then one
    collision row per zPred node INCLUDING the t=0 row against the fixed
    initial state; slacks on all state rows with cost (2·Qslack[0], Qslack[1])

The QP is solved with the in-repo dense Mehrotra IPM (``oracle.qp``) instead
of OSQP.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import scipy.linalg as sla

from belief_planning_tpu.oracle.qp import solve_qp
from belief_planning_tpu.oracle.reference_tree import OracleModelAdapter


class _ZBranch:
    __slots__ = ("ztraj", "depth")

    def __init__(self, ztraj, depth):
        self.ztraj = ztraj
        self.depth = depth


class OracleRobustController:
    def __init__(self, params, model: OracleModelAdapter):
        self.N = int(params.N)
        self.NB = int(params.NB)
        self.n = int(params.n)
        self.d = int(params.d)
        self.m = model.m
        self.Nx = self.N * self.NB + 2
        self.Nu = self.N * self.NB + 1
        self.Q = np.asarray(params.Q, np.float64)
        self.R = np.asarray(params.R, np.float64)
        self.Qf = np.asarray(params.Qf, np.float64)
        self.dR = np.asarray(params.dR, np.float64).ravel()
        self.Qslack = np.asarray(params.Qslack, np.float64).ravel()
        self.Fx = np.asarray(params.Fx, np.float64)
        self.bx = np.asarray(params.bx, np.float64).ravel()
        self.Fu = np.asarray(params.Fu, np.float64)
        self.bu = np.asarray(params.bu, np.float64).ravel()
        self.xRef = np.asarray(params.xRef, np.float64).ravel()
        self.model = model
        self.uLin: Optional[np.ndarray] = None
        self.xLin: Optional[np.ndarray] = None
        self.initialized = False
        self.OldInput = np.zeros(self.d)
        self.feasible = 0
        self.xPred = None
        self.uPred = None

    # -- scenario tree → flat per-time obstacle node lists ------------------
    def _build_zpred(self, z) -> List[np.ndarray]:
        n, N, NB, m = self.n, self.N, self.NB, self.m
        zPred = [np.empty((0, n)) for _ in range(N * NB + 1)]
        zPred[0] = np.asarray(z, np.float64)[None]
        q = [_ZBranch(np.asarray(z, np.float64)[None], 0)]
        while q:
            cur = q.pop(0)
            if cur.depth > 0:
                for i in range(cur.ztraj.shape[0]):
                    t = (cur.depth - 1) * N + i + 1
                    zPred[t] = np.vstack((zPred[t], cur.ztraj[i]))
            if cur.depth < NB:
                zp = self.model.zpred_eval(cur.ztraj[-1])      # (N, m·n)
                for i in range(m):
                    q.append(_ZBranch(zp[:, n * i:n * (i + 1)], cur.depth + 1))
        return zPred

    def solve(self, x, z, xRef=None):
        n, d, Nx, Nu = self.n, self.d, self.Nx, self.Nu
        x = np.asarray(x, np.float64).ravel()
        if xRef is not None:
            self.xRef = np.asarray(xRef, np.float64).ravel()
        zPred = self._build_zpred(z)

        if not self.initialized:
            # cold start: zero-input rollout (get_xLin, MPC_branch.py:1326-1334)
            self.uLin = np.zeros((Nu + 1, d))
            self.xLin = np.zeros((Nx, n))
            self.xLin[0] = x
            for i in range(Nx - 1):
                _, _, _, xp = self.model.dyn_linearization(
                    self.xLin[i], self.uLin[i])
                self.xLin[i + 1] = xp

        # LTV dynamics along the linearization trajectory
        A, B, C = [], [], []
        for i in range(Nu):
            Ai, Bi, Ci, _ = self.model.dyn_linearization(
                self.xLin[i], self.uLin[i])
            A.append(Ai)
            B.append(Bi)
            C.append(Ci)

        # ---- inequality rows ------------------------------------------------
        nFx = self.Fx.shape[0]
        Fxtot = sla.block_diag(*([self.Fx] * Nx))
        bxtot = np.tile(self.bx, Nx)
        col_rows = []
        col_rhs = []
        for t in range(len(zPred)):
            for j in range(zPred[t].shape[0]):
                h, dh = self.model.col_eval(self.xLin[t], zPred[t][j])
                row = np.zeros(Nx * n)
                row[n * t:n * (t + 1)] = -np.asarray(dh).ravel()
                col_rows.append(row)
                col_rhs.append(float(h))
        Fxtot = np.vstack([Fxtot, np.array(col_rows)])
        bxtot = np.append(bxtot, col_rhs)
        slackdim = Fxtot.shape[0]
        Futot = sla.block_diag(*([self.Fu] * Nu))
        butot = np.tile(self.bu, Nu)
        F_hard = sla.block_diag(Fxtot, Futot)
        addSlack = np.zeros((F_hard.shape[0], slackdim))
        addSlack[:slackdim, :slackdim] = -np.eye(slackdim)
        positivity = np.hstack([
            np.zeros((slackdim, F_hard.shape[1])), -np.eye(slackdim)])
        F = np.vstack([np.hstack([F_hard, addSlack]), positivity])
        b = np.hstack([bxtot, butot, np.zeros(slackdim)])

        # ---- equality rows --------------------------------------------------
        Gx = np.eye(n * Nx)
        Gu = np.zeros((n * Nx, d * Nu))
        E = np.zeros((n * Nx, n))
        E[:n] = np.eye(n)
        L = np.zeros(n * Nx)
        for i in range(Nu):
            Gx[n + i * n:2 * n + i * n, i * n:(i + 1) * n] = -A[i]
            Gu[n + i * n:2 * n + i * n, i * d:(i + 1) * d] = -B[i]
            L[n + i * n:2 * n + i * n] = C[i]
        G = np.hstack([Gx, Gu, np.zeros((Gx.shape[0], slackdim))])

        # ---- cost -----------------------------------------------------------
        Hx = sla.block_diag(*([self.Q] * (Nx - 1)))
        Hu = sla.block_diag(*([self.R + 2 * np.diag(self.dR)] * Nu))
        for i in range(d):
            Hu[i - d, i - d] -= self.dR[i]
        offdiag = -np.tile(self.dR, Nu - 1)
        np.fill_diagonal(Hu[d:], offdiag)
        np.fill_diagonal(Hu[:, d:], offdiag)
        qlin = -2.0 * np.dot(
            np.append(np.tile(self.xRef, Nx), np.zeros(d * Nu)),
            sla.block_diag(Hx, self.Qf, Hu),
        )
        qlin[n * Nx:n * Nx + d] = -2.0 * self.OldInput @ np.diag(self.dR)
        H = sla.block_diag(Hx, self.Qf, Hu, self.Qslack[0] * np.eye(slackdim))
        qfull = np.append(qlin, self.Qslack[1] * np.ones(slackdim))
        H = 2.0 * H

        sol = solve_qp(H, qfull, A=F, b=b, G=G, g=E @ x + L, max_iter=80)
        self.feasible = 1 if sol.status == "optimal" else 0
        zsol = sol.z
        self.xPred = zsol[:n * Nx].reshape(Nx, n)
        self.uPred = zsol[n * Nx:n * Nx + d * Nu].reshape(Nu, d)

        # warm start for the next solve: shifted prediction, last repeated
        self.xLin = np.vstack([self.xPred[1:], self.xPred[-1]])
        self.uLin = np.vstack([self.uPred[1:], self.uPred[-1]])
        self.OldInput = self.uPred[0].copy()
        self.initialized = True
        return self.uPred[0].copy()
