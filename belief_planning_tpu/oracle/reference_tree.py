"""NumPy transcription of the reference branch-MPC controllers (parity oracle).

Re-implements — operation for operation, in float64 NumPy — the tree construction,
warm-start update, and dense QP assembly of the reference controllers
(``BranchMPCProx`` ``MPC_branch.py:82-487``, the live ``BranchMPC``
``MPC_branch.py:881-1274``), then solves with the dense IPM in ``oracle.qp``
(equivalent to OSQP ``polish=True`` which returns the exact optimum).

Observed reference quirks are reproduced deliberately (each is noted inline):
- the vector ``dR`` broadcast into the first input block of ``Hu`` and the scalar
  ``-2·OldInput@dR`` broadcast into ``qu[0:d]`` (``MPC_branch.py:311-312``);
- OSQP consumes only the upper triangle of P, so the asymmetric ``Hu`` is
  symmetrized as ``triu(H) + triu(H,1)ᵀ`` before solving;
- the leaf branch's last input block is *assigned* ``w·R`` after the rate-coupling
  loop already accumulated into it (``MPC_branch.py:303`` vs ``:284``);
- in the 'branch' variant the terminal node has no xRef attraction (its linear
  cost row is left at zero, cf. ``MPC_branch.py:1095`` which only writes node l−1).

The elementary math (linearization, rollouts, probabilities, safety) is delegated
to the separately unit-tested JAX model evaluated in float64 on CPU, via
:class:`OracleModelAdapter`.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np
import scipy.linalg as sla

from belief_planning_tpu.oracle.qp import solve_qp


class OracleModelAdapter:
    """numpy-in/numpy-out adapter around a :class:`PredictiveModel` + policy params.

    Mirrors the reference model API (``highway_branch_dyn.py:284-325``).
    """

    def __init__(self, model, policy_params):
        self.model = model
        self.policy_params = policy_params
        self.n = model.n
        self.d = model.d
        self.N = model.N
        self.m = model.m
        self.dt = model.dt

    def dyn_linearization(self, x, u):
        A, B, C, xp = self.model.linearize(np.asarray(x, np.float64), np.asarray(u, np.float64))
        return np.asarray(A), np.asarray(B), np.asarray(C), np.asarray(xp)

    def branch_eval(self, x, z):
        p, dp = self.model.branch_eval(
            np.asarray(x, np.float64), np.asarray(z, np.float64), self.policy_params
        )
        return np.asarray(p), np.asarray(dp)

    def zpred_eval(self, z):
        zp = np.asarray(self.model.zpred(np.asarray(z, np.float64), self.policy_params))
        # reference layout: (N, m·n)
        return np.concatenate([zp[i] for i in range(self.m)], axis=1)

    def col_eval(self, x, z):
        h, dh = self.model.col_eval(np.asarray(x, np.float64), np.asarray(z, np.float64))
        return np.asarray(h), np.asarray(dh)


class _Branch:
    __slots__ = ("xtraj", "ztraj", "utraj", "dynmatr", "w", "children", "depth", "p", "dp", "J")

    def __init__(self, xtraj, ztraj, utraj, w, depth):
        self.xtraj = xtraj
        self.ztraj = ztraj
        self.utraj = utraj
        self.dynmatr = [None] * xtraj.shape[0]
        self.w = w
        self.children: List[_Branch] = []
        self.depth = depth
        self.p = None
        self.dp = None
        self.J = 0.0


class OracleBranchController:
    """Oracle of ``BranchMPCProx`` (variant='prox', dQ=3Q with rate coupling,
    ``MPC_branch.py:82``) and the live ``BranchMPC`` (variant='branch', dQ=0.5Q,
    no rate coupling, ``MPC_branch.py:881``)."""

    def __init__(self, params, model: OracleModelAdapter, variant: str = "prox"):
        assert variant in ("prox", "branch")
        self.variant = variant
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
        self.slacks = params.slacks
        self.model = model
        self.m = model.m

        self.BT: Optional[_Branch] = None
        self.ndx: Dict[_Branch, int] = {}
        self.ndu: Dict[_Branch, int] = {}
        self.totalx = 0
        self.totalu = 0
        self.slackweight = None
        self.OldInput = np.zeros(self.d)
        self.uLin = None
        self.xLin = None
        self.xPred = None
        self.uPred = None
        self.feasible = 0

    # -- tree ---------------------------------------------------------------

    def inittree(self, x, z):
        # reference MPC_branch.py:129-183
        u = np.zeros(self.d)
        self.BT = _Branch(np.reshape(x, (1, self.n)), np.reshape(z, (1, self.n)),
                          np.reshape(u, (1, self.d)), 1.0, 0)
        q = [self.BT]
        countx = 0
        countu = 0
        self.uLin = np.reshape(u, (1, self.d))
        self.xLin = np.reshape(x, (1, self.n))
        self.ndx = {}
        self.ndu = {}
        self.ndx[self.BT] = countx
        self.ndu[self.BT] = countu
        A, B, C, xp = self.model.dyn_linearization(x, u)
        self.BT.dynmatr[0] = (A, B, C)
        countx += 1
        countu += 1
        while q:
            cur = q.pop(0)
            if cur.depth < self.NB:
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
        self.slackweight = np.zeros(self.totalx * (self.Fx.shape[0] + 1))

    def updatetree(self, x, z):
        # reference MPC_branch.py:225-263 (prox re-linearizes the root, :237-239)
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

    # -- assembly -----------------------------------------------------------

    def buildEqConstr(self):
        # reference MPC_branch.py:185-223
        n, d = self.n, self.d
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
        self.L = L
        self.E = E
        if self.slacks:
            self.G = np.hstack((Gx, Gu, np.zeros((Gx.shape[0], self.slackweight.shape[0]))))
        else:
            self.G = np.hstack((Gx, Gu))

    def buildCost(self):
        # reference MPC_branch.py:265-325 ('prox') / :1064-1112 ('branch')
        n, d = self.n, self.d
        listQ = [None] * self.totalx
        Hu = np.zeros((self.totalu * d, self.totalu * d))
        dRmat = np.diag(self.dR)
        qx = np.zeros(self.totalx * n)
        dQ = self.Q * (3.0 if self.variant == "prox" else 0.5)
        prox = self.variant == "prox"
        for br in self.ndx:
            ndx = self.ndx[br]
            ndu = self.ndu[br]
            l = br.utraj.shape[0]
            for i in range(l - 1):
                listQ[ndx + i] = (dQ + self.Q) * br.w
                qx[(ndx + i) * n:(ndx + i + 1) * n] = -2 * br.w * (
                    self.xRef @ self.Q + br.xtraj[i] @ dQ
                )
                if prox:
                    Hu[(ndu + i) * d:(ndu + i + 1) * d, (ndu + i) * d:(ndu + i + 1) * d] += br.w * self.R
                    Hu[(ndu + i) * d:(ndu + i + 1) * d, (ndu + i) * d:(ndu + i + 1) * d] += br.w * dRmat
                    Hu[(ndu + i) * d:(ndu + i + 1) * d, (ndu + i + 1) * d:(ndu + i + 2) * d] -= br.w * dRmat
                    Hu[(ndu + i + 1) * d:(ndu + i + 2) * d, (ndu + i) * d:(ndu + i + 1) * d] -= br.w * dRmat
                    Hu[(ndu + i + 1) * d:(ndu + i + 2) * d, (ndu + i + 1) * d:(ndu + i + 2) * d] += br.w * dRmat
                else:
                    Hu[(ndu + i) * d:(ndu + i + 1) * d, (ndu + i) * d:(ndu + i + 1) * d] = br.w * self.R
            if br.depth < self.NB:
                if prox:
                    Hu[(ndu + l - 1) * d:(ndu + l) * d, (ndu + l - 1) * d:(ndu + l) * d] += br.w * (self.R + dRmat)
                else:
                    Hu[(ndu + l - 1) * d:(ndu + l) * d, (ndu + l - 1) * d:(ndu + l) * d] = br.w * self.R
                listQ[ndx + l - 1] = (dQ + self.Q) * br.w
                childJ = np.array([c.J for c in br.children])
                if prox:
                    for j, ch in enumerate(br.children):
                        ndu_c = self.ndu[ch]
                        Hu[(ndu + l - 1) * d:(ndu + l) * d, ndu_c * d:(ndu_c + 1) * d] -= ch.w * dRmat
                        Hu[ndu_c * d:(ndu_c + 1) * d, (ndu + l - 1) * d:(ndu + l) * d] -= ch.w * dRmat
                        Hu[ndu_c * d:(ndu_c + 1) * d, ndu_c * d:(ndu_c + 1) * d] += ch.w * dRmat
                qx[(ndx + l - 1) * n:(ndx + l) * n] = br.w * (
                    -2 * self.xRef @ self.Q - 2 * br.xtraj[-1] @ dQ + childJ @ br.dp
                )
            else:
                # leaf: assignment (not +=) — overwrites accumulated dR (quirk)
                Hu[(ndu + l - 1) * d:(ndu + l) * d, (ndu + l - 1) * d:(ndu + l) * d] = br.w * self.R
                listQ[ndx + l - 1] = (dQ + self.Q) * br.w
                listQ[ndx + l] = self.Qf * br.w
                if prox:
                    qx[(ndx + l - 1) * n:(ndx + l) * n] = -2 * br.w * (
                        self.xRef @ self.Q + br.xtraj[l - 1] @ dQ
                    )
                    qx[(ndx + l) * n:(ndx + l + 1) * n] = -2 * br.w * (self.xRef @ self.Qf)
                else:
                    # MPC_branch.py:1095 uses Qf for the xRef term at node l−1 and
                    # leaves the terminal node's linear cost at zero.
                    qx[(ndx + l - 1) * n:(ndx + l) * n] = -2 * br.w * (
                        self.xRef @ self.Qf + br.xtraj[-1] @ dQ
                    )
        Hx = sla.block_diag(*listQ)
        qu = np.zeros(self.totalu * d)
        qu[0:d] = -2 * self.OldInput @ self.dR   # scalar broadcast quirk
        if prox:
            Hu[0:d, 0:d] += self.dR              # vector broadcast quirk (asymmetric)
        qcat = np.append(qx, qu)
        if self.slacks:
            quadSlack = self.Qslack[0] * np.eye(self.slackweight.shape[0])
            linSlack = self.Qslack[1] * self.slackweight
            self.H = sla.block_diag(Hx, Hu, quadSlack)
            self.q = np.append(qcat, linSlack)
        else:
            self.H = sla.block_diag(Hx, Hu)
            self.q = qcat
        self.H = 2 * self.H

    def buildIneqConstr(self):
        # reference MPC_branch.py:327-370
        n, d = self.n, self.d
        Nc = self.Fx.shape[0] + 1
        slackweight_x = np.zeros(self.totalx * Nc)
        Fxtot = np.zeros((Nc * self.totalx, self.totalx * n))
        bxtot = np.zeros(Nc * self.totalx)
        for br in self.ndx:
            l = br.utraj.shape[0]
            for i in range(l):
                h, dh = self.model.col_eval(br.xtraj[i], br.ztraj[i])
                idx = self.ndx[br] + i
                Fxtot[idx * Nc:(idx + 1) * Nc, idx * n:(idx + 1) * n] = np.vstack((-dh, self.Fx))
                bxtot[idx * Nc:(idx + 1) * Nc] = np.append(h, self.bx)
                slackweight_x[idx * Nc:(idx + 1) * Nc] = br.w
        self.slackweight = slackweight_x
        Futot = sla.block_diag(*([self.Fu] * self.totalu))
        butot = np.tile(self.bu, self.totalu)
        F_hard = sla.block_diag(Fxtot, Futot)
        if self.slacks:
            nc_x = Fxtot.shape[0]
            addSlack = np.zeros((F_hard.shape[0], nc_x))
            addSlack[0:nc_x, 0:nc_x] = -np.eye(nc_x)
            Positivity = np.hstack((np.zeros((nc_x, F_hard.shape[1])), -np.eye(nc_x)))
            self.F = np.vstack((np.hstack((F_hard, addSlack)), Positivity))
            self.b = np.hstack((bxtot, butot, np.zeros(nc_x)))
        else:
            self.F = F_hard
            self.b = np.hstack((bxtot, butot))

    def updateIneqConstr(self):
        # reference MPC_branch.py:371-381
        n = self.n
        Nc = self.Fx.shape[0] + 1
        for br in self.ndx:
            l = br.utraj.shape[0]
            for i in range(l):
                h, dh = self.model.col_eval(br.xtraj[i], br.ztraj[i])
                idx = self.ndx[br] + i
                self.F[idx * Nc, idx * n:(idx + 1) * n] = -dh
                self.b[idx * Nc] = h
                self.slackweight[idx * Nc:(idx + 1) * Nc] = br.w

    # -- solve --------------------------------------------------------------

    def solve(self, x, z, xRef=None):
        x = np.asarray(x, np.float64)
        z = np.asarray(z, np.float64)
        if xRef is not None:
            self.xRef = np.asarray(xRef, np.float64)
        if self.BT is None:
            self.inittree(x, z)
            self.buildIneqConstr()
        else:
            self.updatetree(x, z)
            self.updateIneqConstr()
        self.buildCost()
        self.buildEqConstr()

        # OSQP consumes triu(P) only — symmetrize the (possibly asymmetric) H the
        # way OSQP effectively does.
        P = np.triu(self.H) + np.triu(self.H, 1).T
        beq = self.E @ x + self.L
        sol = solve_qp(P, self.q, A=self.F, b=self.b, G=self.G, g=beq)
        self.feasible = 1 if sol.status == "optimal" else 0
        self.solution = sol
        if self.feasible:
            n, d = self.n, self.d
            self.xPred = sol.z[: self.totalx * n].reshape(-1, n)
            self.uPred = sol.z[self.totalx * n: self.totalx * n + self.totalu * d].reshape(-1, d)
            self.xLin = self.xPred
            self.uLin = np.vstack((self.uPred, self.uPred[-1]))
        self.OldInput = self.uPred[0, :].copy()
        return self.uPred[0].copy()

    # -- introspection (for parity tests) ----------------------------------

    def branches_bfs(self) -> List[_Branch]:
        out = []
        q = [self.BT]
        while q:
            cur = q.pop(0)
            out.append(cur)
            q.extend(cur.children)
        return out
