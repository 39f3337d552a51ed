"""Legacy HMM-belief LTV MPC controller (rebuilt working).

Equivalent of the reference ``PredictiveControllers.MPC`` (``PredictiveControllers
.py:56-340``): a chain LTV MPC over the belief-augmented state ``xb = (x, b)``
with belief-gated collision constraints. The reference's copy is dead code (its
model import is broken); this one runs, with the reference's quirks transcribed:

- the LTV dynamics for constraint row i are linearized at the NEXT node's state
  and input (``computeLTVdynamics`` uses ``xLin[i+1], uLin[i+1]``,
  ``PredictiveControllers.py:170``);
- collision rows for node i+1 use the safety linearization ``Jh[i+1]`` (taken at
  ``xLin[i+2]``) while gating on the belief at ``xLin[i+1]`` (``:204-221``);
- gating ``b > 0.1`` is data-dependent in the reference; here all M·m rows exist
  with sub-threshold rows masked out (zero coefficients, large bound) so the
  program stays static;
- legacy ``Qf = 0`` default (``utils.py:88``) and the corrected rate-cost
  assembly (``:284-298``).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from belief_planning_tpu.controllers.branch_mpc import _cast_pytree
from belief_planning_tpu.models.hmm import HMMPredictiveModel
from belief_planning_tpu.solvers.tree_qp import (
    ADMMConfig,
    admm_solve,
    assemble_stage_cost,
    build_stage_plan,
)
from belief_planning_tpu.solvers.tree_qp_ipm import QPIPMConfig, qp_ipm_solve
from belief_planning_tpu.tree.engine import TreeState
from belief_planning_tpu.tree.topology import build_topology
from belief_planning_tpu.utils.config import MPCParams

_BIG = 1e6


class HMMCarry(NamedTuple):
    uLin: Any         # (N, d)
    old_input: Any    # (d,)


class HMMSolveResult(NamedTuple):
    xPred: Any        # (N+1, n_aug)
    uPred: Any        # (N, d)
    slack: Any
    prim_res: Any
    feasible: Any


def make_hmm_mpc_step(model: HMMPredictiveModel, params: MPCParams,
                      admm: ADMMConfig = ADMMConfig(), thres: float = 0.1,
                      feas_tol: float = 1e-3, solver: str = "ipm",
                      ipm: QPIPMConfig = QPIPMConfig()):
    n_aug = model.n
    nx, d, N = model.nx, params.d, params.N
    M, m = model.M, model.m
    topo = build_topology(N - 1, 1, 1, n_aug, d)   # chain: N+1 states, N inputs
    plan = build_stage_plan(topo)
    assert topo.totalx == N + 1 and topo.totalu == N
    Fx, bx, Fu, bu = params.Fx, params.bx, params.Fu, params.bu
    nFx = Fx.shape[0]
    Q, R, Qf, dR, Qslack = params.Q, params.R, params.Qf, params.dR, params.Qslack

    def init_carry(dtype=jnp.float32) -> HMMCarry:
        return HMMCarry(
            uLin=jnp.zeros((N, d), dtype),
            old_input=jnp.zeros((d,), dtype),
        )

    def step(carry: HMMCarry, x0, b0, xbackup, xRef):
        """xbackup: (N, M·m, nx) per-step obstacle backup states."""
        x0 = jnp.asarray(x0)
        dtype = x0.dtype
        b0 = jnp.asarray(b0, dtype)
        xbackup = jnp.asarray(xbackup, dtype)
        xRef_aug = jnp.asarray(xRef, dtype)

        uLin_ext = jnp.concatenate([carry.uLin, carry.uLin[-1:]], axis=0)
        xb0 = jnp.concatenate([x0, b0.reshape(-1)])

        # forward simulation of the augmented chain (reference get_xLin)
        def roll(carry_x, inp):
            u, xbk = inp
            xn = model.step(carry_x, u, xbk)
            return xn, xn

        _, xs = jax.lax.scan(roll, xb0, (uLin_ext[:N], xbackup))
        xLin = jnp.concatenate([xb0[None], xs], axis=0)       # (N+1, n_aug)

        # LTV at the shifted points (xLin[i+1], uLin[i+1], xbackup[i])
        lin_v = jax.vmap(model.linearize)
        A, B, C, h0s, Jhs = lin_v(xLin[1:], uLin_ext[1:N + 1], xbackup)
        # A,B,C: (N, ...) map node i → i+1 ; h0s/Jhs: (N, M, m[, n])

        ts = TreeState(
            x_lin=xLin, u_lin=uLin_ext[:N],
            z=jnp.zeros((N, n_aug), dtype),
            p=jnp.zeros((topo.n_branches, 1), dtype),
            dp=jnp.zeros((topo.n_branches, 1, n_aug), dtype),
            w=jnp.ones((topo.n_branches,), dtype),
            A=jnp.concatenate([jnp.zeros((1, n_aug, n_aug), dtype), A], axis=0),
            Bm=jnp.concatenate([jnp.zeros((1, n_aug, d), dtype), B], axis=0),
            C=jnp.concatenate([jnp.zeros((1, n_aug), dtype), C], axis=0),
            h0=jnp.zeros((N,), dtype),
            dh=jnp.zeros((N, n_aug), dtype),
        )

        # The Riccati-eliminated IPM needs a warm iterate ON the linearized-
        # dynamics manifold (x_0 = measured, x_{i+1} = A_i x_i + B_i u_i + C_i).
        # The nonlinear rollout xLin is the LINEARIZATION trajectory but — with
        # the reference's off-by-one linearization points — does not satisfy
        # those rows exactly, so re-roll the iterate through (A, B, C).
        def _lin_roll(c, inp):
            Ai, Bi, Ci, ui = inp
            nxt = Ai @ c + Bi @ ui + Ci
            return nxt, nxt

        _, xw_tail = jax.lax.scan(_lin_roll, xb0, (A, B, C, uLin_ext[:N]))
        x_warm = jnp.concatenate([xb0[None], xw_tail], axis=0)

        # belief-gated collision rows per stage t (nodes 1..N−1):
        # row (j,k) at node t uses Jh from linearization index t (at xLin[t+1]),
        # gated on the belief at xLin[t] (> thres) — reference :204-221
        Mm = M * m
        rows = jnp.zeros((N, Mm, n_aug), dtype)
        bnds = jnp.full((N, Mm), _BIG, dtype)
        # stages 1..N−1 get rows; build with a shifted gather
        Jh_flat = Jhs.reshape(N, Mm, n_aug)
        h0_flat = h0s.reshape(N, Mm)
        beliefs = xLin[:, nx:].reshape(N + 1, Mm)             # per node
        for t in range(1, N):
            gate = beliefs[t] > thres
            rows = rows.at[t].set(
                jnp.where(gate[:, None], -Jh_flat[t], 0.0)
            )
            bnds = bnds.at[t].set(jnp.where(gate, h0_flat[t], _BIG))

        Fxc = jnp.concatenate(
            [jnp.broadcast_to(jnp.asarray(Fx, dtype), (N, nFx, n_aug)), rows],
            axis=1,
        )
        b1 = jnp.concatenate(
            [jnp.broadcast_to(jnp.asarray(bx, dtype), (N, nFx)), bnds], axis=1
        )

        cost = assemble_stage_cost(
            topo, ts, Q, R, Qf, dR, Qslack, xRef_aug, carry.old_input,
            variant="robust",
        )
        if solver == "ipm":
            x_nodes, u, s, info = qp_ipm_solve(
                plan, cost, ts, Fx, bx, Fu, bu, xb0, carry.old_input,
                ipm, Fxc_override=Fxc, b1_override=b1,
                warm_primal=(x_warm, uLin_ext[:N]),
            )
        else:
            x_nodes, u, s, st, info = admm_solve(
                plan, cost, ts, Fx, bx, Fu, bu, xb0, carry.old_input,
                admm, Fxc_override=Fxc, b1_override=b1,
            )
        new_carry = HMMCarry(
            uLin=jnp.concatenate([u[1:], u[-1:]], axis=0),
            old_input=u[0],
        )
        res = HMMSolveResult(
            xPred=x_nodes, uPred=u, slack=s,
            prim_res=info["prim_res"],
            feasible=info["prim_res"] < feas_tol,
        )
        return new_carry, res

    return topo, init_carry, step


def make_hmm_mpc_batched_step(model: HMMPredictiveModel, params: MPCParams,
                              thres: float = 0.1, feas_tol: float = 1e-3,
                              ipm: QPIPMConfig = QPIPMConfig()):
    """Batched HMM-belief MPC: the per-lane step under ``vmap`` — thousands of
    belief-augmented chain programs per chip (the HMM analog of the batched
    branch-MPC ensembles; the reference's controller is strictly one-at-a-time,
    ``PredictiveControllers.py:130``).

    The HMM program is a CHAIN LTV QP over the belief-augmented state with
    per-stage override rows (belief-gated collision constraints), so it rides
    the structured Riccati IPM rather than the fused tree kernel — the
    override-row generality is exactly what the fused kernel specializes
    away. Returns ``(topo, init_batched(B, dtype), bstep)`` with
    ``bstep(carrys, x0s, b0s, xbackups, xRef)`` over batch-leading pytrees
    (``xRef`` shared).
    """
    topo, init_carry, step = make_hmm_mpc_step(
        model, params, thres=thres, feas_tol=feas_tol, solver="ipm", ipm=ipm)

    def init_batched(B, dtype=jnp.float32):
        c = init_carry(dtype)
        return jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape), c)

    bstep = jax.jit(jax.vmap(step, in_axes=(0, 0, 0, 0, None)))
    return topo, init_batched, bstep


class HMMMPC:
    """Stateful wrapper mirroring the reference ``MPC.solve(x0, b, xbackup,
    xRef)`` API (``PredictiveControllers.py:130``)."""

    def __init__(self, mpcParameters: MPCParams, predictiveModel: HMMPredictiveModel,
                 admm: ADMMConfig = ADMMConfig(), dtype=jnp.float64,
                 solver: str = "ipm", ipm: QPIPMConfig = QPIPMConfig()):
        self.params = mpcParameters
        self.model = predictiveModel
        self.dtype = dtype
        self.topo, self._init_carry, step = make_hmm_mpc_step(
            predictiveModel, mpcParameters, admm, solver=solver, ipm=ipm
        )
        self._step = jax.jit(step)
        self.carry = self._init_carry(dtype)
        self.N = mpcParameters.N
        self.xPred = None
        self.uPred = None
        self.feasible = 1

    @property
    def predictiveModel(self):
        return self.model

    def solve(self, x0, b0, xbackup, xRef=None):
        if xRef is None:
            xRef = self.params.xRef
        xRef = np.asarray(xRef, float)
        if xRef.shape[0] == self.model.nx:
            xRef = np.append(xRef, np.zeros(self.model.M * self.model.m))
        self.carry, res = self._step(
            self.carry,
            jnp.asarray(x0, self.dtype),
            jnp.asarray(b0, self.dtype),
            jnp.asarray(xbackup, self.dtype),
            jnp.asarray(xRef, self.dtype),
        )
        self.xPred = np.asarray(res.xPred)
        self.uPred = np.asarray(res.uPred)
        self.feasible = int(res.feasible)
        return self.uPred[0]
