"""Robust branch-MPC benchmark controller.

TPU-native equivalent of the reference ``robustMPC`` (``MPC_branch.py:1275-1595``):
a SINGLE ego trajectory of ``Nx = N·NB+2`` states must avoid EVERY branch of the
obstacle scenario tree simultaneously — the tree carries only obstacle rollouts;
each time step t gets one linearized collision row per obstacle node alive at t
(``zPred[t]``, ``:1336-1360``). The ego chain is the degenerate tree
(root + one branch of length N·NB), reusing the Riccati/ADMM machinery with
per-stage constraint-row overrides; rows are padded to the maximal per-step
scenario count m^NB (inactive rows get zero coefficients and a large bound).

Reference semantics preserved:
- linearization along the previous *prediction* shifted by one, NOT re-rolled
  from the measured state (``solve``→``computeLTVdynamics`` uses the xLin/uLin
  set at the end of the previous solve, ``:1429-1431``);
- the corrected (quirk-free) input-rate cost with OldInput (``:1540-1559``);
- slack on all state rows with uniform linear cost (``:1560-1562``).

Known deviation (documented): the terminal state's Fx box rows are dropped
(the reference constrains all Nx nodes; our row framework attaches rows to
input-bearing stages only — the terminal node keeps its Qf cost and dynamics).
The reference also evaluates branch probabilities against an *uninitialized*
ego buffer (``np.empty``, ``:1337``); they are unused by the program, so we
evaluate them against the real state instead.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from belief_planning_tpu.controllers.branch_mpc import _cast_pytree
from belief_planning_tpu.models.predictive import PredictiveModel
from belief_planning_tpu.ops.rollout import rollout_controls
from belief_planning_tpu.solvers.tree_qp import (
    ADMMConfig,
    admm_solve,
    assemble_stage_cost,
    build_stage_plan,
)
from belief_planning_tpu.solvers.tree_qp_ipm import QPIPMConfig, qp_ipm_solve
from belief_planning_tpu.tree.engine import TreeState, build_tree
from belief_planning_tpu.tree.topology import build_topology
from belief_planning_tpu.utils.config import BranchMPCParams

_BIG = 1e6


class RobustCarry(NamedTuple):
    xLin: Any         # (Nx, n) linearization trajectory
    uLin: Any         # (Nu, d)
    old_input: Any    # (d,)
    initialized: Any  # () bool


class RobustSolveResult(NamedTuple):
    xPred: Any
    uPred: Any
    slack: Any
    zPred: Any        # (Nu, m^NB, n) obstacle nodes per time step (padded)
    zvalid: Any       # (Nu, m^NB) static validity mask
    prim_res: Any
    feasible: Any


def make_robust_mpc_step(
    model: PredictiveModel,
    params: BranchMPCParams,
    admm: ADMMConfig = ADMMConfig(),
    feas_tol: float = 1e-3,
    solver: str = "ipm",
    ipm: QPIPMConfig = QPIPMConfig(),
):
    n, d, N, NB = params.n, params.d, params.N, params.NB
    m = model.m
    topo_real = build_topology(N, NB, m, n, d)
    Nchain = N * NB
    topo_chain = build_topology(Nchain, 1, 1, n, d)
    plan_chain = build_stage_plan(topo_chain)
    Nx = topo_chain.totalx           # = N·NB + 2
    Nu = topo_chain.totalu           # = N·NB + 1
    maxz = m ** NB

    # per-time obstacle-node map over the real topology
    znode_ids = np.zeros((Nu, maxz), dtype=np.int64)
    zvalid = np.zeros((Nu, maxz), dtype=bool)
    counts = np.zeros(Nu, dtype=np.int64)
    znode_ids[0, 0] = 0
    zvalid[0, 0] = True
    counts[0] = 1
    for b in range(1, topo_real.n_branches):
        dep = int(topo_real.depth[b])
        for tl in range(int(topo_real.blen[b])):
            t = (dep - 1) * N + tl + 1
            c = counts[t]
            znode_ids[t, c] = topo_real.u_off[b] + tl
            zvalid[t, c] = True
            counts[t] += 1
    zvalid_j = jnp.asarray(zvalid)

    Fx, bx, Fu, bu = params.Fx, params.bx, params.Fu, params.bu
    nFx = Fx.shape[0]
    Q, R, Qf, dR, Qslack = params.Q, params.R, params.Qf, params.dR, params.Qslack

    def init_carry(dtype=jnp.float32) -> RobustCarry:
        return RobustCarry(
            xLin=jnp.zeros((Nx, n), dtype),
            uLin=jnp.zeros((Nu, d), dtype),
            old_input=jnp.zeros((d,), dtype),
            initialized=jnp.asarray(False),
        )

    def step(carry: RobustCarry, x, z, xRef, policy_params):
        x = jnp.asarray(x)
        z = jnp.asarray(z)
        dtype = x.dtype
        xRef = jnp.asarray(xRef)

        # obstacle scenario tree (z rollouts; ego part used only for the unused
        # branch probabilities)
        ts_real = build_tree(
            model, topo_real, x, z,
            jnp.zeros((topo_real.totalu, d), dtype), policy_params,
        )
        zmat = ts_real.z[znode_ids]                     # (Nu, maxz, n)

        # linearization trajectory: previous prediction (shifted at solve end),
        # or a zero-input rollout from the measured state on the first solve
        roll = rollout_controls(model.dyn, x, jnp.zeros((Nx - 1, d), dtype), model.dt)
        x_roll = jnp.concatenate([x[None], roll], axis=0)
        xLin = jnp.where(carry.initialized, carry.xLin, x_roll)
        uLin = carry.uLin

        A, B, C, _ = model.linearize(xLin[:-1], uLin)

        # The Riccati-eliminated IPM enforces dynamics implicitly: the iterate
        # must lie on the NEW linearized-dynamics manifold with x_0 = measured
        # x. The shifted prediction (the reference's linearization trajectory,
        # kept as the linearization point) satisfies only the PREVIOUS solve's
        # dynamics, so re-roll the warm iterate through the new (A, B, C)
        # before handing it to the solver — the QP itself is unchanged.
        def _lin_roll(c, inp):
            Ai, Bi, Ci, ui = inp
            nxt = Ai @ c + Bi @ ui + Ci
            return nxt, nxt

        _, x_tail = jax.lax.scan(_lin_roll, x, (A, B, C, uLin))
        x_warm = jnp.concatenate([x[None], x_tail], axis=0)

        ts_chain = TreeState(
            x_lin=xLin, u_lin=uLin,
            z=jnp.zeros((Nu, n), dtype),
            p=jnp.zeros((topo_chain.n_branches, 1), dtype),
            dp=jnp.zeros((topo_chain.n_branches, 1, n), dtype),
            w=jnp.ones((topo_chain.n_branches,), dtype),
            A=jnp.concatenate([jnp.zeros((1, n, n), dtype), A], axis=0),
            Bm=jnp.concatenate([jnp.zeros((1, n, d), dtype), B], axis=0),
            C=jnp.concatenate([jnp.zeros((1, n), dtype), C], axis=0),
            h0=jnp.zeros((Nu,), dtype),
            dh=jnp.zeros((Nu, n), dtype),
        )

        # collision rows: one per (time, obstacle node), padded
        xl_rep = jnp.repeat(xLin[:Nu, None, :], maxz, axis=1)   # (Nu, maxz, n)
        col_v = jax.vmap(jax.vmap(model.col_raw))
        h_raw, dh = col_v(xl_rep, zmat)
        h0 = h_raw - jnp.einsum("tjn,tn->tj", dh, xLin[:Nu])
        dh = jnp.where(zvalid_j[:, :, None], dh, 0.0)
        h0 = jnp.where(zvalid_j, h0, _BIG)

        Fxc = jnp.concatenate(
            [jnp.broadcast_to(jnp.asarray(Fx, dtype), (Nu, nFx, n)), -dh], axis=1
        )
        b1 = jnp.concatenate(
            [jnp.broadcast_to(jnp.asarray(bx, dtype), (Nu, nFx)), h0], axis=1
        )

        cost = assemble_stage_cost(
            topo_chain, ts_chain, Q, R, Qf, dR, Qslack, xRef, carry.old_input,
            variant="robust",
        )
        if solver == "ipm":
            x_nodes, u, s, info = qp_ipm_solve(
                plan_chain, cost, ts_chain, Fx, bx, Fu, bu, x, carry.old_input,
                ipm, Fxc_override=Fxc, b1_override=b1,
                warm_primal=(x_warm, uLin),
            )
        else:
            x_nodes, u, s, st, info = admm_solve(
                plan_chain, cost, ts_chain, Fx, bx, Fu, bu, x, carry.old_input,
                admm, Fxc_override=Fxc, b1_override=b1,
            )
        new_carry = RobustCarry(
            xLin=jnp.concatenate([x_nodes[1:], x_nodes[-1:]], axis=0),
            uLin=jnp.concatenate([u[1:], u[-1:]], axis=0),
            old_input=u[0],
            initialized=jnp.asarray(True),
        )
        res = RobustSolveResult(
            xPred=x_nodes, uPred=u, slack=s, zPred=zmat, zvalid=zvalid_j,
            prim_res=info["prim_res"],
            feasible=info["prim_res"] < feas_tol,
        )
        return new_carry, res

    return topo_chain, init_carry, step


class RobustMPC:
    """Stateful wrapper mirroring the reference ``robustMPC`` API."""

    def __init__(self, mpcParameters: BranchMPCParams,
                 predictiveModel: PredictiveModel, policy_params,
                 admm: ADMMConfig = ADMMConfig(), dtype=jnp.float64,
                 solver: str = "ipm", ipm: QPIPMConfig = QPIPMConfig()):
        self.params = mpcParameters
        self.model = predictiveModel
        self.policy_params = policy_params
        self.dtype = dtype
        self.topo, self._init_carry, step = make_robust_mpc_step(
            predictiveModel, mpcParameters, admm, solver=solver, ipm=ipm
        )
        self._step = jax.jit(step)
        self.carry = self._init_carry(dtype)
        self.N = mpcParameters.N
        self.xPred = None
        self.uPred = None
        self.feasible = 1
        self.last = None

    @property
    def predictiveModel(self):
        return self.model

    def update_policy_params(self, policy_params):
        self.policy_params = policy_params

    def solve(self, x, z, xRef=None):
        if xRef is None:
            xRef = self.params.xRef
        self.carry, res = self._step(
            self.carry,
            jnp.asarray(x, self.dtype),
            jnp.asarray(z, self.dtype),
            jnp.asarray(xRef, self.dtype),
            _cast_pytree(self.policy_params, self.dtype),
        )
        self.last = res
        self.xPred = np.asarray(res.xPred)
        self.uPred = np.asarray(res.uPred)
        self.feasible = int(res.feasible)
        return self.uPred[0]

    def BT2array(self):
        """Reference ``robustMPC.BT2array`` (``MPC_branch.py:1385-1396``):
        single ego trajectory + all obstacle branch trajectories."""
        res = self.last
        z = np.asarray(res.zPred)
        valid = np.asarray(res.zvalid)
        ztraj = []
        for j in range(z.shape[1]):
            rows = [z[t, j] for t in range(z.shape[0]) if valid[t, j]]
            if rows:
                ztraj.append(np.array(rows))
        return [np.asarray(res.xPred)], ztraj, [np.asarray(res.uPred)], []
