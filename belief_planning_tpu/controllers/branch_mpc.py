"""Branch-MPC controllers (QP path).

TPU-native equivalents of the reference's ``BranchMPCProx`` (``MPC_branch.py:82``)
and the live ``BranchMPC`` (``MPC_branch.py:881``). The whole receding-horizon
step — warm-start shift, tree rebuild, cost assembly, tree-QP solve — is one pure
jitted function ``step(carry, x, z, xRef, policy_params) -> (carry, result)``;
a thin stateful wrapper mirrors the reference's ``solve(x, z, xRef)`` API for the
environments.

The functional core composes:
  ``shift_warm_start`` (MPC_branch.py:225-234) → ``build_tree`` (129-263) →
  ``assemble_stage_cost`` (265-325) → ``admm_solve`` (385-487, OSQP-equivalent).

Batching: ``make_branch_mpc_step`` returns a single-instance function; wrap in
``jax.vmap`` for ensembles (see ``parallel/``).
"""

from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from belief_planning_tpu.models.predictive import PredictiveModel
from belief_planning_tpu.solvers.tree_qp import (
    ADMMConfig,
    admm_solve,
    assemble_stage_cost,
    build_stage_plan,
)
from belief_planning_tpu.solvers.tree_qp_ipm import QPIPMConfig, qp_ipm_solve
from belief_planning_tpu.tree.engine import build_tree, shift_warm_start, warm_shift_indices
from belief_planning_tpu.tree.topology import TreeTopology, build_topology
from belief_planning_tpu.utils.config import BranchMPCParams


class MPCCarry(NamedTuple):
    """Warm-start state carried between receding-horizon steps.

    Beyond the reference's input shift, the per-stage ADMM duals are also
    shifted and carried — steady-state receding-horizon solves then start with
    near-optimal multipliers and need far fewer iterations."""

    u_lin: Any        # (totalu, d) previous solution inputs
    p: Any            # (B, m) previous branch probabilities (for the argmax shift)
    old_input: Any    # (d,) previously applied input
    initialized: Any  # () bool — False on the first solve (inittree semantics)
    y1: Any = None    # (totalu, Nc) state-row duals
    y2: Any = None    # (totalu, nFu) input-row duals
    y3: Any = None    # (totalu, Nc) slack-positivity duals


class SolveResult(NamedTuple):
    xPred: Any        # (totalx, n)
    uPred: Any        # (totalu, d)
    slack: Any        # (totalu, Nc)
    w: Any            # (B,) branch weights
    p: Any            # (B, m)
    x_lin: Any        # (totalx, n) linearization trajectory used
    z: Any            # (totalu, n) obstacle nodes
    prim_res: Any     # () ADMM primal residual
    feasible: Any     # () bool


def _cast_pytree(tree, dtype):
    """Cast floating leaves of a policy-param pytree to the controller dtype."""
    import jax.numpy as _jnp

    def cast(a):
        if a is None:
            return None
        arr = _jnp.asarray(a)
        if _jnp.issubdtype(arr.dtype, _jnp.floating):
            return arr.astype(dtype)
        return arr

    import jax as _jax
    return _jax.tree.map(cast, tree)


def _require_x64(refine_f64, prep_dtype, where: str) -> None:
    """Fail fast when a parity-grade option silently degrades to f32.

    ``refine_f64>0`` / ``prep_dtype=float64`` rely on real f64 arithmetic;
    with ``jax_enable_x64`` off every ``astype(float64)`` no-ops to f32 and
    the refine phase re-runs into the same f32 precision wall, returning
    unimproved results with no error. Raise at factory time instead."""
    import jax as _jax
    import jax.numpy as _jnp

    wants_f64 = refine_f64 > 0 or (
        prep_dtype is not None and _jnp.dtype(prep_dtype) == _jnp.float64
    )
    if wants_f64 and not _jax.config.jax_enable_x64:
        raise ValueError(
            f"{where}: refine_f64>0 / prep_dtype=float64 require "
            "jax.config.update('jax_enable_x64', True); without it the f64 "
            "phase silently runs in f32 and cannot pass the precision wall."
        )


def make_branch_mpc_step(
    model: PredictiveModel,
    params: BranchMPCParams,
    variant: str = "prox",
    admm: ADMMConfig = ADMMConfig(),
    replicate_quirks: bool = True,
    feas_tol: float = 1e-3,
    solver: str = "ipm",
    ipm: QPIPMConfig = QPIPMConfig(),
    prep_dtype=None,
):
    """Build (topo, init_carry_fn, step_fn) for one controller configuration.

    ``solver``: "ipm" (default — structured Mehrotra IPM, ~35 iterations at
    machine precision) or "admm" (OSQP-equivalent numerics).

    ``prep_dtype``: optional wider dtype (``jnp.float64``) for the tree build +
    cost assembly only; the QP data is cast back to the input dtype for the
    solver. On TPU this removes the f32 coefficient-rounding floor of the
    rollout/linearization chain (PARITY.md) at negligible cost — prep is a
    vanishing share of the step — while the solver stays in fast f32.
    Requires ``jax.config.update("jax_enable_x64", True)``."""
    topo = build_topology(params.N, params.NB, model.m, params.n, params.d)
    plan = build_stage_plan(topo)
    Fx, bx = params.Fx, params.bx
    Fu, bu = params.Fu, params.bu
    Q, R, Qf, dR, Qslack = params.Q, params.R, params.Qf, params.dR, params.Qslack

    Nc = Fx.shape[0] + 1
    nFu = Fu.shape[0]

    def init_carry(dtype=jnp.float32) -> MPCCarry:
        return MPCCarry(
            u_lin=jnp.zeros((topo.totalu, params.d), dtype),
            p=jnp.zeros((topo.n_branches, topo.m), dtype),
            old_input=jnp.zeros((params.d,), dtype),
            initialized=jnp.asarray(False),
            y1=jnp.zeros((topo.totalu, Nc), dtype),
            y2=jnp.zeros((topo.totalu, nFu), dtype),
            y3=jnp.zeros((topo.totalu, Nc), dtype),
        )

    def step(carry: MPCCarry, x, z, xRef, policy_params) -> Tuple[MPCCarry, SolveResult]:
        x = jnp.asarray(x)
        z = jnp.asarray(z)
        xRef = jnp.asarray(xRef)
        policy_params = _cast_pytree(policy_params, x.dtype)
        src_idx = warm_shift_indices(topo, carry.p)
        init_mask = carry.initialized
        u_lin = jnp.where(init_mask, carry.u_lin[src_idx],
                          jnp.zeros_like(carry.u_lin))
        pd = jnp.dtype(prep_dtype) if prep_dtype is not None else x.dtype
        ts = build_tree(model, topo, x.astype(pd), z.astype(pd),
                        u_lin.astype(pd), _cast_pytree(policy_params, pd))
        cost = assemble_stage_cost(
            topo, ts, Q, R, Qf, dR, Qslack, xRef.astype(pd),
            carry.old_input.astype(pd),
            variant=variant, replicate_quirks=replicate_quirks,
        )
        if pd != x.dtype:
            ts = _cast_pytree(ts, x.dtype)
            cost = _cast_pytree(cost, x.dtype)
        if solver == "ipm":
            x_nodes, u, s, info = qp_ipm_solve(
                plan, cost, ts, Fx, bx, Fu, bu, x, carry.old_input, ipm,
            )
            y1n, y2n, y3n = carry.y1, carry.y2, carry.y3
        else:
            warm_duals = (
                jnp.where(init_mask, carry.y1[src_idx], 0.0),
                jnp.where(init_mask, carry.y2[src_idx], 0.0),
                jnp.where(init_mask, carry.y3[src_idx], 0.0),
            )
            x_nodes, u, s, st, info = admm_solve(
                plan, cost, ts, Fx, bx, Fu, bu, x, carry.old_input, admm,
                warm_duals=warm_duals,
            )
            y1n, y2n, y3n = st.y1, st.y2, st.y3
        new_carry = MPCCarry(
            u_lin=u, p=ts.p, old_input=u[0], initialized=jnp.asarray(True),
            y1=y1n, y2=y2n, y3=y3n,
        )
        res = SolveResult(
            xPred=x_nodes, uPred=u, slack=s, w=ts.w, p=ts.p,
            x_lin=ts.x_lin, z=ts.z,
            prim_res=info["prim_res"],
            feasible=info["prim_res"] < feas_tol,
        )
        return new_carry, res

    return topo, init_carry, step


def make_branch_mpc_batched_step(
    model: PredictiveModel,
    params: BranchMPCParams,
    variant: str = "prox",
    replicate_quirks: bool = True,
    feas_tol: float = 1e-3,
    ipm: QPIPMConfig = QPIPMConfig(),
    backend: str = "pl_xla",
    backend_opts: Optional[dict] = None,
    prep_dtype=None,
    refine_f64: int = 0,
    refine_cfg: Optional[QPIPMConfig] = None,
    solve_dtype=None,
    policy_in_axes=None,
):
    """Batch-last variant of ``make_branch_mpc_step`` (IPM backend only).

    ``policy_in_axes``: vmap in-axes prefix pytree for ``policy_params`` in the
    tree-build prep (default ``None`` = shared across lanes). Pass e.g.
    ``(None, None, LaneChangeParams(x_target=0))`` to give every lane its own
    lane-change target (the batched closed-loop envs retarget per world).

    ``solve_dtype``: dtype of the (phase-1) fused solve, independent of the
    input/state dtype. The parity-grade mode passes f64 states with
    ``solve_dtype=float32`` + ``refine_f64``: the measured state reaches the
    f64 tree build unquantized (an f32-rounded state perturbs y by ~6e-8,
    which near a collision-softmin tie flips the linearization gradient at
    O(1) — a *different, equally valid* QP whose optimum can differ by O(0.1);
    measured on the demo cold start: dh changes by 2.2 from the f32 rounding
    of y=1.8 alone) while the heavy iterations still run in f32. Outputs and
    carry stay in the input dtype.

    ``refine_f64``: number of f64 restart iterations run after the (f32)
    fused solve — the parity-grade on-chip mode. The f32 Mehrotra iteration
    hits a precision wall at gap ~1e-2 (barrier weights reach the f32 clamp,
    κ·eps ≈ 0.1, directions turn to noise; measured 2026-08-20) leaving
    ~1e-2-scale error on active bounds; the refine phase re-enters the
    barrier method in f64 (TPU: XLA-emulated, ``pl_xla`` layout) warm-started
    from the f32 primal (x, u, s — fresh small-μ duals per the warm-start
    findings: carried duals block on the shifted active set) on f64-built QP
    data, and converges past the wall. Implies ``prep_dtype=float64``.
    ``refine_cfg`` overrides the restart phase config (default: the tuned
    cold-start settings with ``iters=refine_f64``; 10 warm iterations reach
    8e-5 on the demo overtake where cold f64 needs 12 for equivalent error).

    ``backend`` selects how the level-blocked fused IPM iteration runs:
    ``"pl"`` = one Pallas TPU kernel (``tree_qp_pl``), ``"pl_xla"`` = the same
    iteration as plain XLA (portable; CPU tests and the f64 refine phase).

    The returned ``step(carrys, xs, zs, xRefs, policy_params)`` takes
    batch-LEADING pytrees (same as ``jax.vmap`` of the per-lane step) but runs
    the solver iterations in batch-LAST layout — lanes of the TPU vector unit
    hold the batch, and the tiny (n, n)/(d, d) matrix dims sit in the cheap
    major axes (see ``solvers/layout``). Tree build + cost assembly stay
    vmapped (they are a small, one-off share of the step). Numerically
    identical to the vmapped step to solver precision
    (tests/test_tree_qp_pl.py)."""
    from belief_planning_tpu.solvers.layout import _from_bl, _to_bl, cost_to_bl

    if backend in ("pl", "pl_xla"):
        from belief_planning_tpu.solvers.tree_qp_pl import qp_ipm_solve_pl

        solve_bl = partial(qp_ipm_solve_pl, use_pallas=(backend == "pl"),
                           **(backend_opts or {}))
    else:
        raise ValueError(f"unknown backend {backend!r}")

    topo = build_topology(params.N, params.NB, model.m, params.n, params.d)
    plan = build_stage_plan(topo)
    Fx, bx = params.Fx, params.bx
    Fu, bu = params.Fu, params.bu
    Q, R, Qf, dR, Qslack = params.Q, params.R, params.Qf, params.dR, params.Qslack

    Nc = Fx.shape[0] + 1
    nFu = Fu.shape[0]

    def init_carry(dtype=jnp.float32) -> MPCCarry:
        return MPCCarry(
            u_lin=jnp.zeros((topo.totalu, params.d), dtype),
            p=jnp.zeros((topo.n_branches, topo.m), dtype),
            old_input=jnp.zeros((params.d,), dtype),
            initialized=jnp.asarray(False),
            y1=jnp.zeros((topo.totalu, Nc), dtype),
            y2=jnp.zeros((topo.totalu, nFu), dtype),
            y3=jnp.zeros((topo.totalu, Nc), dtype),
        )

    if refine_f64 > 0 and prep_dtype is None:
        prep_dtype = jnp.float64
    _require_x64(refine_f64, prep_dtype, "make_branch_mpc_batched_step")
    # the restart keeps the TUNED default start (μ0=10, sl_min=0.1): a
    # "gentler" small-μ0 start (1e-3) was measured to diverge monotonically —
    # fresh duals far below their true scale force a gap climb and the
    # best-iterate tracker then returns the unrefined warm start. With the
    # default start, warm-primal f64 needs ~10 iterations to 8e-5 (cold
    # needs 12; measured 2026-08-21 on the demo overtake).
    rcfg = refine_cfg if refine_cfg is not None else QPIPMConfig(
        iters=refine_f64)

    def prep(carry: MPCCarry, x, z, xRef, policy_params):
        x = jnp.asarray(x)
        pd = jnp.dtype(prep_dtype) if prep_dtype is not None else x.dtype
        policy_params = _cast_pytree(policy_params, pd)
        src_idx = warm_shift_indices(topo, carry.p)
        u_lin = jnp.where(carry.initialized, carry.u_lin[src_idx],
                          jnp.zeros_like(carry.u_lin))
        ts = build_tree(model, topo, x.astype(pd), jnp.asarray(z).astype(pd),
                        u_lin.astype(pd), policy_params)
        cost = assemble_stage_cost(
            topo, ts, Q, R, Qf, dR, Qslack, jnp.asarray(xRef).astype(pd),
            carry.old_input.astype(pd),
            variant=variant, replicate_quirks=replicate_quirks,
        )
        return ts, cost

    def step(carrys: MPCCarry, xs, zs, xRefs, policy_params):
        dt_in = jnp.asarray(xs).dtype
        sd = jnp.dtype(solve_dtype) if solve_dtype is not None else dt_in
        ts_p, cost_p = jax.vmap(prep, in_axes=(0, 0, 0, 0, policy_in_axes))(
            carrys, xs, zs, xRefs, policy_params
        )
        ts_b = _cast_pytree(ts_p, sd)
        cost_b = _cast_pytree(cost_p, sd)
        x_nodes_bl, u_bl, s_bl, info = solve_bl(
            plan, cost_to_bl(cost_b),
            _to_bl(ts_b.A), _to_bl(ts_b.Bm), _to_bl(ts_b.C),
            _to_bl(ts_b.dh), _to_bl(ts_b.h0),
            Fx, bx, Fu, bu,
            _to_bl(ts_b.x_lin), _to_bl(ts_b.u_lin),
            ipm,
        )
        if refine_f64 > 0:
            from belief_planning_tpu.solvers.tree_qp_pl import qp_ipm_solve_pl

            f64 = jnp.float64
            ts64 = _cast_pytree(ts_p, f64)
            cost64 = _cast_pytree(cost_p, f64)
            x_nodes_bl, u_bl, s_bl, info2 = qp_ipm_solve_pl(
                plan, cost_to_bl(cost64),
                _to_bl(ts64.A), _to_bl(ts64.Bm), _to_bl(ts64.C),
                _to_bl(ts64.dh), _to_bl(ts64.h0),
                Fx, bx, Fu, bu,
                x_nodes_bl.astype(f64), u_bl.astype(f64),
                rcfg, use_pallas=False,
                s_warm_bl=s_bl.astype(f64),
            )
            info = {**info, "prim_res": info2["prim_res"],
                    "gap": info2["gap"]}
        x_nodes = _from_bl(x_nodes_bl).astype(dt_in)
        u = _from_bl(u_bl).astype(dt_in)
        s = _from_bl(s_bl).astype(dt_in)
        info = {**info, "prim_res": jnp.asarray(info["prim_res"], dt_in),
                "gap": jnp.asarray(info["gap"], dt_in)}
        B = u.shape[0]
        new_carry = MPCCarry(
            u_lin=u, p=ts_b.p.astype(dt_in), old_input=u[:, 0],
            initialized=jnp.broadcast_to(jnp.asarray(True), (B,)),
            y1=carrys.y1, y2=carrys.y2, y3=carrys.y3,
        )
        res = SolveResult(
            xPred=x_nodes, uPred=u, slack=s, w=ts_b.w, p=ts_b.p,
            x_lin=ts_b.x_lin, z=ts_b.z,
            prim_res=info["prim_res"],
            feasible=info["prim_res"] < feas_tol,
        )
        return new_carry, res

    return topo, init_carry, step




class BranchMPC:
    """Stateful wrapper mirroring the reference controller API
    (``solve(x, z, xRef) → uPred/xPred/feasible``, plus ``BT2array`` for viz).

    ``variant='branch'`` ↔ reference live ``BranchMPC`` (``MPC_branch.py:881``),
    ``variant='prox'`` ↔ ``BranchMPCProx`` (``MPC_branch.py:82``).
    """

    variant = "branch"

    def __init__(
        self,
        mpcParameters: BranchMPCParams,
        predictiveModel: PredictiveModel,
        policy_params,
        admm: ADMMConfig = ADMMConfig(),
        replicate_quirks: bool = True,
        dtype=jnp.float64,
        solver: str = "ipm",
        ipm: QPIPMConfig = QPIPMConfig(),
        prep_dtype=None,
    ):
        self.params = mpcParameters
        self.model = predictiveModel
        self.policy_params = policy_params
        self.dtype = dtype
        self.topo, self._init_carry, step = make_branch_mpc_step(
            predictiveModel, mpcParameters, self.variant, admm, replicate_quirks,
            solver=solver, ipm=ipm, prep_dtype=prep_dtype,
        )
        self._step = jax.jit(step)
        self.carry = self._init_carry(dtype)
        self.N = mpcParameters.N
        self.n = mpcParameters.n
        self.d = mpcParameters.d
        self.xPred = None
        self.uPred = None
        self.feasible = 1
        self.last = None
        self.solverTime = 0.0

    @property
    def predictiveModel(self):
        return self.model

    def update_policy_params(self, policy_params):
        """Reference ``update_backup`` analog: swap policy targets — pure data,
        no recompilation (cf. ``highway_branch_dyn.py:331-334``)."""
        self.policy_params = policy_params

    def solve(self, x, z, xRef=None):
        import time

        if xRef is None:
            xRef = self.params.xRef
        t0 = time.perf_counter()
        self.carry, res = self._step(
            self.carry,
            jnp.asarray(x, self.dtype),
            jnp.asarray(z, self.dtype),
            jnp.asarray(xRef, self.dtype),
            _cast_pytree(self.policy_params, self.dtype),
        )
        self.solverTime = time.perf_counter() - t0
        self.last = res
        self.xPred = np.asarray(res.xPred)
        self.uPred = np.asarray(res.uPred)
        self.feasible = int(res.feasible)
        return self.uPred[0]

    def BT2array(self):
        """Per-branch (xtraj, ztraj, utraj, w) with the parent's last point
        prepended — reference ``BT2array`` (``MPC_branch.py:444-459``)."""
        topo = self.topo
        res = self.last
        x = np.asarray(res.xPred)
        z = np.asarray(res.z)
        u = np.asarray(res.uPred)
        w = np.asarray(res.w)
        xtraj, ztraj, utraj, ws = [], [], [], []
        for b in range(1, topo.n_branches):
            par = topo.parent[b]
            ox, ou, l = topo.x_off[b], topo.u_off[b], topo.blen[b]
            pox, pou, pl = topo.x_off[par], topo.u_off[par], topo.blen[par]
            xtraj.append(np.vstack([x[pox + pl - 1], x[ox:ox + l]]))
            ztraj.append(np.vstack([z[pou + pl - 1], z[ou:ou + l]]))
            utraj.append(np.vstack([u[pou + pl - 1], u[ou:ou + l]]))
            ws.append(w[b])
        return xtraj, ztraj, utraj, ws


class BranchMPCProx(BranchMPC):
    variant = "prox"
