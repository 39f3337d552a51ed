"""Nested-CVaR branch-MPC controller.

TPU-native equivalent of the reference ``BranchMPC_CVaR`` (``MPC_branch.py:1598``):
per receding-horizon step — warm-start shift, tree rebuild, structured IPM solve
of the nested-CVaR tree SOCP — as one jitted function. Supports the merge
scenario's runtime state transform ``S`` and per-step ``bx`` override
(``MPC_branch.py:2043-2059``); like the reference env, the merge path always
passes an S matrix (identity on the main road), selected statically with
``use_S``.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from belief_planning_tpu.controllers.branch_mpc import (
    MPCCarry,
    _cast_pytree,
    _require_x64,
)
from belief_planning_tpu.models.predictive import PredictiveModel
from belief_planning_tpu.solvers.cvar import build_cvar_plan
from belief_planning_tpu.solvers.cvar_ipm import CVaRIPMConfig, cvar_ipm_solve
from belief_planning_tpu.tree.engine import build_tree, shift_warm_start
from belief_planning_tpu.tree.topology import build_topology
from belief_planning_tpu.utils.config import BranchMPCParams


class CVaRSolveResult(NamedTuple):
    xPred: Any
    uPred: Any
    slack: Any
    risk: Any
    w: Any
    p: Any
    z: Any
    J: Any
    gap: Any


def make_cvar_mpc_step(
    model: PredictiveModel,
    params: BranchMPCParams,
    ralpha: float,
    ipm: CVaRIPMConfig = CVaRIPMConfig(iters=80),
    replicate_quirks: bool = True,
    use_S: bool = False,
    prep_dtype=None,
    restart: int = 0,
    restart_cfg: Optional[CVaRIPMConfig] = None,
):
    """``restart``: warm-primal barrier-restart iterations for Mehrotra-jam
    recovery. The jam (cvar_ipm.py docstring) pins the gap at ~1e-5-1e-3 on
    some warm solves regardless of iteration count, leaving ~1e-3-scale
    best-iterate error; a second solve initialized at the first solve's
    primal with FRESH centered duals (the tuned default start — the same
    recipe as the batched path's ``refine_f64``, which was measured to
    converge past the analogous f32 wall) re-approaches from a clean dual.
    ``ts.x_lin``/``u_lin`` feed only the iterate init and the exact-
    equivalent per-cone scaling, so the restart solves the SAME program. The
    restarted result is used only where it improves the duality gap."""
    topo = build_topology(params.N, params.NB, model.m, params.n, params.d)
    cplan = build_cvar_plan(topo, replicate_quirks=replicate_quirks)
    Fx, Fu, bu = params.Fx, params.Fu, params.bu
    Q, R, Qslack = params.Q, params.R, params.Qslack

    def init_carry(dtype=jnp.float32) -> MPCCarry:
        return MPCCarry(
            u_lin=jnp.zeros((topo.totalu, params.d), dtype),
            p=jnp.zeros((topo.n_branches, topo.m), dtype),
            old_input=jnp.zeros((params.d,), dtype),
            initialized=jnp.asarray(False),
        )

    def step(carry: MPCCarry, x, z, xRef, policy_params, S=None, bx=None):
        x = jnp.asarray(x)
        z = jnp.asarray(z)
        xRef = jnp.asarray(xRef)
        pd = jnp.dtype(prep_dtype) if prep_dtype is not None else x.dtype
        policy_params = _cast_pytree(policy_params, pd)
        bx_used = jnp.asarray(params.bx, x.dtype) if bx is None else jnp.asarray(bx, x.dtype)
        shifted = shift_warm_start(topo, carry.u_lin, carry.p)
        u_lin = jnp.where(carry.initialized, shifted, jnp.zeros_like(shifted))
        ts = build_tree(model, topo, x.astype(pd), z.astype(pd),
                        u_lin.astype(pd), policy_params)
        if pd != x.dtype:
            ts = _cast_pytree(ts, x.dtype)
        S_used = (jnp.asarray(S, x.dtype)
                  if (use_S and S is not None) else None)
        x_f, u_f, s_f, r_f, aux = cvar_ipm_solve(
            cplan, ts, Q, R, Qslack, xRef, ralpha,
            Fx, bx_used, Fu, bu, x,
            S=S_used,
            cfg=ipm,
            # dh[0]-floor quirk applies to warm re-solves only
            # (MPC_branch.py:2030 lives in updateIneqConstr, not the cold
            # buildIneqConstr) — measured 1.2e-2 u0 parity error on the cold
            # merge solve when floored cold
            dh0_floor=carry.initialized,
        )
        if restart > 0:
            import dataclasses
            # default restart config flips the corrector count: the jam
            # bifurcation is corrector-pattern-sensitive, so a restart that
            # re-runs the exact same iteration sequence from the jammed
            # best-primal re-jams identically (measured t=2 overtake), while
            # a different pattern re-approaches from the same point
            rcfg = (restart_cfg if restart_cfg is not None
                    else dataclasses.replace(
                        ipm, iters=restart,
                        gondzio=(4 if ipm.gondzio != 4 else 2)))
            ts_r = ts._replace(x_lin=x_f.astype(ts.x_lin.dtype),
                               u_lin=u_f.astype(ts.u_lin.dtype))
            x2, u2, s2, r2, aux2 = cvar_ipm_solve(
                cplan, ts_r, Q, R, Qslack, xRef, ralpha,
                Fx, bx_used, Fu, bu, x,
                S=S_used, cfg=rcfg, dh0_floor=carry.initialized,
            )
            better = aux2["gap"] < aux["gap"]
            x_f = jnp.where(better, x2, x_f)
            u_f = jnp.where(better, u2, u_f)
            s_f = jnp.where(better, s2, s_f)
            r_f = jnp.where(better, r2, r_f)
            aux = {"J": jnp.where(better, aux2["J"], aux["J"]),
                   "gap": jnp.minimum(aux2["gap"], aux["gap"])}
        new_carry = MPCCarry(
            u_lin=u_f, p=ts.p, old_input=u_f[0], initialized=jnp.asarray(True),
        )
        res = CVaRSolveResult(
            xPred=x_f, uPred=u_f, slack=s_f, risk=r_f, w=ts.w, p=ts.p,
            z=ts.z, J=aux["J"], gap=aux["gap"],
        )
        return new_carry, res

    return topo, cplan, init_carry, step





def make_cvar_mpc_batched_step(
    model: PredictiveModel,
    params: BranchMPCParams,
    ralpha: float,
    ipm: CVaRIPMConfig = CVaRIPMConfig(iters=40),
    replicate_quirks: bool = True,
    use_pallas: bool = True,
    tile_b: int = 128,
    use_S: bool = False,
    prep_dtype=None,
    refine_f64: int = 0,
    refine_cfg: Optional[CVaRIPMConfig] = None,
    solve_dtype=None,
):
    """Batch-last fused-kernel variant of ``make_cvar_mpc_step``. The returned
    ``step(carrys, xs, zs, xRefs, policy_params[, S, bx])`` takes
    batch-leading pytrees and runs the IPM iterations through
    ``solvers/cvar_pl.py`` — one Pallas TPU kernel per Mehrotra iteration,
    lanes = batch. With ``use_S`` the merge shear transform ``S`` (B, n, n)
    and runtime ``bx`` (B, nFx) ride the same kernel as per-lane constants
    (reference merge path, ``MPC_branch.py:2043-2059``)."""
    from belief_planning_tpu.solvers.cvar_pl import cvar_ipm_solve_pl
    from belief_planning_tpu.solvers.layout import _from_bl, _to_bl

    topo = build_topology(params.N, params.NB, model.m, params.n, params.d)
    cplan = build_cvar_plan(topo, replicate_quirks=replicate_quirks)
    Nc = params.Fx.shape[0] + 1

    def init_carry(dtype=jnp.float32) -> MPCCarry:
        return MPCCarry(
            u_lin=jnp.zeros((topo.totalu, params.d), dtype),
            p=jnp.zeros((topo.n_branches, topo.m), dtype),
            old_input=jnp.zeros((params.d,), dtype),
            initialized=jnp.asarray(False),
        )

    if refine_f64 > 0 and prep_dtype is None:
        prep_dtype = jnp.float64
    _require_x64(refine_f64, prep_dtype, "make_cvar_mpc_batched_step")
    # tuned default start for the restart — a small-μ0 "gentle" start was
    # measured (QP path) to diverge monotonically from fresh under-scaled
    # duals; see branch_mpc.make_branch_mpc_batched_step.
    # Default flips the Gondzio corrector pattern, same as the stateful
    # path's jam-recovery restart: a same-pattern refine re-jams on the hard
    # tail (measured on-chip 2026-08-22, B=256 overtake stress batch:
    # same-pattern refine24 u0 err p90 0.14 vs flipped refine60 p90 2.9e-3
    # on tight-reference lanes; evidence/cvar_onchip_refine_2026-08-22.log).
    rcfg = refine_cfg if refine_cfg is not None else CVaRIPMConfig(
        iters=refine_f64, gondzio=(4 if ipm.gondzio != 4 else 2))

    def prep(carry: MPCCarry, x, z, policy_params):
        x = jnp.asarray(x)
        pd = jnp.dtype(prep_dtype) if prep_dtype is not None else x.dtype
        shifted = shift_warm_start(topo, carry.u_lin, carry.p)
        u_lin = jnp.where(carry.initialized, shifted, jnp.zeros_like(shifted))
        return build_tree(model, topo, x.astype(pd), jnp.asarray(z).astype(pd),
                          u_lin.astype(pd), _cast_pytree(policy_params, pd))

    def step(carrys: MPCCarry, xs, zs, xRefs, policy_params, S=None, bx=None):
        dt_in = jnp.asarray(xs).dtype
        dt_ = jnp.dtype(solve_dtype) if solve_dtype is not None else dt_in
        # policy params are cast once inside prep (to pd): a step-level cast
        # to the f32 solve dtype here would quantize them before the f64 prep
        # re-cast, defeating prep_dtype (near-tie softmin gradient flips).
        ts_p = jax.vmap(prep, in_axes=(0, 0, 0, None))(
            carrys, xs, zs, policy_params)
        ts_b = _cast_pytree(ts_p, dt_)
        S_bl = (jnp.moveaxis(jnp.asarray(S, dt_), 0, -1)
                if (use_S and S is not None) else None)
        bx_used = (params.bx if bx is None
                   else jnp.moveaxis(jnp.asarray(bx, dt_), 0, -1))
        # warm-only dh[0]-floor quirk, per lane (see make_cvar_mpc_step)
        floor_bl = jnp.broadcast_to(jnp.asarray(carrys.initialized),
                                    (xs.shape[0],))
        x_bl, u_bl, s_bl, r_bl, aux = cvar_ipm_solve_pl(
            cplan,
            _to_bl(ts_b.A), _to_bl(ts_b.Bm), _to_bl(ts_b.dh), _to_bl(ts_b.h0),
            _to_bl(ts_b.x_lin), _to_bl(ts_b.u_lin),
            jnp.moveaxis(ts_b.p, 0, -1),
            params.Q, params.R, params.Qslack, _to_bl(jnp.asarray(xRefs, dt_)),
            ralpha, params.Fx, bx_used, params.Fu, params.bu,
            cfg=ipm, use_pallas=use_pallas, tile_b=tile_b, S_bl=S_bl,
            dh0_floor=floor_bl,
        )
        if refine_f64 > 0:
            f64 = jnp.float64
            ts64 = _cast_pytree(ts_p, f64)
            bx64 = (jnp.asarray(params.bx, f64) if bx is None
                    else jnp.moveaxis(jnp.asarray(bx, f64), 0, -1))
            S64 = (jnp.moveaxis(jnp.asarray(S, f64), 0, -1)
                   if (use_S and S is not None) else None)
            x_bl, u_bl, s_bl, r_bl, aux2 = cvar_ipm_solve_pl(
                cplan,
                _to_bl(ts64.A), _to_bl(ts64.Bm), _to_bl(ts64.dh),
                _to_bl(ts64.h0),
                x_bl.astype(f64), u_bl.astype(f64),
                jnp.moveaxis(ts64.p, 0, -1),
                params.Q, params.R, params.Qslack,
                _to_bl(jnp.asarray(xRefs, f64)),
                ralpha, params.Fx, bx64, params.Fu, params.bu,
                cfg=rcfg, use_pallas=False, S_bl=S64,
                s_warm_bl=s_bl.astype(f64), r_warm_bl=r_bl.astype(f64),
                dh0_floor=floor_bl,
            )
            aux = {**aux, "J": aux2["J"], "gap": aux2["gap"]}
        x_f = _from_bl(x_bl).astype(dt_in)
        u_f = _from_bl(u_bl).astype(dt_in)
        s_f = _from_bl(s_bl).astype(dt_in)
        r_f = jnp.moveaxis(r_bl, -1, 0).astype(dt_in)
        aux = {**aux, "J": jnp.asarray(aux["J"], dt_in),
               "gap": jnp.asarray(aux["gap"], dt_in)}
        B = u_f.shape[0]
        new_carry = MPCCarry(
            u_lin=u_f, p=ts_b.p.astype(dt_in), old_input=u_f[:, 0],
            initialized=jnp.broadcast_to(jnp.asarray(True), (B,)),
        )
        res = CVaRSolveResult(
            xPred=x_f, uPred=u_f, slack=s_f, risk=r_f, w=ts_b.w, p=ts_b.p,
            z=ts_b.z, J=aux["J"], gap=aux["gap"],
        )
        return new_carry, res

    return topo, cplan, init_carry, step


class BranchMPCCVaR:
    """Stateful wrapper mirroring the reference ``BranchMPC_CVaR`` API:
    ``solve(x, z, xRef=None, S=None, Fx=None, bx=None)``."""

    def __init__(
        self,
        mpcParameters: BranchMPCParams,
        predictiveModel: PredictiveModel,
        policy_params,
        ralpha: float,
        ipm: CVaRIPMConfig = CVaRIPMConfig(iters=80),
        replicate_quirks: bool = True,
        use_S: bool = False,
        dtype=jnp.float64,
        prep_dtype=None,
        restart: int = 0,
        restart_cfg: Optional[CVaRIPMConfig] = None,
    ):
        self.params = mpcParameters
        self.model = predictiveModel
        self.policy_params = policy_params
        self.ralpha = ralpha
        self.use_S = use_S
        self.dtype = dtype
        self.topo, self.cplan, self._init_carry, step = make_cvar_mpc_step(
            predictiveModel, mpcParameters, ralpha, ipm, replicate_quirks, use_S,
            prep_dtype=prep_dtype, restart=restart, restart_cfg=restart_cfg,
        )
        self._step = jax.jit(step)
        self.carry = self._init_carry(dtype)
        self.N = mpcParameters.N
        self.psimax = float(np.asarray(mpcParameters.bx).ravel()[2]) if (
            np.asarray(mpcParameters.bx).size > 2) else 0.25
        self.xPred = None
        self.uPred = None
        self.feasible = 1
        self.last = None

    @property
    def predictiveModel(self):
        return self.model

    def update_policy_params(self, policy_params):
        self.policy_params = policy_params

    def solve(self, x, z, xRef=None, S=None, Fx=None, bx=None):
        if xRef is None:
            xRef = self.params.xRef
        args = dict(S=None, bx=None)
        if self.use_S and S is not None:
            # S=None passes through (reference semantics: ``self.S = S`` every
            # solve — post-lane-switch merge solves run the plain no-S path,
            # including NO dh[0] floor); an identity substitute here would
            # keep the floor quirk alive after the switch.
            args["S"] = np.asarray(S)
        if bx is not None:
            args["bx"] = np.asarray(bx, float)
        self.carry, res = self._step(
            self.carry,
            jnp.asarray(x, self.dtype),
            jnp.asarray(z, self.dtype),
            jnp.asarray(xRef, self.dtype),
            _cast_pytree(self.policy_params, self.dtype),
            **args,
        )
        self.last = res
        self.xPred = np.asarray(res.xPred)
        self.uPred = np.asarray(res.uPred)
        self.feasible = 1
        return self.uPred[0]

    def BT2array(self):
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
