"""Fully-jitted batched MERGE environment — closed loops on the fused CVaR
kernel (the second headline solver path) over thousands of worlds.

Re-expresses :class:`envs.merge.HighwayMergeEnv` (reference
``Highway_env_merge``, ``Highway_env_branch.py:271-380``) as pure JAX:

- the laneID switch at ``x > merge_s + 8`` (``:329``) becomes a monotone
  boolean per world;
- the ramp-frame shear transform S, runtime ``bx`` and ref-line xRef
  (``:354-362``) are computed from the on-device :class:`RefLine` tables and
  fed to the batched CVaR step as per-lane runtime data (the reference
  rebuilds them host-side every step); post-switch the reference passes
  ``S=eye`` + the default ``bx`` (``:350-352``) — so the warm-only ``dh[0]``
  floor stays active throughout, which is exactly the batched step's
  ``carry.initialized`` gate;
- the obstacle applies backup policy 0 of the main-road model — the reference
  computes an argmax-safety choice and then unconditionally overrides it
  (``:346`` quirk), so only the override is evaluated here;
- the MPC keeps the lane-0 (main road) predictive model throughout, as in the
  reference (``main_branch.py:87`` — never switched on lane change).

The merge step draws no randomness (the reference merge env's RNG is unused in
``step``), so episodes are deterministic given the initial worlds —
``tests/test_batched_env.py`` pins the batched episode against the host
:class:`HighwayMergeEnv` driving the same controller config step-for-step.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from belief_planning_tpu.controllers.cvar_mpc import make_cvar_mpc_batched_step
from belief_planning_tpu.envs.merge import merge_ref_lines
from belief_planning_tpu.models.predictive import PredictiveModel
from belief_planning_tpu.solvers.cvar_ipm import CVaRIPMConfig
from belief_planning_tpu.utils.config import BranchMPCParams

LANE_W = 3.6


class MergeWorldState(NamedTuple):
    mpc_carry: Any
    x: Any        # (4,) ego (starts on the ramp)
    z: Any        # (4,) obstacle (main road)
    merged: Any   # () bool — ego laneID switched to the main road
    collided: Any # () bool


def make_batched_merge_fused(
    cons,
    model: PredictiveModel,
    params: BranchMPCParams,
    pset_params,
    ralpha: float = 0.1,
    ipm: CVaRIPMConfig = CVaRIPMConfig(iters=24, gondzio=2),
    use_pallas: bool = True,
    tile_b: int = 128,
    N_lane: int = 2,
    merge_lane: int = 1,
    merge_s: float = 50.0,
    merge_R: float = 300.0,
    merge_side: int = 0,
    v0: float = 20.0,
    dtype=jnp.float32,
    **step_kwargs,
):
    """Returns (topo, init_worlds(B, key), episode(worlds, n_steps)).

    ``model``/``pset_params`` are the MAIN-ROAD predictive model and its policy
    params (the controller's model for the whole episode, reference
    ``main_branch.py:87``). ``step_kwargs`` forward to
    ``make_cvar_mpc_batched_step`` (``prep_dtype``, ``refine_f64``, ...)."""
    topo, cplan, init_carry, bstep = make_cvar_mpc_batched_step(
        model, params, ralpha, ipm=ipm, use_pallas=use_pallas, tile_b=tile_b,
        use_S=True, **step_kwargs)

    refY, refpsi = merge_ref_lines(N_lane, merge_lane, merge_s, merge_R,
                                   merge_side)
    bx_flat = np.asarray(params.bx, float).ravel()
    psimax = float(bx_flat[2]) if bx_flat.size > 2 else 0.25
    bx_default = jnp.asarray(bx_flat, dtype)
    nFx = bx_flat.size
    if nFx != 4:
        raise ValueError(f"merge runtime bx expects 4 state rows, got {nFx}")
    xRef_road = jnp.asarray([0.0, (N_lane - 0.5) * LANE_W, v0, 0.0], dtype)
    dt = model.dt

    def euler(s, u):
        return s + jnp.stack(
            [s[2] * jnp.cos(s[3]), s[2] * jnp.sin(s[3]), u[0], u[1]]
        ) * dt

    def env_pre(world: MergeWorldState):
        """laneID switch + per-world S / xRef / bx (reference ``:329,348-362``)."""
        x = world.x
        merged = jnp.logical_or(world.merged, x[0] > merge_s + 8)
        y0 = refY(x[0]).astype(dtype)
        psi0 = refpsi(x[0]).astype(dtype)
        tp = jnp.tan(psi0)
        S_ramp = jnp.eye(4, dtype=dtype).at[1, 0].set(-tp)
        xRef_ramp = jnp.stack([jnp.asarray(0.0, dtype), -tp * x[0] + y0 + 1.8,
                               jnp.asarray(v0, dtype), psi0])
        bx_ramp = jnp.stack([
            -tp * x[0] + y0 + LANE_W * merge_lane - cons.W / 2,
            tp * x[0] - y0 - cons.W / 2,
            psi0 + psimax,
            -psi0 + psimax,
        ])
        S = jnp.where(merged, jnp.eye(4, dtype=dtype), S_ramp)
        xRef = jnp.where(merged, xRef_road, xRef_ramp)
        bx = jnp.where(merged, bx_default, bx_ramp)
        return merged, S, xRef, bx

    def env_post(world: MergeWorldState, merged, new_carry, u_ego):
        # obstacle: backup 0 of the main-road model (argmax override quirk)
        u_obs = model.policy_fns[0](world.z, pset_params[0])
        x_new = euler(world.x, u_ego)
        z_new = euler(world.z, u_obs)
        dis = jnp.maximum(
            jnp.abs(x_new[0] - z_new[0]) - 4.0,
            jnp.abs(x_new[1] - z_new[1]) - cons.W,
        )
        collided = jnp.logical_or(world.collided, dis < 0)
        new_world = MergeWorldState(
            mpc_carry=new_carry, x=x_new, z=z_new, merged=merged,
            collided=collided,
        )
        out = {"x": x_new, "z": z_new, "u": u_ego, "merged": merged}
        return new_world, out

    def init_worlds(B, key, x0=None, z0=None):
        """Worlds on the ramp around the reference start ``[24, 13, v0, -0.2]``
        (``Highway_env_branch.py:305``): along-track jitter, y/psi from the
        ref-line tables so every world starts ON the ramp. Pass ``x0``/``z0``
        (B, 4) to pin exact states (e.g. the host-env fixture)."""
        if (x0 is None) != (z0 is None):
            raise ValueError(
                "init_worlds: pass both x0 and z0 (or neither) — got "
                f"x0={'set' if x0 is not None else None}, "
                f"z0={'set' if z0 is not None else None}")
        c = init_carry(dtype)
        cs = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape), c)
        if x0 is None:
            k1, k2 = jax.random.split(key)
            xs0 = 24.0 + jax.random.uniform(k1, (B,), dtype, -6.0, 6.0)
            x0 = jnp.stack([
                xs0,
                jax.vmap(refY)(xs0).astype(dtype) + 1.8,
                jnp.full((B,), v0, dtype),
                jax.vmap(refpsi)(xs0).astype(dtype),
            ], axis=1)
            z0 = jnp.stack([
                15.0 + jax.random.uniform(k2, (B,), dtype, -5.0, 5.0),
                jnp.full((B,), (N_lane - 0.5) * LANE_W, dtype),
                jnp.full((B,), v0, dtype),
                jnp.zeros((B,), dtype),
            ], axis=1)
        return MergeWorldState(
            mpc_carry=cs, x=jnp.asarray(x0, dtype), z=jnp.asarray(z0, dtype),
            merged=jnp.zeros((jnp.asarray(x0).shape[0],), bool),
            collided=jnp.zeros((jnp.asarray(x0).shape[0],), bool),
        )

    def step_once(worlds):
        """One whole-batch env step: laneID/S/bx prep → fused CVaR solve →
        Euler world update. Exposed (``episode.step_once``) so tests can
        teacher-force world states between steps and pin the env data
        plumbing per-step against the host env."""
        merged, S, xRef, bx = jax.vmap(env_pre)(worlds)
        carrys, res = bstep(worlds.mpc_carry, worlds.x, worlds.z, xRef,
                            pset_params, S=S, bx=bx)
        new_worlds, out = jax.vmap(env_post)(worlds, merged, carrys,
                                             res.uPred[:, 0])
        out["gap"] = res.gap
        return new_worlds, out

    def episode(worlds, n_steps: int):
        """Deterministic closed loop: outer scan over time, one fused CVaR
        call per step for the whole batch. Output leaves (B, n_steps, ...)."""
        def step_t(worlds, _):
            return step_once(worlds)

        worlds, traj = jax.lax.scan(step_t, worlds, jnp.arange(n_steps))
        traj = jax.tree.map(lambda a: jnp.swapaxes(a, 0, 1), traj)
        return worlds, traj

    episode.step_once = step_once
    return topo, init_worlds, episode
