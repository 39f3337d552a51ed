"""Fully-jitted batched overtake environment — the "pod-scale batched ensemble"
configuration (BASELINE.json: 10k+ concurrent branch-MPC scenario trees).

The host-side :class:`HighwayEnv` mirrors the reference's Python control flow;
this module re-expresses the same closed loop as pure JAX so that ENTIRE
episodes (env logic + controller solves) run as one compiled program, vmapped
over thousands of independent worlds and shardable over a mesh:

- lane bookkeeping, the ego's lane-change retargeting, the overtake xRef rule
  and the obstacle's argmax-safety backup selection (``Highway_env_branch.py:
  83-184``) become ``jnp.where`` data flow;
- the obstacle's random lane-change intent (w.p. 0.5 every 10 steps) draws from
  a per-world ``jax.random`` key chain (the reference uses unseeded global
  NumPy RNG);
- the lane-change policy target is runtime data, so per-world retargeting needs
  no recompilation (the reference rebuilds its CasADi graphs, ``:117-118``).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from belief_planning_tpu.controllers.branch_mpc import make_branch_mpc_step
from belief_planning_tpu.models import policies as pol
from belief_planning_tpu.models.predictive import PredictiveModel
from belief_planning_tpu.models.safety import lane_bdry_h, veh_col
from belief_planning_tpu.solvers.tree_qp import ADMMConfig
from belief_planning_tpu.utils.config import BranchMPCParams

V0 = 20.0
LANE_W = 3.6


class WorldState(NamedTuple):
    mpc_carry: Any
    x: Any            # (4,) ego
    z: Any            # (4,) obstacle
    ego_lane: Any     # () int32
    obs_lane: Any     # () int32
    obs_des_y: Any    # () desired obstacle lane center
    lc_target: Any    # (4,) ego lane-change policy target
    collided: Any     # () bool


def make_batched_overtake(
    cons,
    model: PredictiveModel,
    params: BranchMPCParams,
    variant: str = "prox",
    admm: ADMMConfig = ADMMConfig(),
    N_lane: int = 4,
    dtype=jnp.float32,
):
    """Returns (init_worlds(B, key), episode(worlds, keys) → (worlds, traj))."""
    topo, init_carry, mpc_step = make_branch_mpc_step(model, params, variant, admm)
    dt = model.dt
    m = model.m
    n = 4
    LBsel = (cons.W / 2, N_lane * LANE_W - cons.W / 2)
    brake_sim = pol.brake_params_sim(cons.Kpsi)

    def mk_policy_params(lc_target):
        return (
            pol.MaintainParams(Kpsi=cons.Kpsi),
            pol.brake_params_mpc(cons.Kpsi),
            pol.LaneChangeParams(x_target=lc_target),
        )

    def sim_policy_u(idx, zst):
        us = jnp.stack([
            pol.maintain(zst, pol.MaintainParams(Kpsi=cons.Kpsi)),
            pol.brake(zst, brake_sim),
            pol.lane_change(zst, pol.LaneChangeParams(
                x_target=jnp.array([0., 0., V0, 0.], dtype))),
        ])
        return us[idx]

    def euler(s, u):
        return s + jnp.stack(
            [s[2] * jnp.cos(s[3]), s[2] * jnp.sin(s[3]), u[0], u[1]]
        ) * dt

    def env_step(world: WorldState, inp):
        key, t = inp
        x, z = world.x, world.z
        pp = mk_policy_params(world.lc_target)

        # lane bookkeeping (Highway_env_branch.py:96-118)
        def lane_update(state, lane):
            newlane = jnp.round((state[1] - 1.8) / LANE_W).astype(jnp.int32)
            cond = jnp.logical_or(
                t == 0,
                jnp.logical_and(newlane != lane,
                                jnp.abs(state[1] - 1.8 - LANE_W * newlane) < 1.4),
            )
            return jnp.where(cond, newlane, lane), cond

        ego_lane, _ = lane_update(x, world.ego_lane)
        obs_lane, obs_changed = lane_update(z, world.obs_lane)

        # ego lane-change retarget when the obstacle's lane assignment updates
        tgt_lane = jnp.where(
            ego_lane < obs_lane, obs_lane - 1,
            jnp.where(ego_lane > obs_lane, obs_lane + 1,
                      jnp.where(obs_lane > 0, obs_lane - 1, obs_lane + 1)),
        )
        new_lc = jnp.stack([jnp.asarray(0.0, dtype),
                            1.8 + LANE_W * tgt_lane.astype(dtype),
                            jnp.asarray(V0, dtype), jnp.asarray(0.0, dtype)])
        lc_target = jnp.where(obs_changed, new_lc, world.lc_target)
        pp = mk_policy_params(lc_target)

        # obstacle random lane intent every 10 steps w.p. 0.5 (:121-133)
        k1, k2 = jax.random.split(key)
        do_lc = jnp.logical_and(t % 10 == 0, jax.random.uniform(k1) <= 0.5)
        left = jax.random.uniform(k2) <= 0.5
        des_mid = jnp.where(left, obs_lane - 1, obs_lane + 1)
        des_lane = jnp.where(obs_lane == 0, 1,
                             jnp.where(obs_lane == N_lane - 1, N_lane - 2, des_mid))
        obs_des_y = jnp.where(do_lc, 1.8 + LANE_W * des_lane.astype(dtype),
                              world.obs_des_y)

        # obstacle backup selection (argmax of numeric-path rollout safety,
        # lane rows on the EGO branch as in the reference, :140-149)
        x1 = model.zpred(x, pp)[0]                   # ego maintain branch
        zbr = model.zpred(z, pp)                     # (m, N, 4)
        hcol = veh_col(zbr, x1[None], (cons.L + 1, cons.W + 0.2), clip=5.0)
        hlane = lane_bdry_h(x1, LBsel[0], LBsel[1])  # (N,)
        hi = jnp.minimum(jnp.min(hcol, axis=1), jnp.min(hlane))
        obs_idx = jnp.argmax(hi)
        # the obstacle tracks its desired lane via the lane-change policy when
        # it wants to change lanes; otherwise its chosen backup
        z_tgt = jnp.stack([jnp.asarray(0.0, dtype), obs_des_y,
                           jnp.asarray(V0, dtype), jnp.asarray(0.0, dtype)])
        u_obs = jnp.where(
            jnp.abs(obs_des_y - z[1]) > 0.2,
            pol.lane_change(z, pol.LaneChangeParams(x_target=z_tgt)),
            sim_policy_u(obs_idx, z),
        )

        # overtake xRef (:151-167)
        Ydes = jnp.where(x[0] < z[0], 1.8 + LANE_W * ego_lane.astype(dtype), z[1])
        done = jnp.logical_and(jnp.abs(x[1] - Ydes) < 1, x[0] > z[0] + 3)
        vdes = jnp.where(done, V0, z[2] + 1.0 * (z[0] + 1.5 - x[0]))
        xRef = jnp.stack([jnp.asarray(0.0, dtype), Ydes, vdes,
                          jnp.asarray(0.0, dtype)])

        carry, res = mpc_step(world.mpc_carry, x, z, xRef, pp)
        u_ego = res.uPred[0]
        x_new = euler(x, u_ego)
        z_new = euler(z, u_obs)
        dis = jnp.maximum(
            jnp.abs(x_new[0] - z_new[0]) - 4.0,
            jnp.abs(x_new[1] - z_new[1]) - 2.4,
        )
        collided = jnp.logical_or(world.collided, dis < 0)
        new_world = WorldState(
            mpc_carry=carry, x=x_new, z=z_new, ego_lane=ego_lane,
            obs_lane=obs_lane, obs_des_y=obs_des_y, lc_target=lc_target,
            collided=collided,
        )
        out = {"x": x_new, "z": z_new, "u": u_ego, "feasible": res.feasible}
        return new_world, out

    def init_world(key):
        c = init_carry(dtype)
        x0 = jnp.asarray([0., 1.8, V0, 0.], dtype)
        z0 = jnp.asarray([12., 5.4, 17., 0.], dtype) + jax.random.normal(key, (4,), dtype) * jnp.asarray([2., 0.1, 0.5, 0.], dtype)
        return WorldState(
            mpc_carry=c, x=x0, z=z0,
            ego_lane=jnp.asarray(0, jnp.int32), obs_lane=jnp.asarray(1, jnp.int32),
            obs_des_y=z0[1], lc_target=jnp.asarray([0.5, 1.8, 15.0, 0.], dtype),
            collided=jnp.asarray(False),
        )

    def init_worlds(B, key):
        return jax.vmap(init_world)(jax.random.split(key, B))

    def episode(worlds, key, n_steps: int):
        """Run a full closed-loop episode for every world in one program."""
        def one(world, k):
            keys = jax.random.split(k, n_steps)
            ts = jnp.arange(n_steps)
            return jax.lax.scan(env_step, world, (keys, ts))

        B = worlds.x.shape[0]
        return jax.vmap(one)(worlds, jax.random.split(key, B))

    return topo, init_worlds, episode
