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

Two controller couplings:

- :func:`make_batched_overtake` — per-world controller under ``jax.vmap``
  (ADMM or vmapped IPM); time is the inner ``lax.scan`` per world.
- :func:`make_batched_overtake_fused` — the batch-LAST fused-IPM controller
  (``make_branch_mpc_batched_step``; Pallas kernel on TPU) called once per
  env step on the whole world batch, with per-world lane-change targets via
  ``policy_in_axes``; time is the outer ``lax.scan``. This is the deployment
  configuration behind ``scripts/bench_ensemble.py``: the same kernel that
  produces bench.py's solves/s number, driving full closed loops on-chip.

Both couplings share the same env-step closures (one source of truth for the
reference semantics) and the same per-world key chains, so their trajectories
agree to solver/layout precision (``tests/test_batched_env.py``).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from belief_planning_tpu.controllers.branch_mpc import (
    make_branch_mpc_batched_step,
    make_branch_mpc_step,
)
from belief_planning_tpu.models import policies as pol
from belief_planning_tpu.models.predictive import PredictiveModel
from belief_planning_tpu.models.safety import lane_bdry_h, veh_col
from belief_planning_tpu.solvers.tree_qp import ADMMConfig
from belief_planning_tpu.solvers.tree_qp_ipm import QPIPMConfig
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


class _PreAux(NamedTuple):
    """Per-world env-step state computed BEFORE the controller call."""
    ego_lane: Any
    obs_lane: Any
    obs_des_y: Any
    lc_target: Any
    u_obs: Any


class _EnvLogic(NamedTuple):
    mk_policy_params: Any
    pre: Any          # (world, key, t) → (xRef, _PreAux)
    post: Any         # (world, aux, new_carry, u_ego, feasible) → (world, out)
    init_world: Any   # (key, mpc_carry) → WorldState


def _make_env_logic(cons, model: PredictiveModel, N_lane: int, dtype) -> _EnvLogic:
    """Per-world overtake env-step closures, shared by both controller
    couplings (reference semantics: ``Highway_env_branch.py:83-184``)."""
    dt = model.dt
    LBsel = (cons.W / 2, N_lane * LANE_W - cons.W / 2)
    brake_sim = pol.brake_params_sim(cons.Kpsi)

    def mk_policy_params(lc_target):
        return (
            pol.MaintainParams(Kpsi=cons.Kpsi),
            pol.brake_params_mpc(cons.Kpsi),
            pol.LaneChangeParams(x_target=lc_target),
        )

    def sim_policy_u(idx, zst, lc_target):
        """Numeric-path backup policies (reference ``backupcons``: maintain /
        brake / lane-change toward the EGO's current retarget — the lc entry
        tracks ``xRef_lc``, not the obstacle's own desired lane,
        ``Highway_env_branch.py:117,149``)."""
        us = jnp.stack([
            pol.maintain(zst, pol.MaintainParams(Kpsi=cons.Kpsi)),
            pol.brake(zst, brake_sim),
            pol.lane_change(zst, pol.LaneChangeParams(x_target=lc_target)),
        ])
        return us[idx]

    def euler(s, u):
        return s + jnp.stack(
            [s[2] * jnp.cos(s[3]), s[2] * jnp.sin(s[3]), u[0], u[1]]
        ) * dt

    def pre(world: WorldState, key, t):
        x, z = world.x, world.z

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

        # obstacle random lane intent every 10 steps w.p. 0.5 (:121-133).
        # NOTE: like the reference, ``desired_x`` is vestigial in the branch
        # env — the obstacle's APPLIED input is always its argmax-safety
        # backup (:145-149); the intent state is recorded but never drives it.
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
        u_obs = sim_policy_u(obs_idx, z, lc_target)

        # overtake xRef (:151-167)
        Ydes = jnp.where(x[0] < z[0], 1.8 + LANE_W * ego_lane.astype(dtype), z[1])
        done = jnp.logical_and(jnp.abs(x[1] - Ydes) < 1, x[0] > z[0] + 3)
        vdes = jnp.where(done, V0, z[2] + 1.0 * (z[0] + 1.5 - x[0]))
        xRef = jnp.stack([jnp.asarray(0.0, dtype), Ydes, vdes,
                          jnp.asarray(0.0, dtype)])

        aux = _PreAux(ego_lane=ego_lane, obs_lane=obs_lane, obs_des_y=obs_des_y,
                      lc_target=lc_target, u_obs=u_obs)
        return xRef, aux

    def post(world: WorldState, aux: _PreAux, new_carry, u_ego, feasible):
        x_new = euler(world.x, u_ego)
        z_new = euler(world.z, aux.u_obs)
        dis = jnp.maximum(
            jnp.abs(x_new[0] - z_new[0]) - 4.0,
            jnp.abs(x_new[1] - z_new[1]) - 2.4,
        )
        collided = jnp.logical_or(world.collided, dis < 0)
        new_world = WorldState(
            mpc_carry=new_carry, x=x_new, z=z_new, ego_lane=aux.ego_lane,
            obs_lane=aux.obs_lane, obs_des_y=aux.obs_des_y,
            lc_target=aux.lc_target, collided=collided,
        )
        out = {"x": x_new, "z": z_new, "u": u_ego, "feasible": feasible}
        return new_world, out

    def init_world(key, mpc_carry):
        x0 = jnp.asarray([0., 1.8, V0, 0.], dtype)
        z0 = jnp.asarray([12., 5.4, 17., 0.], dtype) + jax.random.normal(key, (4,), dtype) * jnp.asarray([2., 0.1, 0.5, 0.], dtype)
        return WorldState(
            mpc_carry=mpc_carry, x=x0, z=z0,
            ego_lane=jnp.asarray(0, jnp.int32), obs_lane=jnp.asarray(1, jnp.int32),
            obs_des_y=z0[1], lc_target=jnp.asarray([0.5, 1.8, 15.0, 0.], dtype),
            collided=jnp.asarray(False),
        )

    return _EnvLogic(mk_policy_params=mk_policy_params, pre=pre, post=post,
                     init_world=init_world)


def make_batched_overtake(
    cons,
    model: PredictiveModel,
    params: BranchMPCParams,
    variant: str = "prox",
    admm: ADMMConfig = ADMMConfig(),
    N_lane: int = 4,
    dtype=jnp.float32,
    solver: str = "ipm",
    ipm: QPIPMConfig = QPIPMConfig(),
):
    """Returns (topo, init_worlds(B, key), episode(worlds, key, n_steps)).

    Per-world controller under ``jax.vmap``: ``solver="ipm"`` (default, the
    vmapped twin of the fused path — layout-parity baseline) or ``"admm"``
    for OSQP-equivalent numerics via the ``admm`` config."""
    topo, init_carry, mpc_step = make_branch_mpc_step(
        model, params, variant, admm, solver=solver, ipm=ipm)
    logic = _make_env_logic(cons, model, N_lane, dtype)

    def env_step(world: WorldState, inp):
        key, t = inp
        xRef, aux = logic.pre(world, key, t)
        pp = logic.mk_policy_params(aux.lc_target)
        carry, res = mpc_step(world.mpc_carry, world.x, world.z, xRef, pp)
        return logic.post(world, aux, carry, res.uPred[0], res.feasible)

    def init_worlds(B, key):
        c = init_carry(dtype)
        return jax.vmap(lambda k: logic.init_world(k, c))(
            jax.random.split(key, B))

    def episode(worlds, key, n_steps: int):
        """Run a full closed-loop episode for every world in one program."""
        def one(world, k):
            keys = jax.random.split(k, n_steps)
            ts = jnp.arange(n_steps)
            return jax.lax.scan(env_step, world, (keys, ts))

        B = worlds.x.shape[0]
        return jax.vmap(one)(worlds, jax.random.split(key, B))

    return topo, init_worlds, episode


def make_batched_overtake_fused(
    cons,
    model: PredictiveModel,
    params: BranchMPCParams,
    variant: str = "prox",
    ipm: QPIPMConfig = QPIPMConfig(),
    backend: str = "pl",
    backend_opts=None,
    N_lane: int = 4,
    dtype=jnp.float32,
    **step_kwargs,
):
    """Batch-last fused-IPM coupling: ONE controller call per env step for the
    whole world batch (the Pallas fused-iteration kernel on TPU), per-world
    lane-change targets as runtime data via ``policy_in_axes``.

    Same env semantics and per-world key chains as
    :func:`make_batched_overtake`; trajectories agree with the vmapped-IPM
    coupling to solver/layout precision. ``step_kwargs`` forward to
    ``make_branch_mpc_batched_step`` (``prep_dtype``, ``refine_f64``, ...).

    Returns (topo, init_worlds(B, key), episode(worlds, key, n_steps))."""
    policy_axes = (
        pol.MaintainParams(Kpsi=None, psiref=None),
        pol.BrakeParams(Kpsi=None, a_brake=None, gamma=None, psiref=None),
        pol.LaneChangeParams(x_target=0),
    )
    topo, init_carry, bstep = make_branch_mpc_batched_step(
        model, params, variant, ipm=ipm, backend=backend,
        backend_opts=backend_opts, policy_in_axes=policy_axes, **step_kwargs)
    logic = _make_env_logic(cons, model, N_lane, dtype)

    def init_worlds(B, key):
        c = init_carry(dtype)
        cs = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape), c)
        ws = jax.vmap(lambda k: logic.init_world(k, None))(
            jax.random.split(key, B))
        return ws._replace(mpc_carry=cs)

    def episode(worlds, key, n_steps: int):
        """Whole-batch closed loop: outer scan over time, one fused controller
        call per step. Output leaves are (B, n_steps, ...) like the vmapped
        episode."""
        B = worlds.x.shape[0]
        keys_b = jax.random.split(key, B)
        # per-world key chains identical to the vmapped episode's
        keys_tb = jnp.swapaxes(
            jax.vmap(lambda k: jax.random.split(k, n_steps))(keys_b), 0, 1)
        ts = jnp.arange(n_steps)

        def step_t(worlds, inp):
            keys, t = inp
            xRefs, aux = jax.vmap(logic.pre, in_axes=(0, 0, None))(
                worlds, keys, t)
            pp = logic.mk_policy_params(aux.lc_target)   # x_target: (B, 4)
            carrys, res = bstep(worlds.mpc_carry, worlds.x, worlds.z,
                                xRefs, pp)
            return jax.vmap(logic.post)(worlds, aux, carrys,
                                        res.uPred[:, 0], res.feasible)

        worlds, traj = jax.lax.scan(step_t, worlds, (keys_tb, ts))
        traj = jax.tree.map(lambda a: jnp.swapaxes(a, 0, 1), traj)
        return worlds, traj

    return topo, init_worlds, episode
