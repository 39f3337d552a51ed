"""Batched fully-jitted ensemble environment: episode-level correctness."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from belief_planning_tpu.envs.batched_highway import make_batched_overtake
from belief_planning_tpu.models.policies import highway_policy_set
from belief_planning_tpu.models.predictive import highway_model
from belief_planning_tpu.presets import init_branch_mpc
from belief_planning_tpu.solvers.tree_qp import ADMMConfig
from belief_planning_tpu.utils.config import BranchConstants


def test_batched_overtake_episode():
    cons = BranchConstants()
    xt = np.array([0.5, 1.8, 15.0, 0.0])
    pset = highway_policy_set(cons, xt)
    model = highway_model(cons, pset, N=3, dt=0.1)
    params = init_branch_mpc(4, 2, 3, 1, xt, am=6.0, rm=0.3, N_lane=4, W=cons.W)
    admm = ADMMConfig(iters=60, polish_iters=10)
    topo, init_worlds, episode = make_batched_overtake(
        cons, model, params, "prox", admm, dtype=jnp.float32)

    B, T = 8, 8
    worlds = init_worlds(B, jax.random.key(0))
    ep = jax.jit(episode, static_argnums=2)
    worlds2, traj = ep(worlds, jax.random.key(1), T)

    assert traj["x"].shape == (B, T, 4)
    assert traj["u"].shape == (B, T, 2)
    # all worlds advance forward, inputs respect bounds
    assert np.all(np.asarray(traj["x"][:, -1, 0]) > np.asarray(worlds.x[:, 0]))
    assert np.abs(np.asarray(traj["u"][..., 0])).max() <= 6.0 + 1e-3
    assert np.abs(np.asarray(traj["u"][..., 1])).max() <= 0.3 + 1e-3
    # no collisions in this easy scenario
    assert not np.any(np.asarray(worlds2.collided))
    # determinism: same keys → identical episode
    _, traj_b = ep(worlds, jax.random.key(1), T)
    assert np.allclose(np.asarray(traj["x"]), np.asarray(traj_b["x"]))
    # random lane intent fired for at least one of 8 worlds (P(fail) ≈ 0.4%)
    assert np.any(
        np.asarray(worlds2.obs_des_y) != np.asarray(worlds.obs_des_y)
    )


def test_fused_episode_matches_vmapped_ipm():
    """The batch-last fused-IPM coupling (one controller call per step for the
    whole world batch, per-world lane-change targets via policy_in_axes) must
    reproduce the vmapped-IPM episode to solver/layout precision (f64)."""
    from belief_planning_tpu.envs.batched_highway import (
        make_batched_overtake_fused,
    )
    from belief_planning_tpu.solvers.tree_qp_ipm import QPIPMConfig

    cons = BranchConstants()
    xt = np.array([0.5, 1.8, 15.0, 0.0])
    pset = highway_policy_set(cons, xt)
    model = highway_model(cons, pset, N=3, dt=0.1)
    params = init_branch_mpc(4, 2, 3, 1, xt, am=6.0, rm=0.3, N_lane=4, W=cons.W)
    ipm = QPIPMConfig(iters=20)

    _, iw_v, ep_v = make_batched_overtake(
        cons, model, params, "prox", solver="ipm", ipm=ipm, dtype=jnp.float64)
    _, iw_f, ep_f = make_batched_overtake_fused(
        cons, model, params, "prox", ipm=ipm, backend="pl_xla",
        dtype=jnp.float64)

    B, T = 4, 6
    w_v = iw_v(B, jax.random.key(0))
    w_f = iw_f(B, jax.random.key(0))
    assert np.allclose(np.asarray(w_v.x), np.asarray(w_f.x))
    _, tv = jax.jit(ep_v, static_argnums=2)(w_v, jax.random.key(1), T)
    _, tf = jax.jit(ep_f, static_argnums=2)(w_f, jax.random.key(1), T)

    for k in ("u", "x", "z"):
        assert tf[k].shape == tv[k].shape
        assert np.allclose(np.asarray(tv[k]), np.asarray(tf[k]),
                           atol=1e-6), k


def test_batched_merge_matches_host_env():
    """The fully-jitted batched merge episode must reproduce the host
    HighwayMergeEnv step-for-step (the merge step is deterministic): same
    controller config, same initial states, ego/obstacle trajectories equal
    to solver/layout precision (f64)."""
    from belief_planning_tpu.controllers.cvar_mpc import BranchMPCCVaR
    from belief_planning_tpu.envs.batched_merge import make_batched_merge_fused
    from belief_planning_tpu.envs.merge import HighwayMergeEnv, merge_ref_lines
    from belief_planning_tpu.models.policies import merge_policy_set
    from belief_planning_tpu.models.predictive import merge_model
    from belief_planning_tpu.solvers.cvar_ipm import CVaRIPMConfig

    N, NB = 4, 1
    cons = BranchConstants(am=7.0)
    N_lane, merge_lane, merge_s, merge_R, merge_side = 2, 1, 50, 300, 0
    refY, refpsi = merge_ref_lines(N_lane, merge_lane, merge_s, merge_R,
                                   merge_side)
    pset_normal = merge_policy_set(cons, 20.0, None)
    pset_merge = merge_policy_set(cons, 20.0, refpsi)
    model_normal = merge_model(cons, pset_normal, N=N, dt=0.1)
    model_merge = merge_model(cons, pset_merge, N=N, dt=0.1)
    params = init_branch_mpc(4, 2, N, NB, np.array([0.5, 1.8, 15.0, 0.0]),
                             am=7.0, rm=0.3, N_lane=N_lane, W=cons.W)
    ipm = CVaRIPMConfig(iters=40)

    # host env driving the per-lane controller
    mpc = BranchMPCCVaR(params, model_normal, pset_normal.params, ralpha=0.1,
                        ipm=ipm, use_S=True, dtype=jnp.float64)
    env = HighwayMergeEnv(
        NV=2, N_lane=N_lane, mpc=mpc, models=[model_normal, model_merge],
        policy_param_sets=[pset_normal.params, pset_merge.params],
        merge_lane=merge_lane, merge_s=merge_s, merge_R=merge_R,
        merge_side=merge_side, dt=0.1, cons=cons,
    )
    x0 = np.stack([env.veh_set[0].state.copy(), env.veh_set[1].state.copy()])

    T = 5
    host_x, host_u = [], []
    for t in range(T):
        u_set, x_set, *_ = env.step(t)
        host_u.append(np.asarray(u_set[0]))
        host_x.append(np.asarray(x_set[0]))

    # batched episode pinned to the same initial states. B=1: the cold
    # ramp-S merge solve sits at a Mehrotra-jam knife edge (cvar_ipm.py
    # docstring) where even the batch SHAPE perturbs iterates at 1e-15
    # (XLA einsum reassociation) and the jam bifurcation amplifies it —
    # measured: B=1 vs B=2 world-0 u differs up to 1.3e-3 while both stay
    # within the 1e-3-scale closed-loop gate vs the host. So the host
    # fixture is compared at B=1 (measured max 1.8e-4 over 5 steps) at the
    # BASELINE closed-loop tolerance, and per-lane S/bx diversity is
    # exercised by a separate B=2 run.
    _, init_worlds, episode = make_batched_merge_fused(
        cons, model_normal, params, pset_normal.params, ralpha=0.1, ipm=ipm,
        use_pallas=False, N_lane=N_lane, merge_lane=merge_lane,
        merge_s=merge_s, merge_R=merge_R, merge_side=merge_side,
        dtype=jnp.float64)
    worlds = init_worlds(1, jax.random.key(0), x0=x0[0:1], z0=x0[1:2])
    worlds2, traj = jax.jit(episode, static_argnums=1)(worlds, T)

    bx = np.asarray(traj["x"][0])
    bu = np.asarray(traj["u"][0])
    assert np.allclose(bu, np.stack(host_u), atol=1e-3), (
        np.abs(bu - np.stack(host_u)).max())
    assert np.allclose(bx, np.stack(host_x), atol=1e-3), (
        np.abs(bx - np.stack(host_x)).max())

    # B=2 with a shifted second world: different ramp-frame S/bx per lane,
    # both finite and world 0 still at the closed-loop-gate scale
    xs0 = np.stack([x0[0], x0[0] + np.array([3.0, -0.4, 0.0, 0.0])])
    zs0 = np.stack([x0[1], x0[1]])
    worlds_b = init_worlds(2, jax.random.key(0), x0=xs0, z0=zs0)
    _, traj_b = jax.jit(episode, static_argnums=1)(worlds_b, T)
    assert np.all(np.isfinite(np.asarray(traj_b["x"])))
    assert np.allclose(np.asarray(traj_b["u"][0]), np.stack(host_u),
                       atol=3e-3), (
        np.abs(np.asarray(traj_b["u"][0]) - np.stack(host_u)).max())


def test_batched_merge_step_teacher_forced():
    """Per-step parity of the batched merge env vs the host env with BOTH the
    world state and the warm start FORCED from the host every step: both
    sides then solve the *identical* program (same states, same linearization
    trajectory — without warm forcing the dh[0]-floor bifurcation makes the
    programs genuinely diverge), so the applied input must agree to solver
    precision on steps where both IPMs converge — pinning the env data
    plumbing (ramp S/xRef/bx tables, policy dispatch, obstacle override) far
    harder than the episode-scale 1e-3 closed-loop gate.

    Thresholds are empirical (deterministic on the CPU/f64 suite config): at
    gaps ≤ 1e-6 the sides agree to 4e-7; at gaps ≤ 1e-5 to 4.7e-6 (gate
    2e-5). Steps where either side sits in the measured Mehrotra-jam
    bifurcation (gap pinned ~1e-3 regardless of iteration count; cvar_ipm.py
    docstring — the cold ramp-S solves at t=0,1 jam on the host side while
    the batched layout's 1e-15-different einsums converge) deviate up to
    3.3e-3 and are held only to the closed-loop scale."""
    from belief_planning_tpu.controllers.cvar_mpc import BranchMPCCVaR
    from belief_planning_tpu.envs.batched_merge import make_batched_merge_fused
    from belief_planning_tpu.envs.merge import HighwayMergeEnv, merge_ref_lines
    from belief_planning_tpu.models.policies import merge_policy_set
    from belief_planning_tpu.models.predictive import merge_model
    from belief_planning_tpu.solvers.cvar_ipm import CVaRIPMConfig

    N, NB = 4, 1
    cons = BranchConstants(am=7.0)
    N_lane, merge_lane, merge_s, merge_R, merge_side = 2, 1, 50, 300, 0
    refY, refpsi = merge_ref_lines(N_lane, merge_lane, merge_s, merge_R,
                                   merge_side)
    pset_normal = merge_policy_set(cons, 20.0, None)
    pset_merge = merge_policy_set(cons, 20.0, refpsi)
    model_normal = merge_model(cons, pset_normal, N=N, dt=0.1)
    model_merge = merge_model(cons, pset_merge, N=N, dt=0.1)
    params = init_branch_mpc(4, 2, N, NB, np.array([0.5, 1.8, 15.0, 0.0]),
                             am=7.0, rm=0.3, N_lane=N_lane, W=cons.W)
    ipm = CVaRIPMConfig(iters=200, gondzio=2)

    mpc = BranchMPCCVaR(params, model_normal, pset_normal.params, ralpha=0.1,
                        ipm=ipm, use_S=True, dtype=jnp.float64)
    env = HighwayMergeEnv(
        NV=2, N_lane=N_lane, mpc=mpc, models=[model_normal, model_merge],
        policy_param_sets=[pset_normal.params, pset_merge.params],
        merge_lane=merge_lane, merge_s=merge_s, merge_R=merge_R,
        merge_side=merge_side, dt=0.1, cons=cons,
    )

    T = 6
    host_pre, host_u, host_gap, host_carry = [], [], [], []
    for t in range(T):
        host_pre.append((env.veh_set[0].state.copy(),
                         env.veh_set[1].state.copy()))
        host_carry.append(mpc.carry)        # pre-solve warm start (immutable)
        u_set, *_ = env.step(t)
        host_u.append(np.asarray(u_set[0]))
        host_gap.append(float(np.asarray(mpc.last.gap).ravel()[0]))

    _, init_worlds, episode = make_batched_merge_fused(
        cons, model_normal, params, pset_normal.params, ralpha=0.1, ipm=ipm,
        use_pallas=False, N_lane=N_lane, merge_lane=merge_lane,
        merge_s=merge_s, merge_R=merge_R, merge_side=merge_side,
        dtype=jnp.float64)
    step1 = jax.jit(episode.step_once)
    worlds = init_worlds(1, jax.random.key(0), x0=host_pre[0][0][None],
                         z0=host_pre[0][1][None])

    tight, loose = [], []
    for t in range(T):
        carry_f = jax.tree.map(lambda a: jnp.asarray(a)[None], host_carry[t])
        worlds = worlds._replace(
            x=jnp.asarray(host_pre[t][0], jnp.float64)[None],
            z=jnp.asarray(host_pre[t][1], jnp.float64)[None],
            mpc_carry=carry_f)
        worlds, out = step1(worlds)
        du = float(np.abs(np.asarray(out["u"][0]) - host_u[t]).max())
        bgap = float(np.asarray(out["gap"]).ravel()[0])
        if max(host_gap[t], bgap) < 1e-5:
            tight.append(du)
        else:
            loose.append(du)
    assert tight, "no converged (non-jammed) steps — the tight gate is vacuous"
    assert max(tight) < 2e-5, (
        f"teacher-forced converged-step deviation {max(tight):.2e} "
        f"(tight steps: {len(tight)}/{T})")
    if loose:
        assert max(loose) < 1e-2, (
            f"jammed-step deviation {max(loose):.2e} beyond closed-loop scale")
