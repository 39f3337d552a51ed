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
