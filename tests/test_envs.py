"""Closed-loop environment smoke + behavior tests (highway overtake, quadruped)."""

import numpy as np
import jax.numpy as jnp
import pytest

from belief_planning_tpu.controllers.branch_mpc import BranchMPCProx
from belief_planning_tpu.envs.highway import HighwayEnv, highway_sim
from belief_planning_tpu.envs.quadruped import QuadEnv, robot_sim
from belief_planning_tpu.models.policies import highway_policy_set, quadruped_policy_set
from belief_planning_tpu.models.predictive import highway_model, quadruped_model
from belief_planning_tpu.presets import init_branch_mpc, init_quad_branch_mpc
from belief_planning_tpu.solvers.tree_qp import ADMMConfig
from belief_planning_tpu.utils.config import BranchConstants, QuadConstants


def test_highway_overtake_closed_loop():
    # small config for CPU speed; checks the full env step logic end-to-end
    N, NB = 4, 1
    cons = BranchConstants()
    xt = np.array([0.5, 1.8, 15.0, 0.0])
    pset = highway_policy_set(cons, xt)
    model = highway_model(cons, pset, N=N, dt=0.1)
    params = init_branch_mpc(4, 2, N, NB, xt, am=6.0, rm=0.3, N_lane=4, W=cons.W)
    mpc = BranchMPCProx(params, model, pset.params,
                        admm=ADMMConfig(iters=100, polish_iters=15),
                        dtype=jnp.float32)
    env = HighwayEnv(NV=2, mpc=mpc, cons=cons, lc_target=xt, N_lane=4, seed=0)
    recs = highway_sim(env, T=1.0)   # 10 steps
    state_rec, input_rec, backup_rec, choice_rec, xPred_rec, zPred_rec, w_rec, collision = recs
    assert not collision
    assert state_rec.shape == (2, 10, 4)
    assert input_rec.shape == (2, 10, 2)
    # ego inputs respect the actuation box
    assert np.abs(input_rec[0, :, 0]).max() <= 6.0 + 1e-4
    assert np.abs(input_rec[0, :, 1]).max() <= 0.3 + 1e-4
    # ego advances forward
    assert state_rec[0, -1, 0] > state_rec[0, 0, 0]
    # recorders populated
    assert len(xPred_rec[0]) == mpc.topo.n_branches - 1
    assert w_rec[0] is not None


def test_highway_nv4_respawn():
    """NV>2 scenario management + vehicle respawn (reference replace_veh,
    Highway_env_branch.py:186-225; far-vehicle check Highway_env.py:224-228).
    Seeded, deterministic."""
    N, NB = 4, 1
    cons = BranchConstants()
    xt = np.array([0.5, 1.8, 15.0, 0.0])
    pset = highway_policy_set(cons, xt)
    model = highway_model(cons, pset, N=N, dt=0.1)
    params = init_branch_mpc(4, 2, N, NB, xt, am=6.0, rm=0.3, N_lane=4, W=cons.W)
    mpc = BranchMPCProx(params, model, pset.params,
                        admm=ADMMConfig(iters=100, polish_iters=15),
                        dtype=jnp.float32)
    env = HighwayEnv(NV=4, mpc=mpc, cons=cons, lc_target=xt, N_lane=4, seed=3,
                     respawn=True)
    assert len(env.veh_set) == 4
    # extra vehicles spawned in-bounds and not overlapping
    for i in range(4):
        assert 0.0 < env.veh_set[i].state[1] < 4 * 3.6
    # direct respawn: direction=0 places the vehicle 8-13 m ahead of the ego
    ego_x = env.veh_set[0].state[0]
    assert env.replace_veh(1, 0)
    assert 8.0 <= env.veh_set[1].state[0] - ego_x <= 13.0
    assert env.replace_veh(2, 1)
    assert -13.0 <= env.veh_set[2].state[0] - ego_x <= -5.0
    assert not env.replace_veh(0)     # ego is never respawned
    recs = highway_sim(env, T=1.0)    # 10 steps with 4 vehicles + respawn
    state_rec, input_rec, *_ , collision = recs
    assert state_rec.shape == (4, 10, 4)
    # respawn keeps every obstacle within the far-vehicle window after its step
    for t in range(10):
        for i in range(1, 4):
            assert abs(state_rec[i, t, 0] - state_rec[0, t, 0]) <= 15 + 2.1
    # determinism: same seed + fresh controller reproduces the episode
    mpc2 = BranchMPCProx(params, model, pset.params,
                         admm=ADMMConfig(iters=100, polish_iters=15),
                         dtype=jnp.float32)
    env2 = HighwayEnv(NV=4, mpc=mpc2, cons=cons, lc_target=xt, N_lane=4, seed=3,
                      respawn=True)
    env2.replace_veh(1, 0)
    env2.replace_veh(2, 1)
    env2.replace_veh(0)
    recs2 = highway_sim(env2, T=1.0)
    np.testing.assert_allclose(recs2[0], state_rec, atol=1e-12)


def test_quadruped_closed_loop():
    cons = QuadConstants()
    pset = quadruped_policy_set(v0=0.2)
    N, NB = 6, 2
    model = quadruped_model(cons, pset, N=N, dt=0.2)
    params = init_quad_branch_mpc(3, 3, N, NB, np.array([5., 5., 0.]),
                                  vxm=0.2, vym=0.1, rm=0.5)
    mpc = BranchMPCProx(params, model, pset.params,
                        admm=ADMMConfig(iters=100, polish_iters=15),
                        dtype=jnp.float32)
    env = QuadEnv(NR=2, mpc=mpc, x_des=np.array([5., -3., 0.]), cons=cons)
    recs = robot_sim(env, T=2.0)    # 10 steps
    state_rec, input_rec, backup_rec, choice_rec, xPred_rec, zPred_rec = recs
    assert state_rec.shape == (2, 10, 3)
    # forward velocity respects the asymmetric box [0, vxm]
    assert input_rec[0, :, 0].max() <= 0.2 + 1e-4
    assert input_rec[0, :, 0].min() >= -1e-4
    assert np.abs(input_rec[0, :, 1]).max() <= 0.1 + 1e-4
    assert np.abs(input_rec[0, :, 2]).max() <= 0.5 + 1e-4
    # obstacle's sticky policy starts as 'forward'
    assert choice_rec[1][0] in (0, 1)
