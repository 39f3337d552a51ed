"""Aux subsystems: timing, event log, checkpoint/resume round-trips."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from belief_planning_tpu.controllers.branch_mpc import BranchMPCProx, MPCCarry
from belief_planning_tpu.envs.highway import HighwayEnv, highway_sim
from belief_planning_tpu.models.policies import highway_policy_set
from belief_planning_tpu.models.predictive import highway_model
from belief_planning_tpu.presets import init_branch_mpc
from belief_planning_tpu.solvers.tree_qp import ADMMConfig
from belief_planning_tpu.utils.checkpoint import (
    load_carry,
    load_env_state,
    save_carry,
    save_env_state,
)
from belief_planning_tpu.utils.config import BranchConstants
from belief_planning_tpu.utils.timing import EventLog, StageTimer


def make_env(seed=0, iters=60):
    cons = BranchConstants()
    xt = np.array([0.5, 1.8, 15.0, 0.0])
    pset = highway_policy_set(cons, xt)
    model = highway_model(cons, pset, N=3, dt=0.1)
    params = init_branch_mpc(4, 2, 3, 1, xt, am=6.0, rm=0.3, N_lane=4, W=cons.W)
    mpc = BranchMPCProx(params, model, pset.params,
                        admm=ADMMConfig(iters=iters, polish_iters=10),
                        dtype=jnp.float64)
    return HighwayEnv(NV=2, mpc=mpc, cons=cons, lc_target=xt, N_lane=4, seed=seed)


def test_stage_timer_and_event_log(tmp_path):
    t = StageTimer()
    with t.stage("build"):
        _ = np.zeros(10)
    with t.stage("solve"):
        _ = np.zeros(10)
    with t.stage("solve"):
        _ = np.zeros(10)
    s = t.summary()
    assert s["solve"]["count"] == 2 and s["build"]["count"] == 1
    assert "solve" in t.report()

    log = EventLog(str(tmp_path / "events.jsonl"))
    log.log("solve", prim_res=1e-5, feasible=1)
    log.log("collision", agents=[0, 1])
    assert len(log.of_kind("solve")) == 1
    assert os.path.exists(log.path)


def test_carry_checkpoint_roundtrip(tmp_path):
    env = make_env()
    env.step(0)
    env.step(1)
    path = str(tmp_path / "carry.npz")
    save_carry(path, env.mpc.carry)
    c2, _ = load_carry(path, env.mpc.carry)
    for name in env.mpc.carry._fields:
        assert np.allclose(
            np.asarray(getattr(env.mpc.carry, name)), np.asarray(getattr(c2, name))
        )


def test_env_checkpoint_resume_determinism(tmp_path):
    """Resuming from a checkpoint must reproduce the uninterrupted run exactly
    (the reference cannot do this at all — unseeded RNG, no serialization)."""
    path = str(tmp_path / "snap.npz")

    env_a = make_env(seed=3)
    for t in range(2):
        env_a.step(t)
    save_env_state(path, env_a)
    for t in range(2, 4):
        env_a.step(t)
    final_a = env_a.veh_set[0].state.copy()

    env_b = make_env(seed=3)
    env_b.step(0)   # diverge the fresh env a bit first
    load_env_state(path, env_b, env_b.mpc.carry)
    for t in range(2, 4):
        env_b.step(t)
    final_b = env_b.veh_set[0].state.copy()

    assert np.allclose(final_a, final_b, atol=1e-9), (final_a, final_b)
