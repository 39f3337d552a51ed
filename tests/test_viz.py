"""Visualization smoke tests (Agg backend, no display).

Covers every rendering path in ``envs/viz.py``: highway snapshot, merge
snapshot (ramp lane lines + alpha predicted-pose patches), and all three
FuncAnimation paths (highway / merge / quadruped), each actually *drawn* for
a few frames via the Pillow writer so the per-frame callbacks execute
(reference ``animate_scenario``, ``Highway_env_branch.py:566-709``, and
``quadruped_env.py:243``).
"""

import matplotlib

matplotlib.use("Agg")

import numpy as np
import jax.numpy as jnp
import pytest

from belief_planning_tpu.envs.viz import (
    animate_highway,
    animate_merge,
    animate_quadruped,
    plot_highway_snapshot,
    plot_merge_snapshot,
)
from tests.test_subsystems import make_env


def _save_frames(anim, tmp_path, name):
    """Render the animation's frames for real (Pillow gif writer)."""
    from matplotlib import animation as mpl_animation

    out = tmp_path / name
    anim.save(str(out), writer=mpl_animation.PillowWriter(fps=5))
    assert out.exists() and out.stat().st_size > 0


def test_highway_snapshot_renders():
    env = make_env()
    env.step(0)
    ax = plot_highway_snapshot(env)
    # vehicle patches + tree lines drawn
    assert len(ax.patches) >= 2
    assert len(ax.lines) >= 3
    import matplotlib.pyplot as plt
    plt.close("all")


def test_highway_animation_renders(tmp_path):
    from belief_planning_tpu.envs.highway import highway_sim

    env = make_env()
    recs = highway_sim(env, T=0.3)      # 3 steps
    state_rec, _, _, _, xPred_rec, zPred_rec, _, _ = recs
    anim = animate_highway(env, state_rec, xPred_rec, zPred_rec, frames=3)
    _save_frames(anim, tmp_path, "highway.gif")
    import matplotlib.pyplot as plt
    plt.close("all")


def _make_merge_env(N=4, iters=30):
    from belief_planning_tpu.controllers.cvar_mpc import BranchMPCCVaR
    from belief_planning_tpu.envs.merge import HighwayMergeEnv, merge_ref_lines
    from belief_planning_tpu.models.policies import merge_policy_set
    from belief_planning_tpu.models.predictive import merge_model
    from belief_planning_tpu.presets import init_branch_mpc
    from belief_planning_tpu.solvers.cvar_ipm import CVaRIPMConfig
    from belief_planning_tpu.utils.config import BranchConstants

    NB, am, rm, dt = 1, 7.0, 0.3, 0.1
    N_lane, merge_lane, merge_s, merge_R, merge_side = 2, 1, 50, 300, 0
    v0 = 20.0
    cons = BranchConstants(am=am, rm=rm)
    refY, refpsi = merge_ref_lines(N_lane, merge_lane, merge_s, merge_R,
                                   merge_side)
    pset_normal = merge_policy_set(cons, v0, None)
    pset_merge = merge_policy_set(cons, v0, refpsi)
    model_normal = merge_model(cons, pset_normal, N=N, dt=dt)
    model_merge = merge_model(cons, pset_merge, N=N, dt=dt)
    xRef = np.array([0.5, 1.8, 15.0, 0.0])
    params = init_branch_mpc(4, 2, N, NB, xRef, am, rm, N_lane, cons.W)
    mpc = BranchMPCCVaR(params, model_normal, pset_normal.params, ralpha=0.1,
                        use_S=True, ipm=CVaRIPMConfig(iters=iters, gondzio=2),
                        dtype=jnp.float64)
    return HighwayMergeEnv(
        NV=2, N_lane=N_lane, mpc=mpc, models=[model_normal, model_merge],
        policy_param_sets=[pset_normal.params, pset_merge.params],
        merge_lane=merge_lane, merge_s=merge_s, merge_R=merge_R,
        merge_side=merge_side, dt=dt, cons=cons, seed=0,
    )


def test_merge_snapshot_renders():
    env = _make_merge_env()
    env.step(0)
    ax = plot_merge_snapshot(env)
    # 2 vehicle patches + alpha predicted-pose patches along the ego branches
    assert len(ax.patches) >= 3
    # tree lines + ramp/main-road lane lines (the ramp adds segments a
    # straight-lane scene never has)
    assert len(ax.lines) >= 6
    # fixed merge viewport, not the follow-cam one
    assert ax.get_ylim() == (-35.0, 5.0)
    import matplotlib.pyplot as plt
    plt.close("all")


def test_merge_animation_renders(tmp_path):
    from belief_planning_tpu.envs.highway import highway_sim

    env = _make_merge_env()
    recs = highway_sim(env, T=0.3)      # 3 steps (merge env has the same
    state_rec, _, _, _, xPred_rec, zPred_rec, _, _ = recs  # step/recorder API)
    anim = animate_merge(env, state_rec, xPred_rec, zPred_rec, frames=3)
    _save_frames(anim, tmp_path, "merge.gif")
    import matplotlib.pyplot as plt
    plt.close("all")


def test_quadruped_animation_renders(tmp_path):
    from belief_planning_tpu.controllers.branch_mpc import BranchMPCProx
    from belief_planning_tpu.envs.quadruped import QuadEnv, robot_sim
    from belief_planning_tpu.models.policies import quadruped_policy_set
    from belief_planning_tpu.models.predictive import quadruped_model
    from belief_planning_tpu.presets import init_quad_branch_mpc
    from belief_planning_tpu.solvers.tree_qp import ADMMConfig
    from belief_planning_tpu.utils.config import QuadConstants

    cons = QuadConstants()
    pset = quadruped_policy_set(v0=0.2)
    N, NB = 4, 1
    model = quadruped_model(cons, pset, N=N, dt=0.2)
    params = init_quad_branch_mpc(3, 3, N, NB, np.array([5., 5., 0.]),
                                  vxm=0.2, vym=0.1, rm=0.5)
    mpc = BranchMPCProx(params, model, pset.params,
                        admm=ADMMConfig(iters=40, polish_iters=5),
                        dtype=jnp.float32)
    x_des = np.array([5., -3., 0.])
    env = QuadEnv(NR=2, mpc=mpc, x_des=x_des, cons=cons)
    recs = robot_sim(env, T=0.6)        # 3 steps at dt=0.2
    state_rec, _, _, _, xPred_rec, zPred_rec = recs
    anim = animate_quadruped(env, state_rec, xPred_rec, zPred_rec, x_des,
                             frames=3)
    _save_frames(anim, tmp_path, "quadruped.gif")
    import matplotlib.pyplot as plt
    plt.close("all")
