"""Highway demos: overtake-then-lane-change and on-ramp merge.

Equivalent of the reference ``main_branch.py`` (``sim_overtake`` ``:20-51``,
``sim_merge`` ``:53-88``) — same scenario constants, driven by the TPU-native
CVaR branch-MPC. Run: ``python examples/main_branch.py [overtake|merge]``.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def sim_overtake(T=10.0, animate=False, seed=0):
    import jax.numpy as jnp

    from belief_planning_tpu.controllers.cvar_mpc import BranchMPCCVaR
    from belief_planning_tpu.envs.highway import HighwayEnv, highway_sim
    from belief_planning_tpu.models.policies import highway_policy_set
    from belief_planning_tpu.models.predictive import highway_model
    from belief_planning_tpu.presets import init_branch_mpc
    from belief_planning_tpu.utils.config import BranchConstants

    # reference constants (main_branch.py:24-48)
    N, NB, n, d = 8, 2, 4, 2
    am, rm, dt, N_lane = 6.0, 0.3, 0.1, 4
    xRef = np.array([0.5, 1.8, 15.0, 0.0])
    cons = BranchConstants(s1=2, s2=3, c2=0.5, tran_diag=0.3, alpha=1, R=1.2,
                           am=am, rm=rm, J_c=20, s_c=1, ylb=0., yub=7.2,
                           L=4, W=2.5, col_alpha=5, Kpsi=0.1)
    pset = highway_policy_set(cons, xRef)
    model = highway_model(cons, pset, N=N, dt=dt)
    params = init_branch_mpc(n, d, N, NB, xRef, am, rm, N_lane, cons.W)
    mpc = BranchMPCCVaR(params, model, pset.params, ralpha=0.9,
                        dtype=jnp.float32)
    env = HighwayEnv(NV=2, mpc=mpc, cons=cons, lc_target=xRef,
                     N_lane=N_lane, seed=seed)
    recs = highway_sim(env, T)
    state_rec, input_rec, *_, collision = recs
    print(f"overtake: {state_rec.shape[1]} steps, collision={collision}, "
          f"final ego X={state_rec[0, -1, 0]:.1f} m, obstacle X={state_rec[1, -1, 0]:.1f} m")
    if animate:
        from belief_planning_tpu.envs.viz import animate_highway
        animate_highway(env, state_rec, recs[4], recs[5], output="overtake.mp4")
    return recs


def sim_merge(T=6.0, seed=0, animate=False):
    import jax.numpy as jnp

    from belief_planning_tpu.controllers.cvar_mpc import BranchMPCCVaR
    from belief_planning_tpu.envs.merge import HighwayMergeEnv, merge_ref_lines
    from belief_planning_tpu.models.policies import merge_policy_set
    from belief_planning_tpu.models.predictive import merge_model
    from belief_planning_tpu.presets import init_branch_mpc
    from belief_planning_tpu.utils.config import BranchConstants

    # reference constants (main_branch.py:56-88)
    N, NB, n, d = 40, 1, 4, 2
    am, rm, dt = 7.0, 0.3, 0.1
    N_lane, merge_lane, merge_s, merge_R, merge_side = 2, 1, 50, 300, 0
    v0 = 20.0
    cons = BranchConstants(am=am, rm=rm)
    refY, refpsi = merge_ref_lines(N_lane, merge_lane, merge_s, merge_R, merge_side)
    pset_normal = merge_policy_set(cons, v0, None)
    pset_merge = merge_policy_set(cons, v0, refpsi)
    model_normal = merge_model(cons, pset_normal, N=N, dt=dt)
    model_merge = merge_model(cons, pset_merge, N=N, dt=dt)
    xRef = np.array([0.5, 1.8, 15.0, 0.0])
    params = init_branch_mpc(n, d, N, NB, xRef, am, rm, N_lane, cons.W)
    mpc = BranchMPCCVaR(params, model_normal, pset_normal.params, ralpha=0.1,
                        use_S=True, dtype=jnp.float32)
    env = HighwayMergeEnv(
        NV=2, N_lane=N_lane, mpc=mpc, models=[model_normal, model_merge],
        policy_param_sets=[pset_normal.params, pset_merge.params],
        merge_lane=merge_lane, merge_s=merge_s, merge_R=merge_R,
        merge_side=merge_side, dt=dt, cons=cons, seed=seed,
    )
    from belief_planning_tpu.envs.highway import highway_sim

    recs = highway_sim(env, T)          # merge env has the same step/recorder API
    state_rec, *_ , collision = recs
    print(f"merge: {state_rec.shape[1]} steps, collision={collision}, "
          f"final ego X={env.veh_set[0].state[0]:.1f} m, laneID={env.laneID[0]}")
    if animate:
        from belief_planning_tpu.envs.viz import animate_merge
        animate_merge(env, state_rec, recs[4], recs[5], output="merge.mp4")
    return recs


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "overtake"
    if which == "merge":
        sim_merge()
    else:
        sim_overtake()
