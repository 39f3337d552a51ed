"""Quadruped demo. Equivalent of the reference ``main_quadruped.py``:
2-robot world, ego runs BranchMPCProx toward a goal against a pedestrian-like
obstacle with forward/stop backups. Run: ``python examples/main_quadruped.py``.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main(T=40.0, ref_mode="default", animate=False):
    import jax.numpy as jnp

    from belief_planning_tpu.controllers.branch_mpc import BranchMPCProx
    from belief_planning_tpu.envs.quadruped import QuadEnv, robot_sim
    from belief_planning_tpu.models.policies import quadruped_policy_set
    from belief_planning_tpu.models.predictive import quadruped_model
    from belief_planning_tpu.presets import init_quad_branch_mpc
    from belief_planning_tpu.utils.config import QuadConstants

    # reference constants (main_quadruped.py:14-31)
    dt, NB = 0.2, 2
    vxm, vym, rm, v0 = 0.2, 0.1, 0.5, 0.2
    n, d, N = 3, 3, 25
    cons = QuadConstants(s1=2, s2=3, c2=0.5, alpha=1, R=1.2, vxm=vxm, vym=vym,
                         rm=rm, L1=0.5, W1=0.3, L2=1.0, W2=0.6, col_tol=0.2,
                         col_alpha=5)
    pset = quadruped_policy_set(v0)
    model = quadruped_model(cons, pset, N=N, dt=dt)
    xRef = np.array([5., 5., 0.])
    params = init_quad_branch_mpc(n, d, N, NB, xRef, vxm, vym, rm)
    mpc = BranchMPCProx(params, model, pset.params, dtype=jnp.float32)
    x_des = np.array([5., -3., 0.])
    env = QuadEnv(NR=2, mpc=mpc, x_des=x_des, cons=cons, ref_mode=ref_mode)
    recs = robot_sim(env, T)
    state_rec = recs[0]
    dist = np.linalg.norm(state_rec[0, -1, :2] - x_des[:2])
    print(f"quadruped ({ref_mode}): {state_rec.shape[1]} steps, "
          f"final distance to goal {dist:.2f} m")
    if animate:
        from belief_planning_tpu.envs.viz import animate_quadruped
        animate_quadruped(env, state_rec, recs[4], recs[5], x_des,
                          output="quadruped.mp4")
    return recs


if __name__ == "__main__":
    # ref_mode="ros" reproduces the quadruped_ROS_env variant (T=14 s)
    mode = sys.argv[1] if len(sys.argv) > 1 else "default"
    main(T=14.0 if mode == "ros" else 40.0, ref_mode=mode)
