"""CVaR controller closed-loop tests: overtake (receding horizon vs oracle) and
merge env smoke."""

import numpy as np
import jax.numpy as jnp
import pytest

from belief_planning_tpu.controllers.cvar_mpc import BranchMPCCVaR
from belief_planning_tpu.envs.highway import HighwayEnv, highway_sim
from belief_planning_tpu.envs.merge import HighwayMergeEnv, merge_ref_lines
from belief_planning_tpu.models.policies import highway_policy_set, merge_policy_set
from belief_planning_tpu.models.predictive import highway_model, merge_model
from belief_planning_tpu.oracle.reference_cvar import OracleCVaRController
from belief_planning_tpu.oracle.reference_tree import OracleModelAdapter
from belief_planning_tpu.presets import init_branch_mpc
from belief_planning_tpu.solvers.cvar_ipm import CVaRIPMConfig
from belief_planning_tpu.utils.config import BranchConstants

from tests.test_tree_qp import overtake_setup


def test_cvar_receding_horizon_parity():
    """Warm-started receding-horizon steps must track the oracle (1e-3 gate)."""
    cons, pset, model, params = overtake_setup(N=3, NB=1)
    adapter = OracleModelAdapter(model, pset.params)
    oracle = OracleCVaRController(params, adapter, ralpha=0.9)
    mpc = BranchMPCCVaR(params, model, pset.params, ralpha=0.9,
                        ipm=CVaRIPMConfig(iters=60), dtype=jnp.float64)
    x = np.array([0.0, 1.8, 20.0, 0.0])
    z = np.array([9.0, 1.8, 17.0, 0.0])

    def f(s, u):
        return s + np.array([s[2] * np.cos(s[3]), s[2] * np.sin(s[3]), u[0], u[1]]) * 0.1

    for t in range(4):
        u_o = oracle.solve(x, z, xRef=params.xRef)
        u_j = mpc.solve(x, z, xRef=params.xRef)
        err = np.abs(np.asarray(u_j) - u_o).max()
        assert err < 1e-3, (t, err)
        x = f(x, u_o)
        z = f(z, np.array([0.0, -cons.Kpsi * z[3]]))


def test_cvar_merge_S_parity():
    """Ramp-lane receding-horizon CVaR solves with the shear transform ``S``
    and runtime ``bx`` override must match the oracle transcription of the
    reference merge path (``MPC_branch.py:2043-2059``): the constraints and
    cone references follow the ramp geometry, not the road frame."""
    N, NB = 3, 1
    cons = BranchConstants(am=7.0)
    refY, refpsi = merge_ref_lines(2, 1, 50, 300, 0)
    pset = merge_policy_set(cons, 20.0, None)
    model = merge_model(cons, pset, N=N, dt=0.1)
    params = init_branch_mpc(4, 2, N, NB, np.array([0.5, 1.8, 15.0, 0.0]),
                             am=7.0, rm=0.3, N_lane=2, W=cons.W)
    adapter = OracleModelAdapter(model, pset.params)
    oracle = OracleCVaRController(params, adapter, ralpha=0.1)
    # α=0.1 + the shear make this cone program converge slower than the
    # overtake case: 150 iterations reaches ~5e-6 vs the 1e-3 gate (60 stalls
    # at ~3e-3 on the warm-started third step)
    mpc = BranchMPCCVaR(params, model, pset.params, ralpha=0.1,
                        ipm=CVaRIPMConfig(iters=150), use_S=True,
                        dtype=jnp.float64)
    x = np.array([24.0, 13.0, 20.0, -0.2])
    z = np.array([15.0, 5.4, 20.0, 0.0])

    def f(s, u):
        return s + np.array([s[2] * np.cos(s[3]), s[2] * np.sin(s[3]),
                             u[0], u[1]]) * 0.1

    for t in range(3):
        y0 = float(refY(x[0]))
        psi0 = float(refpsi(x[0]))
        S = np.array([[1., 0, 0, 0], [-np.tan(psi0), 1., 0, 0],
                      [0, 0, 1, 0], [0, 0, 0, 1]])
        xRef = np.array([0., -np.tan(psi0) * x[0] + y0 + 1.8, 20.0, psi0])
        bx = np.array([
            -np.tan(psi0) * x[0] + y0 + 3.6 * 1 - cons.W / 2,
            np.tan(psi0) * x[0] - y0 - cons.W / 2,
            psi0 + oracle.psimax,
            -psi0 + oracle.psimax,
        ])
        u_o = oracle.solve(x, z, xRef=xRef, S=S, bx=bx)
        u_j = mpc.solve(x, z, xRef=xRef, S=S, bx=bx)
        err = np.abs(np.asarray(u_j) - u_o).max()
        assert err < 1e-3, (t, err)
        x = f(x, u_o)
        z = f(z, np.array([0.0, -cons.Kpsi * z[3]]))


def test_cvar_overtake_env_smoke():
    """Full overtake env with the CVaR controller (the reference primary demo,
    main_branch.py:20-51) for a few steps."""
    N, NB = 4, 1
    cons = BranchConstants()
    xt = np.array([0.5, 1.8, 15.0, 0.0])
    pset = highway_policy_set(cons, xt)
    model = highway_model(cons, pset, N=N, dt=0.1)
    params = init_branch_mpc(4, 2, N, NB, xt, am=6.0, rm=0.3, N_lane=4, W=cons.W)
    mpc = BranchMPCCVaR(params, model, pset.params, ralpha=0.9,
                        ipm=CVaRIPMConfig(iters=40), dtype=jnp.float32)
    env = HighwayEnv(NV=2, mpc=mpc, cons=cons, lc_target=xt, N_lane=4, seed=0)
    recs = highway_sim(env, T=0.5)
    state_rec, input_rec, *_, collision = recs
    assert not collision
    assert np.abs(input_rec[0, :, 0]).max() <= 6.0 + 1e-3
    assert np.abs(input_rec[0, :, 1]).max() <= 0.3 + 1e-3


def test_merge_env_smoke():
    """Merge env with ramp geometry, S transform and runtime bx
    (reference sim_merge, main_branch.py:53-88)."""
    N, NB = 4, 1
    cons = BranchConstants(am=7.0)
    refY, refpsi = merge_ref_lines(2, 1, 50, 300, 0)
    pset_normal = merge_policy_set(cons, 20.0, None)
    pset_merge = merge_policy_set(cons, 20.0, refpsi)
    model_normal = merge_model(cons, pset_normal, N=N, dt=0.1)
    model_merge = merge_model(cons, pset_merge, N=N, dt=0.1)
    params = init_branch_mpc(4, 2, N, NB, np.array([0.5, 1.8, 15.0, 0.0]),
                             am=7.0, rm=0.3, N_lane=2, W=cons.W)
    mpc = BranchMPCCVaR(params, model_normal, pset_normal.params, ralpha=0.1,
                        ipm=CVaRIPMConfig(iters=40), use_S=True,
                        dtype=jnp.float32)
    env = HighwayMergeEnv(
        NV=2, N_lane=2, mpc=mpc, models=[model_normal, model_merge],
        policy_param_sets=[pset_normal.params, pset_merge.params],
        merge_lane=1, merge_s=50, merge_R=300, merge_side=0, dt=0.1, cons=cons,
    )
    for t in range(4):
        u_set, x_set, xx_set, xPred, zPred, w = env.step(t)
        assert np.all(np.isfinite(x_set[0]))
        assert abs(u_set[0][0]) <= 7.0 + 1e-3
    # ego progressed along the ramp
    assert env.veh_set[0].state[0] > 24.0
