"""Solution-quality check on the hard cold-start batch: our CVaR IPM vs the
f64 oracle (reference-transcribed QCQP assembly, dense IPM).

The per-iteration duality-gap diagnostics (scripts/cvar_f32_diag.py) show the
structured IPM's gap pinning at O(0.3-1.5) on adversarial cold starts — in
f64 as well as f32. This script measures what actually matters downstream:
the applied-input error |u0 − u0_oracle| and the objective excess, using the
best-iterate returned by the solver.

Env: CVAR_PLATFORM=cpu|tpu, CVAR_B (16), CVAR_ITERS (40), CVAR_GONDZIO (0),
CVAR_SPLIT, CVAR_NBR, CVAR_DTYPE (f64 on cpu / f32 on tpu).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    if os.environ.get("CVAR_PLATFORM", "cpu") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from belief_planning_tpu.controllers.cvar_mpc import BranchMPCCVaR
    from belief_planning_tpu.models.policies import highway_policy_set
    from belief_planning_tpu.models.predictive import highway_model
    from belief_planning_tpu.oracle.reference_cvar import OracleCVaRController
    from belief_planning_tpu.oracle.reference_tree import OracleModelAdapter
    from belief_planning_tpu.presets import init_branch_mpc
    from belief_planning_tpu.solvers.cvar_ipm import CVaRIPMConfig
    from belief_planning_tpu.utils.config import BranchConstants

    B = int(os.environ.get("CVAR_B", "16"))
    iters = int(os.environ.get("CVAR_ITERS", "40"))
    dtype = {"f32": jnp.float32, "f64": jnp.float64}[
        os.environ.get("CVAR_DTYPE", "f64")]

    N, NB = 8, 2
    cons = BranchConstants(s1=2, s2=3, c2=0.5, tran_diag=0.3, alpha=1, R=1.2,
                           am=6.0, rm=0.3, J_c=20, s_c=1, ylb=0., yub=7.2,
                           L=4, W=2.5, col_alpha=5, Kpsi=0.1)
    xt = np.array([0.5, 1.8, 15.0, 0.0])
    pset = highway_policy_set(cons, xt)
    model = highway_model(cons, pset, N=N, dt=0.1)
    params = init_branch_mpc(4, 2, N, NB, xt, am=6.0, rm=0.3, N_lane=4,
                             W=cons.W)
    xRef = np.array([0., 1.8, 18., 0.])

    # same hard batch as cvar_f32_diag.py
    rng = np.random.default_rng(0)
    xs = np.array([0.0, 1.8, 20.0, 0.0]) + rng.normal(0, 0.2, (B, 4))
    xs[:, 1] = np.clip(xs[:, 1], 1.3, 13.1)
    xs[:, 3] = np.clip(xs[:, 3], -0.2, 0.2)
    zs = np.array([12.0, 1.8, 17.0, 0.0]) + rng.normal(0, 0.5, (B, 4))
    zs[:, 1] = np.clip(zs[:, 1], 1.3, 13.1)
    zs[:, 3] = np.clip(zs[:, 3], -0.2, 0.2)

    ipm = CVaRIPMConfig(
        iters=iters,
        gondzio=int(os.environ.get("CVAR_GONDZIO", "0")),
        split_step=os.environ.get("CVAR_SPLIT", "0") == "1",
        neighborhood=float(os.environ.get("CVAR_NBR", "0")),
    )
    adapter = OracleModelAdapter(model, pset.params)

    u_err, du_rel, obj_exc = [], [], []
    o_iter = int(os.environ.get("ORACLE_ITERS", "300"))
    for i in range(B):
        oracle = OracleCVaRController(params, adapter, ralpha=0.9)
        try:
            u_o = np.asarray(
                oracle.solve(xs[i], zs[i], xRef=xRef, tol=1e-9,
                             max_iter=o_iter))
            st, gap_o = oracle.solution.status, oracle.solution.gap
        except TypeError:
            # oracle declared itself infeasible (status != optimal) — use its
            # final iterate anyway for the comparison
            sol = oracle.solution
            st, gap_o = sol.status, sol.gap
            u_o = sol.v[oracle.totalx * 4: oracle.totalx * 4 + 2]
        mpc = BranchMPCCVaR(params, model, pset.params, ralpha=0.9,
                            ipm=ipm, dtype=dtype)
        u_j = np.asarray(mpc.solve(xs[i], zs[i], xRef=xRef), np.float64)
        e = np.abs(u_j - np.asarray(u_o)).max()
        u_err.append(e)
        du_rel.append(e / (1e-9 + np.abs(u_o).max()))
        print(f"lane {i:2d}  u0_err {e:10.3e}  oracle[{st} gap {gap_o:.2e}] "
              f"u_o {np.asarray(u_o)}  u_j {u_j}")
    u_err = np.asarray(u_err)
    print(f"\nB={B} iters={iters} gondzio={ipm.gondzio} "
          f"split={ipm.split_step} nbr={ipm.neighborhood} dtype={dtype}")
    print(f"u0 err: p50 {np.percentile(u_err, 50):.3e}  "
          f"p90 {np.percentile(u_err, 90):.3e}  max {u_err.max():.3e}")


if __name__ == "__main__":
    main()
