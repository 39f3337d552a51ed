"""CVaR warm-started iteration-count study: receding-horizon parity vs iters.

The 40-iteration default is the COLD-start number. This measures the
warm-started receding-horizon accuracy (the path bench_cvar.py times): both
the oracle and our controller step along the SAME closed-loop trajectory
(advanced with the oracle's applied input, as in
tests/test_cvar_controller.py), and we record the max applied-input deviation
per step for several iteration counts.

Env: CVAR_PLATFORM=cpu|tpu (cpu), CVAR_DTYPE (f64 cpu / f32 tpu),
CVAR_ITER_LIST (12,16,20,28,40), CVAR_GONDZIO (0), STEPS (8).
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

    dtype = {"f32": jnp.float32, "f64": jnp.float64}[
        os.environ.get("CVAR_DTYPE", "f64")]
    steps = int(os.environ.get("STEPS", "8"))
    iter_list = [int(v) for v in
                 os.environ.get("CVAR_ITER_LIST", "12,16,20,28,40").split(",")]
    gondzio = int(os.environ.get("CVAR_GONDZIO", "0"))

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
    adapter = OracleModelAdapter(model, pset.params)

    def f(s, u):
        return s + np.array([s[2] * np.cos(s[3]), s[2] * np.sin(s[3]),
                             u[0], u[1]]) * 0.1

    # one oracle trajectory (u applied from the oracle's solve)
    oracle = OracleCVaRController(params, adapter, ralpha=0.9)
    x = np.array([0.0, 1.8, 20.0, 0.0])
    z = np.array([9.0, 1.8, 17.0, 0.0])
    traj = []
    for t in range(steps):
        try:
            u_o = np.asarray(oracle.solve(x, z, xRef=xRef, tol=1e-9,
                                          max_iter=300))
        except TypeError:  # status != optimal — use the final iterate
            sol = oracle.solution
            u_o = np.asarray(sol.v[oracle.totalx * 4: oracle.totalx * 4 + 2])
            oracle.uPred = sol.v[
                oracle.totalx * 4: oracle.totalx * 4
                + oracle.totalu * 2].reshape(-1, 2)
            oracle.xPred = sol.v[: oracle.totalx * 4].reshape(-1, 4)
            oracle.xLin = oracle.xPred
            oracle.uLin = np.vstack((oracle.uPred, oracle.uPred[-1]))
            oracle.OldInput = oracle.uPred[0].copy()
            print(f"  (oracle non-optimal at step {t}: {sol.status} "
                  f"gap {sol.gap:.2e})")
        traj.append((x.copy(), z.copy(), u_o.copy()))
        x = f(x, u_o)
        z = f(z, np.array([0.0, -cons.Kpsi * z[3]]))

    for iters in iter_list:
        mpc = BranchMPCCVaR(params, model, pset.params, ralpha=0.9,
                            ipm=CVaRIPMConfig(iters=iters, gondzio=gondzio),
                            dtype=dtype)
        errs = []
        for (x_t, z_t, u_o) in traj:
            u_j = np.asarray(mpc.solve(x_t, z_t, xRef=xRef), np.float64)
            errs.append(np.abs(u_j - u_o).max())
        errs = np.asarray(errs)
        print(f"iters {iters:3d} gondzio {gondzio}  per-step err "
              + " ".join(f"{e:.2e}" for e in errs)
              + f"   max {errs.max():.3e}")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
