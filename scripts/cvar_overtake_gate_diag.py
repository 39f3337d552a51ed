"""Diagnose the overtake CVaR reference-scale gate (test_reference_scale.py).

Reruns the exact gate closed loop (N=8/NB=2, 100 steps, ralpha=0.9, both
worlds driven by their own applied inputs) printing per-step: applied-input
deviation, oracle status/gap/residuals, engine gap — plus a TEACHER-FORCED
twin series (engine warm start forced from the oracle's previous solution,
the merge gate's technique) so solver error and genuine SQP bifurcation are
separated. Saves everything to /tmp/cvar_overtake_diag.npz.

Usage: python scripts/cvar_overtake_gate_diag.py [steps] [iters] [gondzio]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from belief_planning_tpu.controllers.cvar_mpc import BranchMPCCVaR
    from belief_planning_tpu.oracle.reference_cvar import OracleCVaRController
    from belief_planning_tpu.oracle.reference_tree import OracleModelAdapter
    from belief_planning_tpu.solvers.cvar_ipm import CVaRIPMConfig
    from tests.test_reference_scale import overtake_demo_setup

    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    gondzio = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    cons, pset, model, params = overtake_demo_setup()
    adapter = OracleModelAdapter(model, pset.params)
    oracle = OracleCVaRController(params, adapter, ralpha=0.9)
    mpc = BranchMPCCVaR(params, model, pset.params, ralpha=0.9,
                        ipm=CVaRIPMConfig(iters=iters, gondzio=gondzio),
                        dtype=jnp.float64)
    dt = model.dt

    def f(s, u):
        return s + np.array(
            [s[2] * np.cos(s[3]), s[2] * np.sin(s[3]), u[0], u[1]]) * dt

    def obs_u(z):
        return np.array([0.0, -cons.Kpsi * z[3]])

    x0 = np.array([0.0, 1.8, 20.0, 0.0])
    z0 = np.array([9.0, 1.8, 17.0, 0.0])
    x_o, z_o = x0.copy(), z0.copy()
    x_j, z_j = x0.copy(), z0.copy()
    rec = {k: [] for k in ("err", "err_forced", "o_gap", "o_pr", "o_dr",
                           "o_maxiter", "e_gap", "xo", "xj")}
    for t in range(steps):
        prev_u = (None if oracle.uPred is None
                  else np.asarray(oracle.uPred).copy())
        prev_old = (np.asarray(oracle.OldInput).copy()
                    if prev_u is not None else None)
        u_o = oracle.solve(x_o, z_o, params.xRef)
        sol = oracle.solution
        # forced twin: same carry trick as the merge gate (solve the oracle's
        # program — its state AND its previous solution as warm start — then
        # restore the real closed-loop carry)
        c = mpc.carry
        u_j = np.asarray(mpc.solve(x_j, z_j, params.xRef))
        c_loop = mpc.carry
        if prev_u is not None:
            mpc.carry = c._replace(
                u_lin=jnp.asarray(prev_u, c.u_lin.dtype),
                old_input=jnp.asarray(prev_old, c.old_input.dtype))
            u_f = np.asarray(mpc.solve(x_o, z_o, params.xRef))
            mpc.carry = c_loop
        else:
            u_f = u_j
        rec["err"].append(np.abs(u_o - u_j).max())
        rec["err_forced"].append(np.abs(u_o - u_f).max())
        rec["o_gap"].append(float(getattr(sol, "gap", np.nan)))
        rec["o_pr"].append(float(getattr(sol, "prim_res", np.nan)))
        rec["o_dr"].append(float(getattr(sol, "dual_res", np.nan)))
        rec["o_maxiter"].append(int(sol.status != "optimal"))
        rec["e_gap"].append(float(np.asarray(mpc.last.gap).ravel()[0]))
        rec["xo"].append(x_o.copy())
        rec["xj"].append(x_j.copy())
        print(f"t={t:3d} err={rec['err'][-1]:.3e} "
              f"forced={rec['err_forced'][-1]:.3e} "
              f"o[{sol.status} gap={rec['o_gap'][-1]:.1e} "
              f"pr={rec['o_pr'][-1]:.1e}] e_gap={rec['e_gap'][-1]:.1e}",
              flush=True)
        x_o, z_o = f(x_o, u_o), f(z_o, obs_u(z_o))
        x_j, z_j = f(x_j, u_j), f(z_j, obs_u(z_j))
    np.savez("/tmp/cvar_overtake_diag.npz",
             **{k: np.asarray(v) for k, v in rec.items()})
    e = np.asarray(rec["err"]); ef = np.asarray(rec["err_forced"])
    print(f"\nmax err {e.max():.3e} @ t={e.argmax()}; "
          f"max FORCED err {ef.max():.3e} @ t={ef.argmax()}; "
          f"oracle max_iter steps: {sum(rec['o_maxiter'])}")


if __name__ == "__main__":
    main()
