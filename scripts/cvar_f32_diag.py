"""Per-iteration CVaR IPM diagnostics on TPU f32: gap + step trajectories.

Runs cvar_ipm_solve directly (single tree, vmapped over a few hard lanes)
for refine in {0,1,2}; prints per-iteration median/max gap.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    if os.environ.get("CVAR_PLATFORM", "tpu") == "cpu":
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
    if os.environ.get("CVAR_X64", "0") == "1":
        jax.config.update("jax_enable_x64", True)   # for refine_dtype=f64 on TPU
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from belief_planning_tpu.models.policies import highway_policy_set
    from belief_planning_tpu.models.predictive import highway_model
    from belief_planning_tpu.presets import init_branch_mpc
    from belief_planning_tpu.solvers.cvar import build_cvar_plan
    from belief_planning_tpu.solvers.cvar_ipm import CVaRIPMConfig, cvar_ipm_solve
    from belief_planning_tpu.solvers.tree_qp import build_stage_plan
    from belief_planning_tpu.tree.engine import build_tree
    from belief_planning_tpu.tree.topology import build_topology
    from belief_planning_tpu.utils.config import BranchConstants

    dtype = {"f32": jnp.float32, "f64": jnp.float64}[
        os.environ.get("CVAR_DTYPE", "f32")]
    iters = int(os.environ.get("CVAR_ITERS", "40"))
    B = int(os.environ.get("CVAR_B", "32"))

    N, NB = 8, 2
    cons = BranchConstants(s1=2, s2=3, c2=0.5, tran_diag=0.3, alpha=1, R=1.2,
                           am=6.0, rm=0.3, J_c=20, s_c=1, ylb=0., yub=7.2,
                           L=4, W=2.5, col_alpha=5, Kpsi=0.1)
    xt = np.array([0.5, 1.8, 15.0, 0.0])
    pset = highway_policy_set(cons, xt)
    model = highway_model(cons, pset, N=N, dt=0.1)
    params = init_branch_mpc(4, 2, N, NB, xt, am=6.0, rm=0.3, N_lane=4, W=cons.W)
    topo = build_topology(params.N, params.NB, model.m, params.n, params.d)
    cplan = build_cvar_plan(
        topo, replicate_quirks=os.environ.get("CVAR_QUIRKS", "1") == "1")

    rng = np.random.default_rng(0)
    xs = np.array([0.0, 1.8, 20.0, 0.0]) + rng.normal(0, 0.2, (B, 4))
    xs[:, 1] = np.clip(xs[:, 1], 1.3, 13.1)
    xs[:, 3] = np.clip(xs[:, 3], -0.2, 0.2)
    zs = np.array([12.0, 1.8, 17.0, 0.0]) + rng.normal(0, 0.5, (B, 4))
    zs[:, 1] = np.clip(zs[:, 1], 1.3, 13.1)
    zs[:, 3] = np.clip(zs[:, 3], -0.2, 0.2)
    xs = jnp.asarray(xs, dtype)
    zs = jnp.asarray(zs, dtype)
    xRef = jnp.asarray(np.array([0., 1.8, 18., 0.]), dtype)
    u0 = jnp.zeros((topo.totalu, params.d), dtype)

    from belief_planning_tpu.controllers.branch_mpc import _cast_pytree
    pparams = _cast_pytree(pset.params, dtype)

    def solve(x, z, refine):
        ts = build_tree(model, topo, x, z, u0, pparams)
        cfg = CVaRIPMConfig(iters=iters, refine=refine,
                            refine_dtype=os.environ.get("CVAR_REFINE_DTYPE", "same"),
                            outer_dtype=os.environ.get("CVAR_OUTER_DTYPE", "same"),
                            w_max=float(os.environ.get("CVAR_WMAX", "1e12")),
                            w_max_f32=float(os.environ.get("CVAR_WMAX32", "1e6")),
                            resid=os.environ.get("CVAR_RESID", "recompute"),
                            recovery=os.environ.get("CVAR_RECOVERY", "direct"),
                            gondzio=int(os.environ.get("CVAR_GONDZIO", "0")),
                            split_step=os.environ.get("CVAR_SPLIT", "0") == "1",
                            recenter=int(os.environ.get("CVAR_RECENTER", "0")),
                            neighborhood=float(
                                os.environ.get("CVAR_NBR", "0")),
                            diag_extra=os.environ.get(
                                "CVAR_FAMDIAG", "0") == "1")
        x_f, u_f, s_f, r_f, aux = cvar_ipm_solve(
            cplan, ts, params.Q, params.R, params.Qslack, xRef, 0.9,
            params.Fx, params.bx, params.Fu, params.bu, x, cfg=cfg)
        return aux["diag"], u_f

    refines = [int(r) for r in os.environ.get("CVAR_REFINES", "0,1,2").split(",")]
    for refine in refines:
        f = jax.jit(jax.vmap(lambda x, z: solve(x, z, refine)))
        diag, u = f(xs, zs)
        diag = {k: np.asarray(v, np.float64) for k, v in diag.items()}  # (B, iters)
        gaps = diag["gap"]
        u = np.asarray(u)
        print(f"refine={refine}  final gap p50 {np.percentile(gaps[:, -1], 50):.3g} "
              f"max {gaps[:, -1].max():.3g}  u finite {np.isfinite(u).all()}")
        keys = ["gap", "a", "a_aff", "sigma", "wmax", "prim1", "rq"]
        extra = [k for k in ("a1s", "a1l", "a2s", "a2l", "a3s", "a3l",
                             "a4s", "a4l", "aqs", "aql", "cmin", "cmax")
                 if k in diag]
        for i in range(0, iters, 2):
            row = "  ".join(f"{k} {np.percentile(diag[k][:, i], 50):9.3g}"
                            for k in keys)
            print(f"  it{i:3d}  {row}")
            if extra and os.environ.get("CVAR_FAMDIAG", "0") == "1":
                row2 = "  ".join(f"{k} {np.percentile(diag[k][:, i], 50):8.2g}"
                                 for k in extra)
                print(f"         {row2}")
                if "nfin" in diag:
                    nf = diag["nfin"][:, i]
                    more = "  ".join(
                        f"{k} {np.min(diag[k][:, i]):.2g}"
                        for k in ("finK", "finW", "finZ") if k in diag)
                    more2 = "  ".join(
                        f"{k} {np.max(diag[k][:, i]):.2g}"
                        for k in ("finF", "condW") if k in diag)
                    nfa_s = (f"nfa_frac {np.mean(diag['nfa'][:, i] > 0):.2f}  "
                             if "nfa" in diag else "")
                    print(f"         nfin p50 {np.percentile(nf, 50):.0f} "
                          f"max {nf.max():.0f} frac {np.mean(nf > 0):.2f}  "
                          f"slmin {np.percentile(diag['slmin'][:, i], 0):.2g}  "
                          f"lmax {np.percentile(diag['lmax'][:, i], 100):.2g}  "
                          + nfa_s + f"{more}  {more2}")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
