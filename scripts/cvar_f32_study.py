"""Measure CVaR IPM f32 convergence quality with/without iterative refinement.

Runs a cold-start batch of overtake CVaR solves and writes u0 / gap arrays.
Env:
  CVAR_PLATFORM=tpu|cpu   (cpu also forces float64 reference mode unless DTYPE set)
  CVAR_DTYPE=f32|f64
  CVAR_REFINE=0|1|2
  CVAR_ITERS=40
  CVAR_B=256
  CVAR_OUT=/tmp/cvar_study_<tag>.npz
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    if os.environ.get("CVAR_PLATFORM", "tpu") == "cpu":
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
    elif os.environ.get("CVAR_DTYPE", "f32") == "f64":
        jax.config.update("jax_enable_x64", True)   # emulated f64 on TPU
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from belief_planning_tpu.controllers.cvar_mpc import make_cvar_mpc_step
    from belief_planning_tpu.models.policies import highway_policy_set
    from belief_planning_tpu.models.predictive import highway_model
    from belief_planning_tpu.presets import init_branch_mpc
    from belief_planning_tpu.solvers.cvar_ipm import CVaRIPMConfig
    from belief_planning_tpu.utils.config import BranchConstants

    dtype = {"f32": jnp.float32, "f64": jnp.float64}[
        os.environ.get("CVAR_DTYPE", "f32")]
    refine = int(os.environ.get("CVAR_REFINE", "1"))
    iters = int(os.environ.get("CVAR_ITERS", "40"))
    B = int(os.environ.get("CVAR_B", "256"))

    N, NB = 8, 2
    cons = BranchConstants(s1=2, s2=3, c2=0.5, tran_diag=0.3, alpha=1, R=1.2,
                           am=6.0, rm=0.3, J_c=20, s_c=1, ylb=0., yub=7.2,
                           L=4, W=2.5, col_alpha=5, Kpsi=0.1)
    xt = np.array([0.5, 1.8, 15.0, 0.0])
    pset = highway_policy_set(cons, xt)
    model = highway_model(cons, pset, N=N, dt=0.1)
    params = init_branch_mpc(4, 2, N, NB, xt, am=6.0, rm=0.3, N_lane=4, W=cons.W)

    ipm = CVaRIPMConfig(iters=iters, refine=refine)
    topo, cplan, init_carry, step = make_cvar_mpc_step(
        model, params, ralpha=0.9, ipm=ipm)
    vstep = jax.jit(jax.vmap(step, in_axes=(0, 0, 0, 0, None)))

    rng = np.random.default_rng(0)
    xs = np.array([0.0, 1.8, 20.0, 0.0]) + rng.normal(0, 0.2, (B, 4))
    xs[:, 1] = np.clip(xs[:, 1], 1.3, 13.1)
    xs[:, 3] = np.clip(xs[:, 3], -0.2, 0.2)
    zs = np.array([12.0, 1.8, 17.0, 0.0]) + rng.normal(0, 0.5, (B, 4))
    zs[:, 1] = np.clip(zs[:, 1], 1.3, 13.1)
    zs[:, 3] = np.clip(zs[:, 3], -0.2, 0.2)
    xs = jnp.asarray(xs, dtype)
    zs = jnp.asarray(zs, dtype)
    xRefs = jnp.asarray(np.tile(np.array([0., 1.8, 18., 0.]), (B, 1)), dtype)
    c = init_carry(dtype)
    carrys = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape), c)

    t0 = time.perf_counter()
    carrys2, res = vstep(carrys, xs, zs, xRefs, pset.params)
    u_cold = np.asarray(res.uPred)
    gap_cold = np.asarray(res.gap)
    t_cold = time.perf_counter() - t0
    # one warm receding-horizon step too
    carrys3, res2 = vstep(carrys2, xs, zs, xRefs, pset.params)
    u_warm = np.asarray(res2.uPred)
    gap_warm = np.asarray(res2.gap)

    tag = (f"{os.environ.get('CVAR_PLATFORM','tpu')}_"
           f"{os.environ.get('CVAR_DTYPE','f32')}_r{refine}_i{iters}")
    out = os.environ.get("CVAR_OUT", f"/tmp/cvar_study_{tag}.npz")
    np.savez(out, u_cold=u_cold, gap_cold=gap_cold,
             u_warm=u_warm, gap_warm=gap_warm)

    def stats(g):
        g = np.asarray(g, np.float64)
        return (f"finite {np.isfinite(g).mean()*100:.1f}% "
                f"p50 {np.nanpercentile(g, 50):.3g} "
                f"p90 {np.nanpercentile(g, 90):.3g} "
                f"p99 {np.nanpercentile(g, 99):.3g} max {np.nanmax(g):.3g}")

    print(f"tag={tag} B={B} compile+cold {t_cold:.1f}s")
    print("gap cold:", stats(gap_cold))
    print("gap warm:", stats(gap_warm))
    print("wrote", out)


if __name__ == "__main__":
    main()
