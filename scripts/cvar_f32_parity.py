"""On-chip CVaR parity-grade measurement: fused f32 kernel vs emulated-f64.

Closes the round-1 verdict's "CVaR f32 hardening" item with a measured
number for the *batched fused* CVaR path (the one behind the 16-19k
solves/s bench entries): at B=256 hard cold-start lanes, compare

  - ``f32``:      fused Pallas CVaR IPM (iters=24, gondzio=2 — the tuned
                  bench config) on f32 states;
  - ``refine10``: the parity-grade mode — same f32 kernel, f64 states
                  (solve_dtype=f32) + 10-iteration emulated-f64 restart
                  (``refine_f64=10``, plain-XLA layout);
  - ``ref``:      on-chip emulated-f64 CVaR IPM-40+g2 (plain XLA) — the
                  reference-grade answer the errors are measured against.

Reports u0 error (p50/p90/max over lanes, both inputs) and ms/step for the
cold solve and one warm receding-horizon step. Run on the real chip:

    python scripts/cvar_f32_parity.py

Env: CVAR_B (256), CVAR_TILE (128), CVAR_REPS (5) timing reps.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_enable_x64", True)   # emulated f64 for refine/ref
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from belief_planning_tpu.controllers.cvar_mpc import (
        make_cvar_mpc_batched_step,
    )
    from belief_planning_tpu.models.policies import highway_policy_set
    from belief_planning_tpu.models.predictive import highway_model
    from belief_planning_tpu.presets import init_branch_mpc
    from belief_planning_tpu.solvers.cvar_ipm import CVaRIPMConfig
    from belief_planning_tpu.utils.config import BranchConstants

    B = int(os.environ.get("CVAR_B", "256"))
    tile = int(os.environ.get("CVAR_TILE", "128"))
    reps = int(os.environ.get("CVAR_REPS", "5"))

    N, NB = 8, 2
    cons = BranchConstants(s1=2, s2=3, c2=0.5, tran_diag=0.3, alpha=1, R=1.2,
                           am=6.0, rm=0.3, J_c=20, s_c=1, ylb=0., yub=7.2,
                           L=4, W=2.5, col_alpha=5, Kpsi=0.1)
    xt = np.array([0.5, 1.8, 15.0, 0.0])
    pset = highway_policy_set(cons, xt)
    model = highway_model(cons, pset, N=N, dt=0.1)
    params = init_branch_mpc(4, 2, N, NB, xt, am=6.0, rm=0.3, N_lane=4,
                             W=cons.W)

    rng = np.random.default_rng(0)
    xs64 = np.array([0.0, 1.8, 20.0, 0.0]) + rng.normal(0, 0.2, (B, 4))
    xs64[:, 1] = np.clip(xs64[:, 1], 1.3, 13.1)
    xs64[:, 3] = np.clip(xs64[:, 3], -0.2, 0.2)
    zs64 = np.array([12.0, 1.8, 17.0, 0.0]) + rng.normal(0, 0.5, (B, 4))
    zs64[:, 1] = np.clip(zs64[:, 1], 1.3, 13.1)
    zs64[:, 3] = np.clip(zs64[:, 3], -0.2, 0.2)
    xRefs64 = np.tile(np.array([0., 1.8, 18., 0.]), (B, 1))

    def run(tag, dtype, ipm, use_pallas, refine, solve_dtype):
        topo, cplan, init_carry, step = make_cvar_mpc_batched_step(
            model, params, ralpha=0.9, ipm=ipm, use_pallas=use_pallas,
            tile_b=tile, refine_f64=refine, solve_dtype=solve_dtype)
        vstep = jax.jit(step)
        xs = jnp.asarray(xs64, dtype)
        zs = jnp.asarray(zs64, dtype)
        xRefs = jnp.asarray(xRefs64, dtype)
        c = init_carry(dtype)
        carrys = jax.tree.map(
            lambda a: jnp.broadcast_to(a, (B,) + a.shape), c)
        t0 = time.perf_counter()
        carrys2, res = vstep(carrys, xs, zs, xRefs, pset.params)
        u_cold = np.asarray(res.uPred[:, 0], np.float64)
        t_compile = time.perf_counter() - t0
        carrys3, res2 = vstep(carrys2, xs, zs, xRefs, pset.params)
        u_warm = np.asarray(res2.uPred[:, 0], np.float64)
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            carrys3, res2 = vstep(carrys3, xs, zs, xRefs, pset.params)
            _ = np.asarray(res2.uPred)
            times.append(time.perf_counter() - t0)
        ms = float(np.median(times)) * 1e3
        print(f"[{tag}] compile+cold {t_compile:.1f}s  warm-step "
              f"{ms:.1f} ms/step (B={B})", flush=True)
        return u_cold, u_warm, ms

    f64 = jnp.float64
    f32 = jnp.float32
    ref_cold, ref_warm, _ = run(
        "ref f64-40+g2", f64, CVaRIPMConfig(iters=40, gondzio=2),
        use_pallas=False, refine=0, solve_dtype=None)
    a_cold, a_warm, a_ms = run(
        "f32 24+g2", f32, CVaRIPMConfig(iters=24, gondzio=2),
        use_pallas=True, refine=0, solve_dtype=None)
    b_cold, b_warm, b_ms = run(
        "refine10", f64, CVaRIPMConfig(iters=24, gondzio=2),
        use_pallas=True, refine=10, solve_dtype=f32)

    def stats(u, ref):
        e = np.abs(u - ref).max(axis=1)
        return (f"p50 {np.percentile(e, 50):.3g} "
                f"p90 {np.percentile(e, 90):.3g} max {e.max():.3g}")

    print()
    print(f"u0 error vs on-chip f64-40+g2 reference (B={B}):")
    print(f"  f32      cold: {stats(a_cold, ref_cold)}   "
          f"warm: {stats(a_warm, ref_warm)}   ({a_ms:.1f} ms/step)")
    print(f"  refine10 cold: {stats(b_cold, ref_cold)}   "
          f"warm: {stats(b_warm, ref_warm)}   ({b_ms:.1f} ms/step)")


if __name__ == "__main__":
    main()
