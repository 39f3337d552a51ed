"""On-chip CVaR parity-grade measurement: fused f32 kernel vs emulated-f64.

Closes the round-1 verdict's "CVaR f32 hardening" item with a measured
number for the *batched fused* CVaR path (the one behind the 16-19k
solves/s bench entries): at B=256 hard cold-start lanes, compare

  - ``f32``:      fused Pallas CVaR IPM (iters=24, gondzio=2 — the tuned
                  bench config) on f32 states;
  - ``refineK``:  the parity-grade mode — same f32 kernel, f64 states
                  (solve_dtype=f32) + K-iteration emulated-f64 restart
                  (``refine_f64=K``, plain-XLA layout; default K=24 — the
                  CVaR warm-primal restart needs the gate-scale budget, not
                  the QP path's 10);
  - ``ref``:      on-chip emulated-f64 CVaR IPM-100+g2 (plain XLA, the
                  reference-scale gate's budget) — the reference-grade
                  answer the errors are measured against.

Error stats are restricted to lanes where the REFERENCE itself reached a
tight gap (<1e-5): on hard cold lanes the known cold-start Mehrotra jam
leaves part of any batch at gap O(1) for every solver (algorithmic, not
precision — cvar_ipm.py docstring), and "u0 error" against an unconverged
reference is noise. Jammed-reference lane counts are reported alongside.

Reports u0 error (p50/p90/max over tight lanes, both inputs), per-mode gap
percentiles, and ms/step for the cold solve and one warm receding-horizon
step. Run on the real chip:

    python scripts/cvar_f32_parity.py

Env: CVAR_B (256), CVAR_TILE (128), CVAR_REPS (5) timing reps,
CVAR_REF_ITERS (100), CVAR_REFINE (24), CVAR_TIGHT_GAP (1e-5).
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

    def run(tag, dtype, ipm, use_pallas, refine, solve_dtype, rcfg=None):
        topo, cplan, init_carry, step = make_cvar_mpc_batched_step(
            model, params, ralpha=0.9, ipm=ipm, use_pallas=use_pallas,
            tile_b=tile, refine_f64=refine, solve_dtype=solve_dtype,
            refine_cfg=rcfg)
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
        g_cold = np.asarray(res.gap, np.float64).ravel()
        t_compile = time.perf_counter() - t0
        carrys3, res2 = vstep(carrys2, xs, zs, xRefs, pset.params)
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            carrys3, res2 = vstep(carrys3, xs, zs, xRefs, pset.params)
            _ = np.asarray(res2.uPred)
            times.append(time.perf_counter() - t0)
        ms = float(np.median(times)) * 1e3
        # "warm" = the settled receding-horizon fixed point: after 1+reps
        # warm-started solves on identical inputs each solver has converged
        # to its own warm fixed point — the regime a deployed controller
        # lives in (a first warm step still carries the jammed-cold-solve
        # linearization and measures the cold jam twice).
        u_warm = np.asarray(res2.uPred[:, 0], np.float64)
        g_warm = np.asarray(res2.gap, np.float64).ravel()
        print(f"[{tag}] compile+cold {t_compile:.1f}s  warm-step "
              f"{ms:.1f} ms/step (B={B})  gap cold p50 "
              f"{np.percentile(g_cold, 50):.2g}/p90 "
              f"{np.percentile(g_cold, 90):.2g}  warm p50 "
              f"{np.percentile(g_warm, 50):.2g}/p90 "
              f"{np.percentile(g_warm, 90):.2g}", flush=True)
        return (u_cold, u_warm, ms, g_cold, g_warm)

    f64 = jnp.float64
    f32 = jnp.float32
    ref_iters = int(os.environ.get("CVAR_REF_ITERS", "100"))
    k_ref = int(os.environ.get("CVAR_REFINE", "24"))
    # Reference: emulated-f64 IPM with the reference-scale gate's iteration
    # budget (100+g2 — the CPU gate config that reaches gap<1e-5 on tight
    # steps; 40 iterations is NOT enough on hard cold lanes, where the known
    # cold-start Mehrotra jam leaves half the batch at gap O(1) and any
    # "error vs reference" is meaningless). Lanes where even this reference
    # stays above CVAR_TIGHT_GAP are excluded from the error stats and
    # counted separately — no truth to compare against there.
    ref_cold, ref_warm, _, rg_cold, rg_warm = run(
        f"ref f64-{ref_iters}+g2", f64,
        CVaRIPMConfig(iters=ref_iters, gondzio=2),
        use_pallas=False, refine=0, solve_dtype=None)
    a_cold, a_warm, a_ms, ag_cold, ag_warm = run(
        "f32 24+g2", f32, CVaRIPMConfig(iters=24, gondzio=2),
        use_pallas=True, refine=0, solve_dtype=None)
    b_cold, b_warm, b_ms, bg_cold, bg_warm = run(
        f"refine{k_ref}", f64, CVaRIPMConfig(iters=24, gondzio=2),
        use_pallas=True, refine=k_ref, solve_dtype=f32)
    # flipped-corrector heavy restart: the stateful path's jam-recovery
    # restart flips the Gondzio pattern (cvar_mpc.py make_cvar_mpc_step) —
    # the batched refine default re-runs the same pattern
    k2 = int(os.environ.get("CVAR_REFINE2", "60"))
    c_cold, c_warm, c_ms, cg_cold, cg_warm = run(
        f"refine{k2}g4", f64, CVaRIPMConfig(iters=24, gondzio=2),
        use_pallas=True, refine=k2, solve_dtype=f32,
        rcfg=CVaRIPMConfig(iters=k2, gondzio=4))

    tight_gap = float(os.environ.get("CVAR_TIGHT_GAP", "1e-5"))
    m_cold = rg_cold < tight_gap
    m_warm = rg_warm < tight_gap

    def stats(u, ref, mask):
        e = np.abs(u - ref).max(axis=1)[mask]
        if e.size == 0:
            return "no tight reference lanes"
        return (f"p50 {np.percentile(e, 50):.3g} "
                f"p90 {np.percentile(e, 90):.3g} max {e.max():.3g}")

    print()
    print(f"u0 error vs on-chip f64-{ref_iters}+g2 reference, on lanes where "
          f"the reference is tight (gap<{tight_gap:g}): cold "
          f"{int(m_cold.sum())}/{B}, warm {int(m_warm.sum())}/{B}")
    print(f"  f32         cold: {stats(a_cold, ref_cold, m_cold)}   "
          f"warm: {stats(a_warm, ref_warm, m_warm)}   ({a_ms:.1f} ms/step)")
    print(f"  refine{k_ref:<3d}  cold: {stats(b_cold, ref_cold, m_cold)}   "
          f"warm: {stats(b_warm, ref_warm, m_warm)}   ({b_ms:.1f} ms/step)")
    print(f"  refine{k2}g4 cold: {stats(c_cold, ref_cold, m_cold)}   "
          f"warm: {stats(c_warm, ref_warm, m_warm)}   ({c_ms:.1f} ms/step)")


if __name__ == "__main__":
    main()
