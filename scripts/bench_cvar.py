"""Benchmark: batched nested-CVaR branch-MPC solves/s on one chip.

Same protocol as bench.py (warm-started receding-horizon step, median of
device-fetch-timed iterations) but for the CVaR SOCP path
(controllers/cvar_mpc.py, solvers/cvar_ipm.py) on the reference overtake
configuration with ralpha=0.9 (main_branch.py:48).

Env: CVAR_B (256), CVAR_ITERS (40), CVAR_OUTER (same|f64), CVAR_X64 (0|1),
BENCH_ITERS (5).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    if os.environ.get("CVAR_X64", "0") == "1":
        jax.config.update("jax_enable_x64", True)
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

    N, NB = 8, 2
    cons = BranchConstants(s1=2, s2=3, c2=0.5, tran_diag=0.3, alpha=1, R=1.2,
                           am=6.0, rm=0.3, J_c=20, s_c=1, ylb=0., yub=7.2,
                           L=4, W=2.5, col_alpha=5, Kpsi=0.1)
    xt = np.array([0.5, 1.8, 15.0, 0.0])
    pset = highway_policy_set(cons, xt)
    model = highway_model(cons, pset, N=N, dt=0.1)
    params = init_branch_mpc(4, 2, N, NB, xt, am=6.0, rm=0.3, N_lane=4, W=cons.W)

    # Defaults (2026-08-19, B=8192 fused kernel, real v5e): gondzio=2 @ 24
    # iterations beats plain Mehrotra @ 40 on BOTH axes — 16.3k vs 14.7k
    # solves/s AND warm-gap p50 0.47 vs 0.98 (the correctors converge the
    # jam-prone lanes by ~24 iterations; see cvar_ipm.py docstring and
    # scripts/cvar_iter_study.py: f64 warm accuracy plateaus at its ~2e-3
    # oracle-agreement floor by 24 iterations with gondzio=2 vs 40 without).
    iters = int(os.environ.get("CVAR_ITERS", "24"))
    cfg = CVaRIPMConfig(iters=iters,
                        gondzio=int(os.environ.get("CVAR_GONDZIO", "2")),
                        outer_dtype=os.environ.get("CVAR_OUTER", "same"),
                        mxu=os.environ.get("CVAR_MXU", "0") == "1")
    backend = os.environ.get("BENCH_BACKEND", "vmap")
    if backend == "vmap":
        topo, _cplan, init_carry, step = make_cvar_mpc_step(
            model, params, ralpha=0.9, ipm=cfg)
        vstep = jax.jit(jax.vmap(step, in_axes=(0, 0, 0, 0, None)))
    else:  # "pl" (fused Pallas kernel) or "pl_xla" (same iteration, plain XLA)
        from belief_planning_tpu.controllers.cvar_mpc import (
            make_cvar_mpc_batched_step)

        topo, _cplan, init_carry, step = make_cvar_mpc_batched_step(
            model, params, ralpha=0.9, ipm=cfg,
            use_pallas=(backend == "pl"),
            tile_b=int(os.environ.get("BENCH_TILE_B", "128")))
        vstep = jax.jit(step)

    B = int(os.environ.get("CVAR_B", "256"))
    dtype = jnp.float32
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

    carrys, res = vstep(carrys, xs, zs, xRefs, pset.params)
    _ = np.asarray(res.uPred)

    bi = int(os.environ.get("BENCH_ITERS", "5"))
    times = []
    for _ in range(bi):
        t0 = time.perf_counter()
        carrys, res = vstep(carrys, xs, zs, xRefs, pset.params)
        _ = np.asarray(res.uPred)
        times.append(time.perf_counter() - t0)
    dt_wall = float(np.median(times))
    gap = np.asarray(res.gap, np.float64)
    print(json.dumps({
        "metric": "cvar_mpc_solves_per_sec_per_chip",
        "value": round(B / dt_wall, 1),
        "unit": "solves/s",
        "B": B, "iters": iters, "mxu": cfg.mxu,
        "gap_p50": float(np.percentile(gap, 50)),
        "gap_max": float(gap.max()),
    }))


if __name__ == "__main__":
    main()
