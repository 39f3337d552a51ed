"""Top-level timing split of the batched branch-MPC step (real TPU).

Times three jitted programs at the bench configuration (B=2048, pl backend):
  full   — the complete step (prep + fused-IPM solve + unpack), as bench.py
  prep   — warm shift + tree build + stage-cost assembly + batch-last transform
  solve  — the fused-IPM solve alone, on pre-computed prep outputs

Run: python scripts/profile_step.py   (BENCH_BATCH / BENCH_TILE_B / PROF_TIMES)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from belief_planning_tpu.controllers.branch_mpc import (
        _cast_pytree, make_branch_mpc_batched_step)
    from belief_planning_tpu.models.policies import highway_policy_set
    from belief_planning_tpu.models.predictive import highway_model
    from belief_planning_tpu.presets import init_branch_mpc
    from belief_planning_tpu.solvers.tree_qp import assemble_stage_cost
    from belief_planning_tpu.solvers.layout import cost_to_bl, _to_bl
    from belief_planning_tpu.solvers.tree_qp_ipm import QPIPMConfig
    from belief_planning_tpu.solvers.tree_qp_pl import qp_ipm_solve_pl
    from belief_planning_tpu.solvers.tree_qp import build_stage_plan
    from belief_planning_tpu.tree.engine import build_tree, warm_shift_indices
    from belief_planning_tpu.tree.topology import build_topology
    from belief_planning_tpu.utils.config import BranchConstants

    N, NB, n, d = 8, 2, 4, 2
    dt = 0.1
    cons = BranchConstants(s1=2, s2=3, c2=0.5, tran_diag=0.3, alpha=1, R=1.2,
                           am=6.0, rm=0.3, J_c=20, s_c=1, ylb=0., yub=7.2,
                           L=4, W=2.5, col_alpha=5, Kpsi=0.1)
    xRef = np.array([0.5, 1.8, 15.0, 0.0])
    pset = highway_policy_set(cons, xRef)
    model = highway_model(cons, pset, N=N, dt=dt)
    params = init_branch_mpc(n, d, N, NB, xRef, am=6.0, rm=0.3, N_lane=4, W=cons.W)
    topo = build_topology(params.N, params.NB, model.m, params.n, params.d)
    plan = build_stage_plan(topo)
    cfg = QPIPMConfig(iters=int(os.environ.get("BENCH_IPM_ITERS", "12")))
    tile_b = int(os.environ.get("BENCH_TILE_B", "256"))
    B = int(os.environ.get("BENCH_BATCH", "2048"))
    dtype = jnp.float32

    _, init_carry, step = make_branch_mpc_batched_step(
        model, params, "prox", ipm=cfg, backend="pl",
        backend_opts={"tile_b": tile_b})
    full = jax.jit(step)

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
    carrys, _ = full(carrys, xs, zs, xRefs, pset.params)

    def prep1(carry, x, z, xRef_, policy_params):
        x = jnp.asarray(x)
        policy_params = _cast_pytree(policy_params, x.dtype)
        src_idx = warm_shift_indices(topo, carry.p)
        u_lin = jnp.where(carry.initialized, carry.u_lin[src_idx],
                          jnp.zeros_like(carry.u_lin))
        ts = build_tree(model, topo, x, jnp.asarray(z), u_lin, policy_params)
        cost = assemble_stage_cost(
            topo, ts, params.Q, params.R, params.Qf, params.dR, params.Qslack,
            jnp.asarray(xRef_), carry.old_input, variant="prox",
            replicate_quirks=True)
        return ts, cost

    @jax.jit
    def prep_b(carrys, xs, zs, xRefs, policy_params):
        ts_b, cost_b = jax.vmap(prep1, in_axes=(0, 0, 0, 0, None))(
            carrys, xs, zs, xRefs, policy_params)
        return (cost_to_bl(cost_b), _to_bl(ts_b.A), _to_bl(ts_b.Bm),
                _to_bl(ts_b.C), _to_bl(ts_b.dh), _to_bl(ts_b.h0),
                _to_bl(ts_b.x_lin), _to_bl(ts_b.u_lin))

    prep_out = prep_b(carrys, xs, zs, xRefs, pset.params)

    @jax.jit
    def solve_only(prep_out):
        cost_bl, A, Bm, C, dh, h0, xw, uw = prep_out
        x_bl, u_bl, s_bl, info = qp_ipm_solve_pl(
            plan, cost_bl, A, Bm, C, dh, h0,
            params.Fx, params.bx, params.Fu, params.bu, xw, uw, cfg,
            tile_b=tile_b)
        return u_bl

    _ = solve_only(prep_out)

    times_n = int(os.environ.get("PROF_TIMES", "10"))

    def timeit(name, fn, *args):
        out = fn(*args)
        _ = np.asarray(jax.tree.leaves(out)[0])
        ts = []
        for _i in range(times_n):
            t0 = time.perf_counter()
            out = fn(*args)
            _ = np.asarray(jax.tree.leaves(out)[0])
            ts.append(time.perf_counter() - t0)
        med = float(np.median(ts))
        print(f"{name:8s} {med*1e3:9.2f} ms", flush=True)
        return med

    print(f"B={B} tile_b={tile_b} iters={cfg.iters}", flush=True)
    t_full = timeit("full", lambda: full(carrys, xs, zs, xRefs, pset.params))
    t_prep = timeit("prep", lambda: prep_b(carrys, xs, zs, xRefs, pset.params))
    t_solve = timeit("solve", solve_only, prep_out)
    print(f"full {t_full*1e3:.1f} = prep {t_prep*1e3:.1f} + solve "
          f"{t_solve*1e3:.1f} + unpack/overhead "
          f"{(t_full-t_prep-t_solve)*1e3:.1f} ms")
    print(f"solves/s: {B/t_full:.0f}")


if __name__ == "__main__":
    main()
