"""Profile the batched branch-MPC step: prep (tree build + cost) vs solve.

Run on the real TPU: python scripts/profile_step.py
Env: BENCH_BATCH (default 2048), BENCH_IPM_ITERS (12), BENCH_TILE_B (256).
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
    from functools import partial

    from belief_planning_tpu.controllers.branch_mpc import (
        MPCCarry,
        _cast_pytree,
        make_branch_mpc_batched_step,
    )
    from belief_planning_tpu.models.policies import highway_policy_set
    from belief_planning_tpu.models.predictive import highway_model
    from belief_planning_tpu.presets import init_branch_mpc
    from belief_planning_tpu.solvers.tree_qp import assemble_stage_cost, build_stage_plan
    from belief_planning_tpu.solvers.tree_qp_ipm import QPIPMConfig
    from belief_planning_tpu.solvers.tree_qp_bl import cost_to_bl, _to_bl
    from belief_planning_tpu.solvers.tree_qp_pl import qp_ipm_solve_pl
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

    ipm = QPIPMConfig(iters=int(os.environ.get("BENCH_IPM_ITERS", "12")))
    tile_b = int(os.environ.get("BENCH_TILE_B", "256"))

    topo = build_topology(params.N, params.NB, model.m, params.n, params.d)
    plan = build_stage_plan(topo)
    Fx, bx, Fu, bu = params.Fx, params.bx, params.Fu, params.bu

    def prep(carry, x, z, xRef_, policy_params):
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
        ts_b, cost_b = jax.vmap(prep, in_axes=(0, 0, 0, 0, None))(
            carrys, xs, zs, xRefs, policy_params)
        return ts_b, cost_b

    @jax.jit
    def prep_b_tobl(carrys, xs, zs, xRefs, policy_params):
        ts_b, cost_b = jax.vmap(prep, in_axes=(0, 0, 0, 0, None))(
            carrys, xs, zs, xRefs, policy_params)
        return (cost_to_bl(cost_b), _to_bl(ts_b.A), _to_bl(ts_b.Bm),
                _to_bl(ts_b.C), _to_bl(ts_b.dh), _to_bl(ts_b.h0),
                _to_bl(ts_b.x_lin), _to_bl(ts_b.u_lin))

    @jax.jit
    def solve_only(cost_bl, A, Bm, C, dh, h0, x_lin, u_lin):
        return qp_ipm_solve_pl(plan, cost_bl, A, Bm, C, dh, h0,
                               Fx, bx, Fu, bu, x_lin, u_lin, ipm,
                               use_pallas=True, tile_b=tile_b)

    # build-tree only (no cost assembly)
    def build_only(carry, x, z, policy_params):
        x = jnp.asarray(x)
        policy_params = _cast_pytree(policy_params, x.dtype)
        src_idx = warm_shift_indices(topo, carry.p)
        u_lin = jnp.where(carry.initialized, carry.u_lin[src_idx],
                          jnp.zeros_like(carry.u_lin))
        return build_tree(model, topo, x, jnp.asarray(z), u_lin, policy_params)

    @jax.jit
    def build_b(carrys, xs, zs, policy_params):
        return jax.vmap(build_only, in_axes=(0, 0, 0, None))(
            carrys, xs, zs, policy_params)

    _, init_carry, step = make_branch_mpc_batched_step(
        model, params, "prox", ipm=ipm, backend="pl",
        backend_opts={"tile_b": tile_b})
    full_step = jax.jit(step)

    B = int(os.environ.get("BENCH_BATCH", "2048"))
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

    def timeit(name, fn, fetch, iters=10):
        out = fn()
        _ = np.asarray(fetch(out))
        ts = []
        for _i in range(iters):
            t0 = time.perf_counter()
            out = fn()
            _ = np.asarray(fetch(out))
            ts.append(time.perf_counter() - t0)
        med = float(np.median(ts))
        print(f"{name:28s} {med*1e3:9.2f} ms   (min {min(ts)*1e3:.2f})",
              flush=True)
        return med, out

    print(f"B={B} ipm_iters={ipm.iters} tile_b={tile_b}", flush=True)

    # warm one full step so carrys are realistic
    carrys, res = full_step(carrys, xs, zs, xRefs, pset.params)
    _ = np.asarray(res.uPred)

    t_full, _ = timeit("full step", lambda: full_step(carrys, xs, zs, xRefs, pset.params),
                       lambda o: o[1].uPred)
    t_build, _ = timeit("tree build only", lambda: build_b(carrys, xs, zs, pset.params),
                        lambda o: o.h0)
    t_prep, _ = timeit("prep (build+cost)", lambda: prep_b(carrys, xs, zs, xRefs, pset.params),
                       lambda o: o[1].qx)
    t_prepbl, prep_out = timeit("prep+to_bl", lambda: prep_b_tobl(carrys, xs, zs, xRefs, pset.params),
                                lambda o: o[5])
    t_solve, _ = timeit("solve only (pallas)", lambda: solve_only(*prep_out),
                        lambda o: o[1])

    print(f"\nsum prep+solve = {(t_prepbl + t_solve)*1e3:.2f} ms vs full {t_full*1e3:.2f} ms")
    print(f"solves/s full: {B/t_full:.0f}  | if prep were free: {B/t_solve:.0f}")


if __name__ == "__main__":
    main()
