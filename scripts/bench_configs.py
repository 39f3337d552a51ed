"""On-chip bench for the non-overtake reference configs of BASELINE.json.

Emits one JSON line per config (same shape as bench.py):

- ``merge``:     N=40, NB=1 nested-CVaR with the ramp shear transform S and
                 runtime bx override (reference ``main_branch.py:56-88``) —
                 fused Pallas CVaR IPM, batch-last.
- ``quadruped``: N=25, NB=2 prox-QP with dR rate coupling, d=3
                 (reference ``main_quadruped.py:14-31``) — fused Pallas
                 IPM, batch-last.

Run: ``python scripts/bench_configs.py [merge|quadruped|all]``.
Env: BENCH_BATCH / BENCH_ITERS / BENCH_TILE_B / BENCH_BACKEND overrides as in
bench.py (backend "pl" fused kernel by default, "pl_xla" for the XLA twin).
Timing uses a device→host fetch (np.asarray) — through the tunneled runtime,
block_until_ready can return before execution finishes.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

BASELINE_PER_CHIP = 10000.0 / 16.0


def _timed(vstep, carrys, args, iters):
    carrys, res = vstep(carrys, *args)
    _ = np.asarray(res.uPred)
    times = []
    for _i in range(iters):
        t0 = time.perf_counter()
        carrys, res = vstep(carrys, *args)
        _ = np.asarray(res.uPred)
        times.append(time.perf_counter() - t0)
    return float(np.median(times)), res


def _pct(a, qs=(50, 90, 100)):
    a = np.asarray(a, np.float64).ravel()
    return {f"p{q}": round(float(np.percentile(a, q)), 8) for q in qs}


def bench_merge():
    """Merge-config CVaR bench + ACCURACY columns (VERDICT r3 item 3): the
    throughput row is the f32 fused kernel; with BENCH_ACC=1 (default) a
    Bacc-lane probe reports u0-error vs the full-f64 solver and gap
    percentiles for both the plain f32 kernel and f32+refine_f64 — the CVaR
    mirror of the QP path's PARITY.md refine story — plus the refine-mode
    p50 latency at the probe batch."""
    import jax

    acc = os.environ.get("BENCH_ACC", "1") != "0"
    if acc:
        jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp

    from belief_planning_tpu.controllers.cvar_mpc import make_cvar_mpc_batched_step
    from belief_planning_tpu.envs.merge import merge_ref_lines
    from belief_planning_tpu.models.policies import merge_policy_set
    from belief_planning_tpu.models.predictive import merge_model
    from belief_planning_tpu.presets import init_branch_mpc
    from belief_planning_tpu.solvers.cvar_ipm import CVaRIPMConfig
    from belief_planning_tpu.utils.config import BranchConstants

    N, NB = 40, 1
    am, rm, dt = 7.0, 0.3, 0.1
    N_lane, merge_lane, merge_s, merge_R, merge_side = 2, 1, 50, 300, 0
    v0 = 20.0
    cons = BranchConstants(am=am, rm=rm)
    refY, refpsi = merge_ref_lines(N_lane, merge_lane, merge_s, merge_R, merge_side)
    pset = merge_policy_set(cons, v0, None)
    model = merge_model(cons, pset, N=N, dt=dt)
    xRef0 = np.array([0.5, 1.8, 15.0, 0.0])
    params = init_branch_mpc(4, 2, N, NB, xRef0, am, rm, N_lane, cons.W)

    ipm = CVaRIPMConfig(iters=int(os.environ.get("BENCH_CVAR_ITERS", "24")),
                        gondzio=int(os.environ.get("BENCH_GONDZIO", "2")))
    backend = os.environ.get("BENCH_BACKEND", "pl")
    topo, cplan, init_carry, step = make_cvar_mpc_batched_step(
        model, params, ralpha=0.1, ipm=ipm, use_pallas=(backend == "pl"),
        tile_b=int(os.environ.get("BENCH_TILE_B", "128")), use_S=True)
    vstep = jax.jit(step)

    B = int(os.environ.get("BENCH_BATCH", "4096"))
    dtype = jnp.float32
    rng = np.random.default_rng(0)
    # lanes spread along the ramp: each gets its own shear S(psi0) + bx, the
    # geometry the env computes per step (envs/merge.py:154-171)
    x0 = np.array([30.0, 13.0, v0, -0.1]) + rng.normal(0, 0.5, (B, 4))
    x0[:, 3] = np.clip(x0[:, 3], -0.2, 0.0)
    zs = np.array([15.0, 5.4, v0, 0.0]) + rng.normal(0, 0.5, (B, 4))
    psi0 = np.asarray(refpsi(x0[:, 0]))
    y0 = np.asarray(refY(x0[:, 0]))
    S = np.tile(np.eye(4), (B, 1, 1))
    S[:, 1, 0] = -np.tan(psi0)
    xRefs = np.stack([np.zeros(B), -np.tan(psi0) * x0[:, 0] + y0 + 1.8,
                      np.full(B, v0), psi0], axis=1)
    bx = np.stack([
        -np.tan(psi0) * x0[:, 0] + y0 + 3.6 * merge_lane - cons.W / 2,
        np.tan(psi0) * x0[:, 0] - y0 - cons.W / 2,
        psi0 + 0.25, -psi0 + 0.25], axis=1)

    xs = jnp.asarray(x0, dtype)
    zs = jnp.asarray(zs, dtype)
    xRefs = jnp.asarray(xRefs, dtype)
    S = jnp.asarray(S, dtype)
    bx = jnp.asarray(bx, dtype)
    c = init_carry(dtype)
    carrys = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape), c)

    dt_wall, res = _timed(vstep, carrys, (xs, zs, xRefs, pset.params, S, bx),
                          int(os.environ.get("BENCH_ITERS", "5")))
    sps = B / dt_wall
    out = {
        "metric": "merge_cvar_solves_per_sec_per_chip",
        "config": {"N": N, "NB": NB, "ralpha": 0.1, "use_S": True, "B": B,
                   "iters": ipm.iters, "gondzio": ipm.gondzio,
                   "backend": backend},
        "value": round(sps, 1), "unit": "solves/s",
        "vs_baseline": round(sps / BASELINE_PER_CHIP, 3),
    }

    if acc:
        Bacc = int(os.environ.get("BENCH_ACC_BATCH", "256"))
        k_ref = int(os.environ.get("BENCH_REFINE", "8"))
        f64 = jnp.float64
        xs_a, zs_a = jnp.asarray(xs[:Bacc], f64), jnp.asarray(zs[:Bacc], f64)
        xR_a, S_a = jnp.asarray(xRefs[:Bacc], f64), jnp.asarray(S[:Bacc], f64)
        bx_a = jnp.asarray(bx[:Bacc], f64)
        args_a = (xs_a, zs_a, xR_a, pset.params, S_a, bx_a)

        def cold(init, dtype):
            c = init(dtype)
            return jax.tree.map(
                lambda a: jnp.broadcast_to(a, (Bacc,) + a.shape), c)

        # plain f32 kernel, cold, on the probe subset (`carrys` is still the
        # cold broadcast carry — _timed rebinds only its local)
        _, res32 = jax.jit(step)(
            jax.tree.map(lambda a: a[:Bacc], carrys),
            xs[:Bacc], zs[:Bacc], xRefs[:Bacc], pset.params, S[:Bacc],
            bx[:Bacc])
        # f32 + f64 barrier-restart refine (parity-grade on-chip mode)
        _, _, init_r, step_r = make_cvar_mpc_batched_step(
            model, params, ralpha=0.1, ipm=ipm, use_pallas=(backend == "pl"),
            tile_b=int(os.environ.get("BENCH_TILE_B", "128")), use_S=True,
            refine_f64=k_ref, solve_dtype=jnp.float32)
        vstep_r = jax.jit(step_r)
        lat_r, res_r = _timed(vstep_r, cold(init_r, f64), args_a, 3)
        # full-f64 reference solver (XLA twin; TPU-emulated f64)
        _, _, init_64, step_64 = make_cvar_mpc_batched_step(
            model, params, ralpha=0.1,
            ipm=CVaRIPMConfig(iters=int(os.environ.get("BENCH_F64_ITERS",
                                                       "40")), gondzio=2),
            use_pallas=False, use_S=True)
        _, res64 = jax.jit(step_64)(cold(init_64, f64), *args_a)

        u32 = np.asarray(res32.uPred[:, 0], np.float64)
        u_r = np.asarray(res_r.uPred[:, 0], np.float64)
        u64 = np.asarray(res64.uPred[:, 0], np.float64)
        out["accuracy"] = {
            "probe_batch": Bacc, "refine_iters": k_ref,
            "u0_err_f32": _pct(np.abs(u32 - u64).max(axis=1)),
            "u0_err_refine": _pct(np.abs(u_r - u64).max(axis=1)),
            "gap_f32": _pct(res32.gap, (50, 99)),
            "gap_refine": _pct(res_r.gap, (50, 99)),
            "gap_f64": _pct(res64.gap, (50, 99)),
            "refine_latency_p50_ms": round(lat_r * 1e3, 2),
        }

    print(json.dumps(out), flush=True)


def bench_quadruped():
    import jax
    import jax.numpy as jnp

    from belief_planning_tpu.controllers.branch_mpc import (
        make_branch_mpc_batched_step,
    )
    from belief_planning_tpu.models.policies import quadruped_policy_set
    from belief_planning_tpu.models.predictive import quadruped_model
    from belief_planning_tpu.presets import init_quad_branch_mpc
    from belief_planning_tpu.solvers.tree_qp_ipm import QPIPMConfig
    from belief_planning_tpu.utils.config import QuadConstants

    dt, NB = 0.2, 2
    vxm, vym, rm, v0 = 0.2, 0.1, 0.5, 0.2
    n, d, N = 3, 3, 25
    cons = QuadConstants(s1=2, s2=3, c2=0.5, alpha=1, R=1.2, vxm=vxm, vym=vym,
                         rm=rm, L1=0.5, W1=0.3, L2=1.0, W2=0.6, col_tol=0.2,
                         col_alpha=5)
    pset = quadruped_policy_set(v0)
    model = quadruped_model(cons, pset, N=N, dt=dt)
    params = init_quad_branch_mpc(n, d, N, NB, np.array([5., 5., 0.]),
                                  vxm, vym, rm)

    ipm = QPIPMConfig(iters=int(os.environ.get("BENCH_IPM_ITERS", "8")),
                      gondzio=int(os.environ.get("BENCH_GONDZIO", "2")))
    backend = os.environ.get("BENCH_BACKEND", "pl")
    topo, init_carry, step = make_branch_mpc_batched_step(
        model, params, "prox", ipm=ipm, backend=backend,
        backend_opts={"tile_b": int(os.environ.get("BENCH_TILE_B", "128"))}
        if backend == "pl" else None)
    vstep = jax.jit(step)

    B = int(os.environ.get("BENCH_BATCH", "8192"))
    dtype = jnp.float32
    rng = np.random.default_rng(0)
    xs = np.array([0.0, 1.8, 0.0]) + rng.normal(0, 0.3, (B, 3))
    zs = np.array([2.5, 2.5, -np.pi / 2]) + rng.normal(0, 0.3, (B, 3))
    xRefs = np.tile(np.array([5., 5., 0.]), (B, 1))
    xs, zs, xRefs = (jnp.asarray(a, dtype) for a in (xs, zs, xRefs))
    c = init_carry(dtype)
    carrys = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape), c)

    dt_wall, res = _timed(vstep, carrys, (xs, zs, xRefs, pset.params),
                          int(os.environ.get("BENCH_ITERS", "5")))
    sps = B / dt_wall
    print(json.dumps({
        "metric": "quadruped_qp_solves_per_sec_per_chip",
        "config": {"N": N, "NB": NB, "d": d, "B": B, "iters": ipm.iters,
                   "gondzio": ipm.gondzio, "backend": backend},
        "value": round(sps, 1), "unit": "solves/s",
        "vs_baseline": round(sps / BASELINE_PER_CHIP, 3),
    }), flush=True)


def bench_hmm():
    """Batched HMM-belief MPC ensemble (the legacy pipeline's batched story:
    M=1 obstacle, m=2 policies, N=6 — ``PredictiveControllers.py`` semantics;
    belief-gated rows keep the program static, so the whole ensemble is one
    vmapped Riccati-IPM program)."""
    import jax
    import jax.numpy as jnp

    from belief_planning_tpu.controllers.hmm_mpc import make_hmm_mpc_batched_step
    from belief_planning_tpu.models import policies as P
    from belief_planning_tpu.models.hmm import HMMPredictiveModel
    from belief_planning_tpu.presets import init_mpc_params
    from belief_planning_tpu.solvers.tree_qp_ipm import QPIPMConfig
    from belief_planning_tpu.utils.config import HMMConstants

    M, m, N, nx, d = 1, 2, 6, 4, 2
    cons = HMMConstants(am=6.0, rm=0.3)
    fns = (P.maintain, P.brake)
    pp = (P.MaintainParams(Kpsi=cons.Kpsi), P.brake_params_sim(cons.Kpsi))
    model = HMMPredictiveModel(nx=nx, d=d, M=M, m=m, dt=0.1, cons=cons,
                               policy_fns=fns, policy_params=pp)
    params = init_mpc_params(nx, d, N, M, m, ydes=1.8, vdes=15.0, am=6.0,
                             rm=0.3, N_lane=6, W=2.4)

    ipm = QPIPMConfig(iters=int(os.environ.get("BENCH_IPM_ITERS", "8")),
                      gondzio=int(os.environ.get("BENCH_GONDZIO", "2")))
    topo, init_batched, bstep = make_hmm_mpc_batched_step(model, params,
                                                          ipm=ipm)

    B = int(os.environ.get("BENCH_BATCH", "4096"))
    dtype = jnp.float32
    rng = np.random.default_rng(0)
    x0s = np.array([0.0, 1.8, 15.0, 0.0]) + rng.normal(0, 0.2, (B, nx))
    b0s = rng.uniform(0.2, 0.8, (B, M, m))
    b0s = b0s / b0s.sum(axis=2, keepdims=True)
    z = np.array([14.0, 1.8, 10.0, 0.0])
    steps = (np.arange(N) + 1)[None, :, None, None] * 0.1
    vels = np.stack([np.array([10., 0, 0, 0]), np.array([8., 0, 0, 0])])
    xbk = z[None, None, None, :] + steps * vels[None, None, :, :]
    xbackups = np.broadcast_to(xbk, (B, N, M * m, nx)).copy()
    xbackups += rng.normal(0, 0.1, xbackups.shape)
    xRef = np.concatenate([np.array([0., 1.8, 15., 0.]), np.zeros(M * m)])

    x0s, b0s, xbackups, xRef = (jnp.asarray(a, dtype)
                                for a in (x0s, b0s, xbackups, xRef))
    carrys = init_batched(B, dtype)
    dt_wall, res = _timed(bstep, carrys, (x0s, b0s, xbackups, xRef),
                          int(os.environ.get("BENCH_ITERS", "5")))
    sps = B / dt_wall
    feas = float(np.asarray(res.feasible, np.float32).mean())
    print(json.dumps({
        "metric": "hmm_belief_mpc_solves_per_sec_per_chip",
        "config": {"N": N, "M": M, "m": m, "B": B, "iters": ipm.iters,
                   "gondzio": ipm.gondzio},
        "value": round(sps, 1), "unit": "solves/s",
        "vs_baseline": round(sps / BASELINE_PER_CHIP, 3),
        "feasible_frac": round(feas, 4),
    }), flush=True)


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("merge", "all"):
        bench_merge()
    if which in ("quadruped", "all"):
        bench_quadruped()
    if which in ("hmm", "all"):
        bench_hmm()


if __name__ == "__main__":
    main()
