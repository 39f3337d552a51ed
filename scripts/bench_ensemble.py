"""On-chip closed-loop ensemble bench: full episodes (env + fused-IPM
controller) as ONE compiled program over thousands of worlds.

This is the deployment configuration of BASELINE.json's "pod-scale batched
ensemble": the same fused Pallas IPM kernel behind bench.py, driving the
fully-jitted batched overtake env (``envs/batched_highway.py``,
``make_batched_overtake_fused``) — lane bookkeeping, random obstacle intent,
per-world lane-change retargeting and the receding-horizon controller all
inside one ``lax.scan``-over-time program. Reports closed-loop world-steps/s
(= solves/s including all env logic) and the real-time factor vs the
reference's 10 Hz control period.

Run on TPU: ``python scripts/bench_ensemble.py [overtake|merge]``.
``overtake``: N=8/NB=2 prox-QP worlds on the fused QP kernel. ``merge``:
N=40/NB=1 nested-CVaR worlds on the fused CVaR kernel with per-world
ramp-frame S/bx/xRef recomputed on device each step
(``envs/batched_merge.py``).
Env: ENS_BATCH (4096; merge 1024) worlds, ENS_STEPS (32; merge 12) env steps
per timed episode, ENS_REPS (5; merge 3), BENCH_TILE_B (128),
BENCH_BACKEND (pl; overtake only).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

BASELINE_PER_CHIP = 10000.0 / 16.0


def _pct(a, qs=(50, 90, 100)):
    a = np.asarray(a, np.float64).ravel()
    return {f"p{q}": float(np.percentile(a, q)) for q in qs}


def _bench_merge():
    """Closed-loop merge ensemble: fused CVaR kernel at the reference demo
    size N=40/NB=1 with per-world ramp geometry.

    Reports a throughput × ACCURACY table (VERDICT r3 item 3 — the CVaR
    mirror of the QP path's PARITY.md refine story): next to the f32
    world-steps/s headline, a one-step probe on ENS_ACC_BATCH worlds compares
    the applied input u0 of (a) the f32 kernel and (b) f32 + ``refine_f64``
    (f64 barrier restart warm-started from the f32 primal,
    ``controllers/cvar_mpc.py``) against the full-f64 solver on identical
    states, with gap percentiles per mode. ENS_ACC=0 skips the probe (and the
    x64 mode it needs); ENS_REFINE sets the restart iterations (default 8);
    ENS_REFINE_EP=1 also times a short f32+refine episode at ENS_ACC_BATCH."""
    import jax

    acc = os.environ.get("ENS_ACC", "1") != "0"
    if acc:
        jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp

    from belief_planning_tpu.envs.batched_merge import make_batched_merge_fused
    from belief_planning_tpu.models.policies import merge_policy_set
    from belief_planning_tpu.models.predictive import merge_model
    from belief_planning_tpu.presets import init_branch_mpc
    from belief_planning_tpu.solvers.cvar_ipm import CVaRIPMConfig
    from belief_planning_tpu.utils.config import BranchConstants

    N, NB, dt = 40, 1, 0.1
    cons = BranchConstants(am=7.0)
    pset = merge_policy_set(cons, 20.0, None)
    model = merge_model(cons, pset, N=N, dt=dt)
    params = init_branch_mpc(4, 2, N, NB, np.array([0.5, 1.8, 15.0, 0.0]),
                             am=7.0, rm=0.3, N_lane=2, W=cons.W)
    ipm = CVaRIPMConfig(iters=int(os.environ.get("BENCH_IPM_ITERS", "24")),
                        gondzio=int(os.environ.get("BENCH_GONDZIO", "2")))
    geo = dict(N_lane=2, merge_lane=1, merge_s=50.0, merge_R=300.0,
               merge_side=0)
    tile_b = int(os.environ.get("BENCH_TILE_B", "128"))
    topo, init_worlds, episode = make_batched_merge_fused(
        cons, model, params, pset.params, ralpha=0.1, ipm=ipm,
        use_pallas=True, tile_b=tile_b, **geo)

    B = int(os.environ.get("ENS_BATCH", "1024"))
    T = int(os.environ.get("ENS_STEPS", "12"))
    reps = int(os.environ.get("ENS_REPS", "3"))

    worlds = init_worlds(B, jax.random.key(0))
    ep = jax.jit(episode, static_argnums=1)
    worlds, traj = ep(worlds, T)
    _ = np.asarray(traj["u"])
    times = []
    for _r in range(reps):
        t0 = time.perf_counter()
        worlds, traj = ep(worlds, T)
        _ = np.asarray(traj["u"])
        times.append(time.perf_counter() - t0)
    med = float(np.median(times))
    ws_per_sec = B * T / med
    out = {
        "metric": "closed_loop_merge_cvar_world_steps_per_sec_per_chip",
        "value": round(ws_per_sec, 1),
        "unit": "world-steps/s",
        "vs_baseline": round(ws_per_sec / BASELINE_PER_CHIP, 3),
        "worlds": B,
        "episode_steps": T,
        "realtime_factor_per_world": round(ws_per_sec / B * dt, 3),
        "merged_frac": round(
            float(np.asarray(worlds.merged, np.float32).mean()), 4),
        "collided_frac": round(
            float(np.asarray(worlds.collided, np.float32).mean()), 4),
    }

    if acc:
        Bacc = int(os.environ.get("ENS_ACC_BATCH", "256"))
        k_ref = int(os.environ.get("ENS_REFINE", "8"))
        # refine mode: f64 states (unquantized prep), f32 fused solve, f64
        # barrier restart — the parity-grade on-chip config
        _, iw_r, ep_r = make_batched_merge_fused(
            cons, model, params, pset.params, ralpha=0.1, ipm=ipm,
            use_pallas=True, tile_b=tile_b, dtype=jnp.float64,
            solve_dtype=jnp.float32, refine_f64=k_ref, **geo)
        # full-f64 reference solver (XLA twin of the kernel; TPU-emulated f64)
        _, iw_64, ep_64 = make_batched_merge_fused(
            cons, model, params, pset.params, ralpha=0.1,
            ipm=CVaRIPMConfig(iters=int(os.environ.get("ENS_F64_ITERS", "40")),
                              gondzio=2),
            use_pallas=False, dtype=jnp.float64, **geo)

        # identical states in all three modes: generate f32 worlds, pin the
        # (exactly representable) states into the f64 factories
        w32 = init_worlds(Bacc, jax.random.key(7))
        x0 = np.asarray(w32.x, np.float64)
        z0 = np.asarray(w32.z, np.float64)
        w_r = iw_r(Bacc, jax.random.key(7), x0=x0, z0=z0)
        w_64 = iw_64(Bacc, jax.random.key(7), x0=x0, z0=z0)

        _, o32 = jax.jit(episode.step_once)(w32)
        _, o_r = jax.jit(ep_r.step_once)(w_r)
        _, o64 = jax.jit(ep_64.step_once)(w_64)
        u32 = np.asarray(o32["u"], np.float64)
        u_r = np.asarray(o_r["u"], np.float64)
        u64 = np.asarray(o64["u"], np.float64)
        e32 = np.abs(u32 - u64).max(axis=1)
        e_r = np.abs(u_r - u64).max(axis=1)
        out["accuracy"] = {
            "probe_batch": Bacc,
            "refine_iters": k_ref,
            "u0_err_f32": {k: round(v, 8) for k, v in _pct(e32).items()},
            "u0_err_refine": {k: round(v, 8) for k, v in _pct(e_r).items()},
            "gap_f32": {k: round(v, 8) for k, v in
                        _pct(o32["gap"], (50, 99)).items()},
            "gap_refine": {k: round(v, 8) for k, v in
                           _pct(o_r["gap"], (50, 99)).items()},
            "gap_f64": {k: round(v, 8) for k, v in
                        _pct(o64["gap"], (50, 99)).items()},
        }

        if os.environ.get("ENS_REFINE_EP", "0") != "0":
            # optional: f32+refine episode throughput at the probe batch
            Tr = int(os.environ.get("ENS_REFINE_STEPS", "6"))
            epr = jax.jit(ep_r, static_argnums=1)
            w_r2, tr = epr(w_r, Tr)
            _ = np.asarray(tr["u"])
            t0 = time.perf_counter()
            w_r2, tr = epr(w_r2, Tr)
            _ = np.asarray(tr["u"])
            dt_r = time.perf_counter() - t0
            out["refine_world_steps_per_sec"] = round(Bacc * Tr / dt_r, 1)

    print(json.dumps(out))


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    if len(sys.argv) > 1 and sys.argv[1] == "merge":
        return _bench_merge()

    import jax.numpy as jnp

    from belief_planning_tpu.envs.batched_highway import (
        make_batched_overtake_fused,
    )
    from belief_planning_tpu.models.policies import highway_policy_set
    from belief_planning_tpu.models.predictive import highway_model
    from belief_planning_tpu.presets import init_branch_mpc
    from belief_planning_tpu.solvers.tree_qp_ipm import QPIPMConfig
    from belief_planning_tpu.utils.config import BranchConstants

    N, NB, dt = 8, 2, 0.1
    cons = BranchConstants(s1=2, s2=3, c2=0.5, tran_diag=0.3, alpha=1, R=1.2,
                           am=6.0, rm=0.3, J_c=20, s_c=1, ylb=0., yub=7.2,
                           L=4, W=2.5, col_alpha=5, Kpsi=0.1)
    xRef = np.array([0.5, 1.8, 15.0, 0.0])
    pset = highway_policy_set(cons, xRef)
    model = highway_model(cons, pset, N=N, dt=dt)
    params = init_branch_mpc(4, 2, N, NB, xRef, am=6.0, rm=0.3, N_lane=4,
                             W=cons.W)

    ipm = QPIPMConfig(iters=int(os.environ.get("BENCH_IPM_ITERS", "8")),
                      gondzio=int(os.environ.get("BENCH_GONDZIO", "2")))
    backend = os.environ.get("BENCH_BACKEND", "pl")
    topo, init_worlds, episode = make_batched_overtake_fused(
        cons, model, params, "prox", ipm=ipm, backend=backend,
        backend_opts={"tile_b": int(os.environ.get("BENCH_TILE_B", "128"))}
        if backend == "pl" else None)

    B = int(os.environ.get("ENS_BATCH", "4096"))
    T = int(os.environ.get("ENS_STEPS", "32"))
    reps = int(os.environ.get("ENS_REPS", "5"))

    worlds = init_worlds(B, jax.random.key(0))
    ep = jax.jit(episode, static_argnums=2)

    # compile + one full warm episode
    worlds, traj = ep(worlds, jax.random.key(1), T)
    _ = np.asarray(traj["u"])   # device→host fetch: see bench.py timing note

    times = []
    for r in range(reps):
        t0 = time.perf_counter()
        worlds, traj = ep(worlds, jax.random.key(2 + r), T)
        _ = np.asarray(traj["u"])
        times.append(time.perf_counter() - t0)
    med = float(np.median(times))
    ws_per_sec = B * T / med
    feas = float(np.asarray(traj["feasible"], np.float32).mean())
    collided = float(np.asarray(worlds.collided, np.float32).mean())

    print(json.dumps({
        "metric": "closed_loop_world_steps_per_sec_per_chip",
        "value": round(ws_per_sec, 1),
        "unit": "world-steps/s",
        "vs_baseline": round(ws_per_sec / BASELINE_PER_CHIP, 3),
        "worlds": B,
        "episode_steps": T,
        "realtime_factor_per_world": round(ws_per_sec / B * dt, 3),
        "feasible_frac": round(feas, 4),
        "collided_frac": round(collided, 4),
    }))


if __name__ == "__main__":
    main()
