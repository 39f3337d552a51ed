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


def _bench_merge():
    """Closed-loop merge ensemble: fused CVaR kernel at the reference demo
    size N=40/NB=1 with per-world ramp geometry."""
    import jax
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
    topo, init_worlds, episode = make_batched_merge_fused(
        cons, model, params, pset.params, ralpha=0.1, ipm=ipm,
        use_pallas=True, tile_b=int(os.environ.get("BENCH_TILE_B", "128")),
        N_lane=2)

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
    print(json.dumps({
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
    }))


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
