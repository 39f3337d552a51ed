"""On-chip CVaR closed-loop parity episode (BASELINE.md gate, CVaR path).

The CVaR analog of ``f32_parity_episode.py``: runs the demo overtake
(N=8, NB=2, ralpha=0.9) as a closed loop ON THE TPU in three modes:

- ``f64``:      emulated-f64 fused-layout CVaR IPM-40+g2 (plain XLA) — the
                on-chip reference;
- ``f32``:      the fused Pallas CVaR kernel at the bench config (IPM-24 +
                2 Gondzio);
- ``refine10``: parity-grade — f32 kernel phase (f64 states,
                solve_dtype=f32) + 10-iteration emulated-f64 restart.

Reports per-step applied-input deviation vs the f64 loop, both
self-driven (closed_loop — includes genuine SQP decision forks) and
teacher-forced on the f64 loop's states (the solver-accuracy metric), plus
per-step wall time at B=1 vs the dt=0.1 s budget.

NOTE the cold-start caveat: random far-from-feasible state batches (e.g.
``cvar_f32_parity.py``) sit in the documented Mehrotra-jam regime where even
f64-40 returns an unconverged best iterate — disagreement there measures
jam scatter, not precision. The receding-horizon episode below is the
deployment-shaped measurement.

Run: ``python scripts/cvar_parity_episode.py`` (real TPU; EP_STEPS=100).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from belief_planning_tpu.controllers.cvar_mpc import make_cvar_mpc_batched_step
from belief_planning_tpu.models.policies import highway_policy_set
from belief_planning_tpu.models.predictive import highway_model
from belief_planning_tpu.presets import init_branch_mpc
from belief_planning_tpu.solvers.cvar_ipm import CVaRIPMConfig
from belief_planning_tpu.utils.config import BranchConstants

N_STEPS = int(os.environ.get("EP_STEPS", "100"))


def main():
    am, rm, dt, N_lane = 6.0, 0.3, 0.1, 4
    xRef = np.array([0.5, 1.8, 15.0, 0.0])
    cons = BranchConstants(s1=2, s2=3, c2=0.5, tran_diag=0.3, alpha=1, R=1.2,
                           am=am, rm=rm, J_c=20, s_c=1, ylb=0., yub=7.2,
                           L=4, W=2.5, col_alpha=5, Kpsi=0.1)
    pset = highway_policy_set(cons, xRef)
    model = highway_model(cons, pset, N=8, dt=dt)
    params = init_branch_mpc(4, 2, 8, 2, xRef, am, rm, N_lane, cons.W)
    x0 = np.array([0.0, 1.8, 20.0, 0.0])
    z0 = np.array([9.0, 1.8, 17.0, 0.0])

    def episode(dtype, ipm, use_pallas, refine=0, forced_states=None,
                solve_dtype=None):
        topo, cplan, init_carry, step = make_cvar_mpc_batched_step(
            model, params, ralpha=0.9, ipm=ipm, use_pallas=use_pallas,
            tile_b=128, refine_f64=refine, solve_dtype=solve_dtype)
        js = jax.jit(step)
        c = init_carry(dtype)
        carry = jax.tree.map(lambda a: jnp.broadcast_to(a, (1,) + a.shape), c)
        x, z = x0.copy(), z0.copy()
        us, times, states = [], [], []
        for t in range(N_STEPS):
            if forced_states is not None:
                x, z = forced_states[t]
            states.append((x.copy(), z.copy()))
            t0 = time.perf_counter()
            carry, res = js(carry,
                            jnp.asarray(x[None], dtype),
                            jnp.asarray(z[None], dtype),
                            jnp.asarray(xRef[None], dtype),
                            pset.params)
            u = np.asarray(res.uPred[0, 0], np.float64)
            times.append(time.perf_counter() - t0)
            us.append(u.copy())
            x = x + np.array([x[2] * np.cos(x[3]), x[2] * np.sin(x[3]),
                              u[0], u[1]]) * dt
            z = z + np.array([z[2] * np.cos(z[3]), z[2] * np.sin(z[3]),
                              0.0, -cons.Kpsi * z[3]]) * dt
        return np.asarray(us), np.asarray(times[1:]), states

    u64, t64, states64 = episode(
        jnp.float64, CVaRIPMConfig(iters=40, gondzio=2), use_pallas=False)
    results = {}
    modes = {
        "f32": (jnp.float32, CVaRIPMConfig(iters=24, gondzio=2), True, 0,
                None),
        "refine10": (jnp.float64, CVaRIPMConfig(iters=24, gondzio=2), True,
                     10, jnp.float32),
    }
    sel = os.environ.get("EP_MODES")
    if sel:
        modes = {k: v for k, v in modes.items() if k in sel.split(",")}
    for tag, (dtype, ipm, up, refine, sd) in modes.items():
        u, t, _ = episode(dtype, ipm, up, refine, solve_dtype=sd)
        d = np.abs(u - u64)
        uf, tf, _ = episode(dtype, ipm, up, refine, forced_states=states64,
                            solve_dtype=sd)
        df = np.abs(uf - u64)
        results[tag] = {
            "closed_loop": {
                "max_dev": float(d.max()),
                "p50_dev": float(np.median(d)),
                "fork_step": int(np.argmax(d.max(axis=1) > 1e-3))
                if bool((d.max(axis=1) > 1e-3).any()) else None,
                "gate_1e-3": bool(d.max() < 1e-3),
            },
            "teacher_forced": {
                "max_dev": float(df.max()),
                "p50_dev": float(np.median(df)),
                "gate_1e-3": bool(df.max() < 1e-3),
            },
            "p50_ms": round(float(np.median(t)) * 1e3, 2),
            "rt_budget_ok": bool(np.median(t) <= dt),
        }
    print(json.dumps({
        "metric": "onchip_closed_loop_parity_cvar_overtake",
        "steps": N_STEPS,
        "f64_ref_p50_ms": round(float(np.median(t64)) * 1e3, 2),
        **results,
    }))


if __name__ == "__main__":
    main()
