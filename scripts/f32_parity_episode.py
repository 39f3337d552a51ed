"""On-chip closed-loop parity episode: the BASELINE.md north-star measurement.

Runs the reference demo overtake (N=8, NB=2, ``main_branch.py:24-48``) as a
100-step closed loop ON THE TPU in three controller modes, each driving its
own trajectory from the same start:

- ``f64``:      full f64 (XLA-emulated) fused-layout IPM-40 — the on-chip
                reference (matches the CPU oracle chain to ~1e-6).
- ``f32``:      the bench kernel (Pallas fused IPM-8 + 2 Gondzio).
- ``refine10``: f32 kernel + 10-iteration f64 restart
                (``make_branch_mpc_batched_step(refine_f64=10)``) — the
                parity-grade mode.

Reports the max/median per-step applied-input deviation of each f32 mode's
closed loop vs the f64 closed loop, plus per-step wall time at B=1 against
the dt=0.1 s real-time budget. Gate: ≤ 1e-3 (BASELINE.md).

Run: ``python scripts/f32_parity_episode.py`` (real TPU; ~10 min incl.
compiles, cached afterwards).
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

from belief_planning_tpu.controllers.branch_mpc import (
    make_branch_mpc_batched_step,
)
from belief_planning_tpu.models.policies import highway_policy_set
from belief_planning_tpu.models.predictive import highway_model
from belief_planning_tpu.presets import init_branch_mpc
from belief_planning_tpu.solvers.tree_qp_ipm import QPIPMConfig
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

    def episode(dtype, ipm, backend, refine=0, forced_states=None,
                solve_dtype=None, x0_shift=0.0):
        """Closed loop (forced_states=None) or teacher-forced on a given
        (x, z) state trajectory — the per-step solver-accuracy metric, immune
        to the receding-horizon fork sensitivity (the tree is re-linearized
        around the carried warm start, so the loop is an SQP fixed-point
        iteration with genuine decision bifurcations: once two trajectories
        split at a pass/brake decision, applied inputs differ at O(1)
        regardless of per-solve accuracy)."""
        topo, init_carry, step = make_branch_mpc_batched_step(
            model, params, "prox", ipm=ipm, backend=backend,
            backend_opts={"tile_b": 128} if backend == "pl" else None,
            refine_f64=refine, solve_dtype=solve_dtype)
        js = jax.jit(step)
        c = init_carry(dtype)
        carry = jax.tree.map(lambda a: jnp.broadcast_to(a, (1,) + a.shape), c)
        x, z = x0.copy() + x0_shift, z0.copy()
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

    u64, t64, states64 = episode(jnp.float64, QPIPMConfig(iters=40), "pl_xla")
    results = {}
    # Conditioning control: the f64 reference vs ITSELF from a 1e-9-shifted
    # start. The receding-horizon loop re-linearizes around its carried warm
    # start (SQP); near collision-softmin ties the linearization flips under
    # arbitrarily small perturbations, so ANY two trajectories — regardless
    # of solver precision — can deviate at O(1e-2) at those steps. This
    # number is the intrinsic floor of the closed-loop max-deviation metric.
    if os.environ.get("EP_CONTROL", "1") != "0":
        up, _, _ = episode(jnp.float64, QPIPMConfig(iters=40), "pl_xla",
                           x0_shift=1e-9)
        dp = np.abs(up - u64)
        results["f64_selfperturbed_1e-9"] = {
            "closed_loop": {"max_dev": float(dp.max()),
                            "p50_dev": float(np.median(dp))},
        }
    # refine10 passes states in f64 (the reference's own state pipeline is
    # f64) with the heavy phase-1 iterations still in f32: an f32-quantized
    # measured state is a ~6e-8 perturbation that flips collision-softmin
    # linearization gradients at near-ties — a different, equally valid QP
    # with an O(0.1)-different optimum (measured: dh changes by 2.2 on the
    # demo cold start from the f32 rounding of y=1.8 alone).
    modes = {
        "f32": (jnp.float32, QPIPMConfig(iters=8, gondzio=2), "pl", 0, None),
        "refine10": (jnp.float64, QPIPMConfig(iters=8, gondzio=2), "pl", 10,
                     jnp.float32),
        "refine14": (jnp.float64, QPIPMConfig(iters=8, gondzio=2), "pl", 14,
                     jnp.float32),
    }
    sel_modes = os.environ.get("EP_MODES")
    if sel_modes:
        modes = {k: v for k, v in modes.items() if k in sel_modes.split(",")}
    for tag, (dtype, ipm, backend, refine, sd) in modes.items():
        u, t, _ = episode(dtype, ipm, backend, refine, solve_dtype=sd)
        d = np.abs(u - u64)
        uf, tf, _ = episode(dtype, ipm, backend, refine,
                            forced_states=states64, solve_dtype=sd)
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
        "metric": "onchip_closed_loop_parity_overtake",
        "steps": N_STEPS,
        "f64_ref_p50_ms": round(float(np.median(t64)) * 1e3, 2),
        **results,
    }))


if __name__ == "__main__":
    main()
