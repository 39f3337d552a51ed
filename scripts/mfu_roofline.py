"""Single-chip MFU / roofline anchor for the two fused IPM kernels.

"~37k solves/s is 60x our vmapped path" is self-relative; this script gives
the absolute anchor: achieved FLOP/s vs the chip's peaks, so "is it actually
fast" has a hardware answer.

Method: the Pallas kernels each have a plain-XLA twin (``use_pallas=False``)
that computes IDENTICAL math (bit-compared on CPU in
tests/test_tree_qp_pl.py / test_cvar_pl.py). XLA's compiled cost analysis
counts the twin's FLOPs exactly — including every masked/padded lane the
fused iteration actually executes — and that count divided by the measured
Pallas wall time is the kernel's achieved FLOP/s.

Peaks (TPU v5e / "v5 lite", one chip):
  - MXU bf16: 197 TFLOP/s (the headline matmul peak; f32 multiplies pass at
    ~1/2-1/4 of it depending on pass count);
  - VPU f32: ~4-8 TFLOP/s (8x128 vector lanes, 4-8 ALU ops/cycle @ ~0.94
    GHz) — the relevant roofline for this workload, which is all small-n
    (n=4, d=2) elementwise/broadcast arithmetic with NO MXU ops.

Also reports bytes moved (cost analysis) → arithmetic intensity, and the
HBM-bandwidth-implied time at ~819 GB/s so the memory-vs-compute verdict is
explicit.

Run on the real chip: ``python scripts/mfu_roofline.py [qp|cvar|both]``.
Env: MFU_B (batch, default 4096), BENCH_TILE_B (128), MFU_REPS (8).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MXU_BF16 = 197e12
VPU_F32_LO, VPU_F32_HI = 4e12, 8e12
HBM_BW = 819e9  # v5e ~819 GB/s


def _cost(jitted, *args):
    c = jitted.lower(*args).compile().cost_analysis()
    if isinstance(c, list):
        c = c[0]
    return float(c.get("flops", 0.0)), float(c.get("bytes accessed", 0.0))


def _time_step(fn, fetch, reps):
    out = fn()
    _ = np.asarray(fetch(out))
    ts = []
    for _i in range(reps):
        t0 = time.perf_counter()
        out = fn()
        _ = np.asarray(fetch(out))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def _report(tag, flops, bytes_acc, t_pl, t_xla, B):
    ai = flops / bytes_acc if bytes_acc else float("nan")
    t_hbm = bytes_acc / HBM_BW
    for name, t in (("pallas", t_pl), ("pl_xla", t_xla)):
        if t is None:
            continue
        fps = flops / t
        print(f"[{tag}/{name}] {t * 1e3:8.1f} ms/step  "
              f"achieved {fps / 1e12:6.3f} TFLOP/s  "
              f"= {fps / MXU_BF16 * 100:5.2f}% of MXU-bf16 peak, "
              f"{fps / VPU_F32_HI * 100:5.1f}-{fps / VPU_F32_LO * 100:5.1f}% "
              f"of VPU-f32 peak band", flush=True)
    print(f"[{tag}] {flops / 1e9:.1f} GFLOP/step, {bytes_acc / 1e9:.2f} GB "
          f"accessed (XLA-twin count, B={B}), arithmetic intensity "
          f"{ai:.1f} FLOP/B; HBM-bound floor ≈ {t_hbm * 1e3:.1f} ms "
          f"({'memory' if t_hbm > flops / VPU_F32_LO else 'compute'}-leaning "
          f"on the VPU roofline)", flush=True)


def _states(B, rng):
    xs = np.array([0.0, 1.8, 20.0, 0.0]) + rng.normal(0, 0.2, (B, 4))
    xs[:, 1] = np.clip(xs[:, 1], 1.3, 13.1)
    xs[:, 3] = np.clip(xs[:, 3], -0.2, 0.2)
    zs = np.array([12.0, 1.8, 17.0, 0.0]) + rng.normal(0, 0.5, (B, 4))
    zs[:, 1] = np.clip(zs[:, 1], 1.3, 13.1)
    zs[:, 3] = np.clip(zs[:, 3], -0.2, 0.2)
    return xs, zs


def run_qp(B, tile, reps):
    import jax
    import jax.numpy as jnp

    from belief_planning_tpu.controllers.branch_mpc import (
        make_branch_mpc_batched_step,
    )
    from belief_planning_tpu.models.policies import highway_policy_set
    from belief_planning_tpu.models.predictive import highway_model
    from belief_planning_tpu.presets import init_branch_mpc
    from belief_planning_tpu.solvers.tree_qp_ipm import QPIPMConfig
    from belief_planning_tpu.utils.config import BranchConstants

    N, NB = 8, 2
    cons = BranchConstants(s1=2, s2=3, c2=0.5, tran_diag=0.3, alpha=1, R=1.2,
                           am=6.0, rm=0.3, J_c=20, s_c=1, ylb=0., yub=7.2,
                           L=4, W=2.5, col_alpha=5, Kpsi=0.1)
    xRef = np.array([0.5, 1.8, 15.0, 0.0])
    pset = highway_policy_set(cons, xRef)
    model = highway_model(cons, pset, N=N, dt=0.1)
    params = init_branch_mpc(4, 2, N, NB, xRef, am=6.0, rm=0.3, N_lane=4,
                             W=cons.W)
    ipm = QPIPMConfig(iters=8, gondzio=2)

    xs, zs = _states(B, np.random.default_rng(0))
    xs, zs = jnp.asarray(xs, jnp.float32), jnp.asarray(zs, jnp.float32)
    xRefs = jnp.asarray(np.tile([0., 1.8, 18., 0.], (B, 1)), jnp.float32)

    def make(backend):
        _t, init_carry, step = make_branch_mpc_batched_step(
            model, params, "prox", ipm=ipm, backend=backend,
            backend_opts={"tile_b": tile} if backend == "pl" else None)
        c = init_carry(jnp.float32)
        carrys = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape), c)
        j = jax.jit(step)
        return j, carrys

    j_x, c_x = make("pl_xla")
    flops, bytes_acc = _cost(j_x, c_x, xs, zs, xRefs, pset.params)
    j_p, c_p = make("pl")
    t_pl = _time_step(lambda: j_p(c_p, xs, zs, xRefs, pset.params),
                      lambda o: o[1].uPred, reps)
    t_xla = _time_step(lambda: j_x(c_x, xs, zs, xRefs, pset.params),
                       lambda o: o[1].uPred, reps)
    _report("qp N=8/NB=2 iters=8+g2", flops, bytes_acc, t_pl, t_xla, B)
    return flops, t_pl


def run_cvar(B, tile, reps):
    import jax
    import jax.numpy as jnp

    from belief_planning_tpu.controllers.cvar_mpc import (
        make_cvar_mpc_batched_step,
    )
    from belief_planning_tpu.models.policies import highway_policy_set
    from belief_planning_tpu.models.predictive import highway_model
    from belief_planning_tpu.presets import init_branch_mpc
    from belief_planning_tpu.solvers.cvar_ipm import CVaRIPMConfig
    from belief_planning_tpu.utils.config import BranchConstants

    N, NB = 8, 2
    cons = BranchConstants(s1=2, s2=3, c2=0.5, tran_diag=0.3, alpha=1, R=1.2,
                           am=6.0, rm=0.3, J_c=20, s_c=1, ylb=0., yub=7.2,
                           L=4, W=2.5, col_alpha=5, Kpsi=0.1)
    xRef = np.array([0.5, 1.8, 15.0, 0.0])
    pset = highway_policy_set(cons, xRef)
    model = highway_model(cons, pset, N=N, dt=0.1)
    params = init_branch_mpc(4, 2, N, NB, xRef, am=6.0, rm=0.3, N_lane=4,
                             W=cons.W)
    ipm = CVaRIPMConfig(iters=24, gondzio=2)

    xs, zs = _states(B, np.random.default_rng(0))
    xs, zs = jnp.asarray(xs, jnp.float32), jnp.asarray(zs, jnp.float32)
    xRefs = jnp.asarray(np.tile([0., 1.8, 18., 0.], (B, 1)), jnp.float32)

    def make(use_pallas):
        _t, _c, init_carry, step = make_cvar_mpc_batched_step(
            model, params, ralpha=0.9, ipm=ipm, use_pallas=use_pallas,
            tile_b=tile)
        c = init_carry(jnp.float32)
        carrys = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape), c)
        j = jax.jit(step)
        return j, carrys

    j_x, c_x = make(False)
    flops, bytes_acc = _cost(j_x, c_x, xs, zs, xRefs, pset.params)
    j_p, c_p = make(True)
    t_pl = _time_step(lambda: j_p(c_p, xs, zs, xRefs, pset.params),
                      lambda o: o[1].uPred, reps)
    t_xla = _time_step(lambda: j_x(c_x, xs, zs, xRefs, pset.params),
                       lambda o: o[1].uPred, reps)
    _report("cvar N=8/NB=2 iters=24+g2", flops, bytes_acc, t_pl, t_xla, B)
    return flops, t_pl


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    B = int(os.environ.get("MFU_B", "4096"))
    tile = int(os.environ.get("BENCH_TILE_B", "128"))
    reps = int(os.environ.get("MFU_REPS", "8"))
    print(f"device: {jax.devices()[0].device_kind}, B={B}, tile_b={tile}",
          flush=True)
    if which in ("qp", "both"):
        run_qp(B, tile, reps)
    if which in ("cvar", "both"):
        run_cvar(B, tile, reps)


if __name__ == "__main__":
    main()
