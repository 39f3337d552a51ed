"""Riccati-smalls MXU probe: can 2-D ``jnp.dot`` (Mosaic MXU path) beat the
VPU broadcast-multiply-sum for the fused kernels' small contractions?

Context (VERDICT r4 item 6): the negative MXU result so far covers only the
CVaR cone contractions (measured 3-5% slower, cvar_pl.py docstring). The
Riccati sweeps contain two families of contractions:

1. lane-batched small matmuls, e.g. ``out[i,j,t] = Σ_k A[i,k,t]·P[k,j,t]``
   (every lane has its own 4x4 matrices). The MXU contracts a 2-D dot only;
   a lane-batched contraction with per-lane operands has no 2-D dot mapping
   short of block-diagonal packing (128/4 = 32x padding waste) — structurally
   not MXU-eligible, no probe needed.
2. shared-left-operand contractions, e.g. constraint rows ``Fx @ dx`` with
   ``Fx (nFx, n)`` lane-independent and ``dx (n, T)`` lane-major — this IS a
   plain 2-D dot per tile, MXU-eligible (2-D ``jnp.dot`` is supported in
   Mosaic), contraction dim n=4 of 128 (≈3% systolic utilization, but MXU
   peak is ~25-50x VPU peak so it could still win).

This script times family-2 both ways inside a real Pallas kernel at the
fused kernels' actual shapes (nFx=4, n=4, T=128 tile, repeated over totalu
nodes and R inner repetitions to swamp dispatch): (a) VPU
broadcast-multiply-sum (the current pattern), (b) 2-D ``jnp.dot`` with
``preferred_element_type=f32``.

Run on the real chip: ``python scripts/mxu_probe.py``.
Env: PROBE_T (128), PROBE_NODES (25), PROBE_INNER (64), PROBE_REPS (8).
"""

import functools
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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T = int(os.environ.get("PROBE_T", "128"))
    nodes = int(os.environ.get("PROBE_NODES", "25"))
    inner = int(os.environ.get("PROBE_INNER", "64"))
    reps = int(os.environ.get("PROBE_REPS", "8"))
    n, nFx = 4, 4
    B = int(os.environ.get("PROBE_B", "4096"))
    grid = (B // T,)

    rng = np.random.default_rng(0)
    Fx = jnp.asarray(rng.normal(size=(nFx, n)), jnp.float32)
    dx0 = jnp.asarray(rng.normal(size=(nodes, n, B)), jnp.float32)

    def kernel(mode, Fx_ref, dx_ref, out_ref):
        Fxv = Fx_ref[...]
        acc = jnp.zeros((nodes, nFx, T), jnp.float32)
        dxv = dx_ref[...]
        for _r in range(inner):
            # chain via acc so the loop isn't folded away (no scatter:
            # Mosaic has no .at[].set — build per-node results and stack)
            cur = dxv + 1e-9 * acc[:, :n, :]
            rs = []
            for nd in range(nodes):
                if mode == "vpu":
                    rs.append(jnp.sum(Fxv[:, :, None] * cur[nd][None, :, :],
                                      axis=1))
                elif mode == "mxu":
                    # default precision: bf16 multiply passes (the TPU einsum
                    # default) — fast but ~1e-2-scale relative error, fatal
                    # for iterative solves (CLAUDE.md f32-precision note)
                    rs.append(jnp.dot(Fxv, cur[nd],
                                      preferred_element_type=jnp.float32))
                else:
                    # solver-grade: 3-pass f32 emulation on the MXU
                    rs.append(jnp.dot(Fxv, cur[nd],
                                      precision=jax.lax.Precision.HIGHEST,
                                      preferred_element_type=jnp.float32))
            acc = jnp.stack(rs, axis=0)
        out_ref[...] = acc

    def run(mode):
        f = pl.pallas_call(
            functools.partial(kernel, mode),
            grid=grid,
            in_specs=[
                pl.BlockSpec((nFx, n), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nodes, n, T), lambda i: (0, 0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((nodes, nFx, T), lambda i: (0, 0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nodes, nFx, B), jnp.float32),
        )
        j = jax.jit(f)
        out = j(Fx, dx0)
        _ = np.asarray(out)
        ts = []
        for _i in range(reps):
            t0 = time.perf_counter()
            out = j(Fx, dx0)
            _ = np.asarray(out)
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts)), out

    t_vpu, o_vpu = run("vpu")
    t_mxu, o_mxu = run("mxu")
    t_hi, o_hi = run("mxu_hi")
    err = float(jnp.max(jnp.abs(o_vpu - o_mxu)))
    err_hi = float(jnp.max(jnp.abs(o_vpu - o_hi)))
    flops = 2.0 * nodes * nFx * n * B * inner
    print(f"shapes: Fx({nFx},{n}) @ dx({n},{T}) x {nodes} nodes x {inner} "
          f"inner x {B // T} tiles")
    print(f"VPU broadcast-sum:        {t_vpu * 1e3:8.2f} ms  "
          f"({flops / t_vpu / 1e12:.3f} TFLOP/s)  [exact f32]")
    print(f"MXU dot (default=bf16):   {t_mxu * 1e3:8.2f} ms  "
          f"err vs VPU {err:.2e}  <- solver-fatal precision")
    print(f"MXU dot (HIGHEST 3-pass): {t_hi * 1e3:8.2f} ms  "
          f"err vs VPU {err_hi:.2e}")
    print(f"=> f32-grade MXU is {t_vpu / t_hi:.2f}x the VPU formulation "
          f"({'WINS' if t_hi < t_vpu * 0.97 else 'no win'})")


if __name__ == "__main__":
    main()
