"""Phase-level timing of the fused Pallas IPM iteration.

Each sub-phase of the Mehrotra iteration — (a) barrier weights + Riccati
factorization, (b) + one KKT linear solve + forward rollout, (c) the full
iteration — is wrapped in its own Pallas kernel and scanned cfg.iters times
inside ONE jit (per-dispatch overhead through the tunneled runtime is ~100 ms,
so single-call timings are meaningless). Run on TPU:
    python scripts/profile_ipm_kernel.py
Env: BENCH_BATCH (2048), BENCH_TILE_B (128), PROF_REPS (12), PROF_TIMES (8).
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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from belief_planning_tpu.controllers.branch_mpc import (
        _cast_pytree, make_branch_mpc_batched_step)
    from belief_planning_tpu.models.policies import highway_policy_set
    from belief_planning_tpu.models.predictive import highway_model
    from belief_planning_tpu.presets import init_branch_mpc
    from belief_planning_tpu.solvers.tree_qp import assemble_stage_cost, build_stage_plan
    from belief_planning_tpu.solvers.layout import cost_to_bl, _to_bl
    from belief_planning_tpu.solvers.tree_qp_ipm import QPIPMConfig
    from belief_planning_tpu.solvers import tree_qp_pl as P
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
    cfg = QPIPMConfig(iters=12)
    tile_b = int(os.environ.get("BENCH_TILE_B", "128"))
    B = int(os.environ.get("BENCH_BATCH", "2048"))
    dtype = jnp.float32

    nFx = np.asarray(params.Fx).shape[0]
    nFu = np.asarray(params.Fu).shape[0]
    Nc = nFx + 1
    totalu, totalx = topo.totalu, topo.totalx
    mtot = float(totalu * Nc + totalu * nFu + totalu * Nc)
    levels = P.build_levels(plan)
    m = topo.m

    # ---- real inputs via one prep pass ------------------------------------
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

    _, init_carry, step = make_branch_mpc_batched_step(
        model, params, "prox", ipm=cfg, backend="pl",
        backend_opts={"tile_b": tile_b})
    c = init_carry(dtype)
    carrys = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape), c)
    carrys, _res = jax.jit(step)(carrys, xs, zs, xRefs, pset.params)

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
        return (cost_to_bl(cost_b), _to_bl(ts_b.A), _to_bl(ts_b.Bm),
                _to_bl(ts_b.C), _to_bl(ts_b.dh), _to_bl(ts_b.h0),
                _to_bl(ts_b.x_lin), _to_bl(ts_b.u_lin))

    cost_bl, A_bl, B_bl, C_bl, dh_bl, h0_bl, xw, uw = prep_b(
        carrys, xs, zs, xRefs, pset.params)
    consts = P._prep_consts(plan, cost_bl, A_bl, B_bl, dh_bl, h0_bl,
                            params.Fx, params.bx, params.Fu, params.bu)
    const_args = [consts[k] for k in P.CONST_ORDER]

    s_i = jnp.zeros((totalu, Nc, B), dtype)
    sl = jnp.full((totalu, Nc, B), 0.5, dtype)
    lam = jnp.full((totalu, Nc, B), 0.2, dtype)
    sl2 = jnp.full((totalu, nFu, B), 0.5, dtype)
    lam2 = jnp.full((totalu, nFu, B), 0.2, dtype)
    carry0 = (xw, uw, s_i, sl, lam, sl2, lam2, sl, lam)

    iterate_full = P.make_iteration(plan, cfg, nFx, nFu, mtot)

    def cheap_touch(blocks):
        """Reduce a list of (..., T) arrays to (1, T) via leading-axis sums
        only (vreg adds; no cross-lane/sublane reduction)."""
        acc = None
        for a in blocks:
            s = jnp.sum(a, axis=tuple(range(a.ndim - 1)), keepdims=False)
            s = s.reshape(1, -1) if s.ndim == 1 else s
            acc = s if acc is None else acc + s
        return acc

    def make_phase_fn(phase):
        def body(*args):
            nc = len(P.CONST_ORDER)
            (Qx2, qx, Ru2, qu, Dab2, qterm, Pterm2, slack_lin, slack_quad,
             A_st, B_st, dh, b1, Fx, Fu, bu) = args[:nc]
            (x_c, u_c, s_c, sl1, lam1, sl2_, lam2_, sl3, lam3) = args[nc:]
            if phase == "full":
                return iterate_full(*args)
            T = x_c.shape[-1]
            w_max_eff = min(cfg.w_max, 1e6)
            FxFx = Fx[:, :, None] * Fx[:, None, :]
            FuFu = Fu[:, :, None] * Fu[:, None, :]
            clampw = lambda w: jnp.minimum(w, w_max_eff)
            w1 = clampw(lam1 / sl1)
            w2 = clampw(lam2_ / sl2_)
            w3 = clampw(lam3 / sl3)
            kap = slack_quad + w1 + w3 + cfg.reg
            coefs = w1 - w1 * w1 / kap
            eye_n = jnp.eye(n, dtype=dtype)[None, :, :, None]
            out0 = (coefs[:, 0:1][:, :, None, :]
                    * dh[:, :, None, :] * dh[:, None, :, :])
            Qx2_eff = Qx2 + out0 + jnp.sum(
                coefs[:, 1:][:, :, None, None, :]
                * FxFx[None, :, :, :, None], axis=1) + cfg.reg * eye_n
            Ru2_eff = Ru2 + cfg.reg * jnp.eye(d, dtype=dtype)[None, :, :, None]
            Ru2_eff = Ru2_eff + jnp.sum(
                w2[:, :, None, None, :] * FuFu[None, :, :, :, None], axis=1)
            Pterm2_eff = Pterm2 + cfg.reg * eye_n
            K_l, Hinv_l, Acl_l = P._factor_blocks(
                levels, Qx2_eff, Dab2, Ru2_eff, Pterm2_eff, A_st, B_st,
                n, d, m, cfg.reg)
            if phase == "factor":
                t0 = cheap_touch([K_l[k] for k in range(len(levels))]
                                 + [Hinv_l[k] for k in range(len(levels))])
                # chain: perturb sl1 tinily so the scan carries a dependency
                return (x_c, u_c, s_c, sl1 + 1e-30 * t0[0:1, :], lam1,
                        sl2_, lam2_, sl3, lam3, t0)
            kff_l = P._linear_blocks(levels, K_l, Hinv_l, Acl_l, B_st,
                                     qx, qu, qterm, n, d, m)
            dx, du = P._forward_blocks(levels, K_l, Hinv_l, Acl_l, B_st, kff_l,
                                       n, d, m, dtype, T)
            t0 = cheap_touch([dx, du])
            return (x_c, u_c, s_c, sl1 + 1e-30 * t0[0:1, :], lam1,
                    sl2_, lam2_, sl3, lam3, t0)
        return body

    n_leaves = len(plan.leaf_ids)
    tiled_const = {
        "Qx2": (totalu, n, n), "qx": (totalu, n), "Ru2": (totalu, d, d),
        "qu": (totalu, d), "Dab2": (totalu, d, d), "qterm": (n_leaves, n),
        "Pterm2": (n_leaves, n, n), "slack_lin": (totalu,),
        "slack_quad": (1,), "A_st": (totalu, n, n), "B_st": (totalu, n, d),
        "dh": (totalu, n), "b1": (totalu, Nc),
    }
    shared_const = {"Fx": (nFx, n), "Fu": (nFu, d), "bu": (1, nFu)}
    carry_shapes = [
        (totalx, n), (totalu, d), (totalu, Nc),
        (totalu, Nc), (totalu, Nc), (totalu, nFu), (totalu, nFu),
        (totalu, Nc), (totalu, Nc),
    ]

    def make_step(body):
        def kernel(*refs):
            nconst = len(P.CONST_ORDER)
            cv = [r[...] for r in refs[:nconst]]
            carry_vals = [r[...] for r in refs[nconst:nconst + P.CARRY_FIELDS]]
            outs = body(*cv, *carry_vals)
            for r, v in zip(refs[nconst + P.CARRY_FIELDS:], outs):
                r[...] = v

        def step_fn(*args):
            Z = args[len(P.CONST_ORDER)].shape[-1]
            tb = tile_b if Z % tile_b == 0 else Z
            grid = (Z // tb,)
            in_specs = []
            for name in P.CONST_ORDER:
                if name in tiled_const:
                    base = tiled_const[name]
                    idx = (lambda ndims: (lambda i: (0,) * ndims + (i,)))(len(base))
                    in_specs.append(pl.BlockSpec(base + (tb,), idx,
                                                 memory_space=pltpu.VMEM))
                else:
                    shp = shared_const[name]
                    in_specs.append(pl.BlockSpec(shp, lambda i: (0,) * len(shp),
                                                 memory_space=pltpu.VMEM))
            out_specs, out_shapes = [], []
            for shp in carry_shapes:
                idx = (lambda ndims: (lambda i: (0,) * ndims + (i,)))(len(shp))
                in_specs.append(pl.BlockSpec(shp + (tb,), idx,
                                             memory_space=pltpu.VMEM))
                out_specs.append(pl.BlockSpec(shp + (tb,), idx,
                                              memory_space=pltpu.VMEM))
                out_shapes.append(jax.ShapeDtypeStruct(shp + (Z,), dtype))
            out_specs.append(pl.BlockSpec((1, tb), lambda i: (0, i),
                                          memory_space=pltpu.VMEM))
            out_shapes.append(jax.ShapeDtypeStruct((1, Z), dtype))
            try:
                cparams = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
            except TypeError:
                cparams = pltpu.TPUCompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
            return pl.pallas_call(kernel, grid=grid, in_specs=in_specs,
                                  out_specs=tuple(out_specs),
                                  out_shape=tuple(out_shapes),
                                  compiler_params=cparams)(*args)
        return step_fn

    reps = int(os.environ.get("PROF_REPS", "12"))
    times = int(os.environ.get("PROF_TIMES", "8"))

    def make_scanned(phase):
        step_fn = make_step(make_phase_fn(phase))

        @jax.jit
        def run(carry):
            def body(cr, _):
                out = step_fn(*const_args, *cr)
                return out[:P.CARRY_FIELDS], out[P.CARRY_FIELDS]
            cr, gaps = jax.lax.scan(body, carry, None, length=reps)
            return gaps[-1]
        return run

    def timeit(name, fn):
        out = fn(carry0)
        _ = np.asarray(out)
        ts = []
        for _i in range(times):
            t0 = time.perf_counter()
            out = fn(carry0)
            _ = np.asarray(out)
            ts.append(time.perf_counter() - t0)
        med = float(np.median(ts))
        print(f"{name:10s} {med*1e3:9.3f} ms total, {med*1e3/reps:7.3f} ms/iter",
              flush=True)
        return med

    print(f"B={B} tile_b={tile_b} reps={reps}", flush=True)
    t = {}
    for phase in ["factor", "kkt1", "full"]:
        t[phase] = timeit(phase, make_scanned(phase))
    print(f"\nper-iter: factor {t['factor']/reps*1e3:.2f} | "
          f"factor+1solve {t['kkt1']/reps*1e3:.2f} | full {t['full']/reps*1e3:.2f}")
    print(f"=> linear+forward ≈ {(t['kkt1']-t['factor'])/reps*1e3:.2f} ms/iter, "
          f"bookkeeping+2nd solve ≈ {(t['full']-t['kkt1'])/reps*1e3:.2f} ms/iter")


if __name__ == "__main__":
    main()
