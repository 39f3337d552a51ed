"""Fused batch-last CVaR IPM (``solvers/cvar_pl``) — parity tests (CPU, f64).

Three layers of pinning:
- oracle gates: the pl path must match the reference-CVaR oracle at the SAME
  tolerances as the vmapped solver (``test_cvar_solver.py``);
- algorithm identity: the pl iteration must reproduce the vmapped solver's
  per-iteration gap trajectory bit-near-exactly for the early iterations
  (after which chaotic path divergence of the IPM makes iterate comparison
  meaningless — both converge);
- controller step: the batched fused step must agree with the vmapped
  receding-horizon step on the applied input.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from belief_planning_tpu.controllers.branch_mpc import _cast_pytree
from belief_planning_tpu.controllers.cvar_mpc import (
    make_cvar_mpc_batched_step,
    make_cvar_mpc_step,
)
from belief_planning_tpu.solvers.cvar import build_cvar_plan
from belief_planning_tpu.solvers.cvar_ipm import CVaRIPMConfig, cvar_ipm_solve
from belief_planning_tpu.solvers.cvar_pl import cvar_ipm_solve_pl
from belief_planning_tpu.solvers.layout import _to_bl
from belief_planning_tpu.tree.engine import build_tree
from belief_planning_tpu.tree.topology import build_topology

from tests.test_cvar_solver import setup_case
from tests.test_tree_qp import overtake_setup


def solve_pl(cplan, ts_b, params, xRefs, iters, ralpha=0.9, gondzio=0,
             **kw):
    cfg = CVaRIPMConfig(iters=iters, gondzio=gondzio)
    return cvar_ipm_solve_pl(
        cplan, _to_bl(ts_b.A), _to_bl(ts_b.Bm), _to_bl(ts_b.dh),
        _to_bl(ts_b.h0), _to_bl(ts_b.x_lin), _to_bl(ts_b.u_lin),
        jnp.moveaxis(ts_b.p, 0, -1),
        params.Q, params.R, params.Qslack, _to_bl(jnp.asarray(xRefs)),
        ralpha, params.Fx, params.bx, params.Fu, params.bu,
        cfg=cfg, **{"use_pallas": False, **kw})


def batch1(ts):
    return jax.tree.map(lambda a: jnp.asarray(a)[None], ts)


@pytest.mark.parametrize("quirks", [True, False])
def test_cvar_pl_matches_oracle(quirks):
    oracle, u_o, params, model, cplan, ts, x = setup_case(quirks)
    J_o = oracle.solution.v[-1]
    xRefs = jnp.asarray(params.xRef)[None]
    x_bl, u_bl, s_bl, r_bl, aux = solve_pl(cplan, batch1(ts), params, xRefs, 40)
    u_f = np.asarray(u_bl)[..., 0]
    assert np.abs(u_f - oracle.uPred).max() < 1e-3
    assert np.abs(u_f[0] - u_o).max() < 5e-4
    assert abs(float(aux["J"][0]) - J_o) < 0.1


def test_cvar_pl_deeper_tree():
    oracle, u_o, params, model, cplan, ts, x = setup_case(True, N=3, NB=2)
    xRefs = jnp.asarray(params.xRef)[None]
    x_bl, u_bl, s_bl, r_bl, aux = solve_pl(cplan, batch1(ts), params, xRefs, 80)
    u_f = np.asarray(u_bl)[..., 0]
    assert np.abs(u_f[0] - u_o).max() < 1e-3


def test_cvar_pl_tracks_vmapped_iterations():
    """Early-iteration gap trajectories are identical to the vmapped solver;
    the converged applied input agrees."""
    cons, pset, model, params = overtake_setup(N=8, NB=2)
    topo = build_topology(params.N, params.NB, model.m, params.n, params.d)
    cplan = build_cvar_plan(topo, replicate_quirks=True)
    B = 4
    rng = np.random.default_rng(0)
    xs = np.array([0.0, 1.8, 20.0, 0.0]) + rng.normal(0, 0.2, (B, 4))
    zs = np.array([12.0, 1.8, 17.0, 0.0]) + rng.normal(0, 0.5, (B, 4))
    xs = jnp.asarray(xs)
    zs = jnp.asarray(zs)
    xRef = jnp.asarray(params.xRef, xs.dtype)
    u0 = jnp.zeros((topo.totalu, params.d), xs.dtype)
    ts_b = jax.vmap(
        lambda x, z: build_tree(model, topo, x, z, u0, pset.params))(xs, zs)

    cfg = CVaRIPMConfig(iters=60)

    def solve_v(ts):
        out = cvar_ipm_solve(
            cplan, ts, params.Q, params.R, params.Qslack, xRef, 0.9,
            params.Fx, params.bx, params.Fu, params.bu, ts.x_lin[0], cfg=cfg)
        return out[1], out[4]["gaps"]

    uv, gaps_v = jax.jit(jax.vmap(solve_v))(ts_b)
    x_bl, u_bl, s_bl, r_bl, aux = solve_pl(
        cplan, ts_b, params, jnp.broadcast_to(xRef, (B, 4)), 60)
    gaps_p = np.asarray(aux["gaps"]).T                       # (B, iters)
    gv = np.asarray(gaps_v)
    # identical algorithm → identical trajectories before roundoff chaos
    assert np.allclose(gv[:, :10], gaps_p[:, :10], rtol=1e-8, atol=1e-10)
    # both converge; the applied input (root stage) coincides
    up = np.asarray(jnp.moveaxis(u_bl, -1, 0))
    assert np.abs(np.asarray(uv)[:, 0] - up[:, 0]).max() < 2e-2


def test_cvar_pl_gondzio_tracks_vmapped():
    """Gondzio correctors on the fused path are the same algorithm as the
    vmapped solver's (``cvar_ipm.py`` corrector loop): gap trajectories
    must be bit-near-identical early on, and the applied input must agree
    after convergence.  Also pins that gondzio=2 still passes the oracle
    gate at the reduced 24-iteration budget used by the bench."""
    cons, pset, model, params = overtake_setup(N=8, NB=2)
    topo = build_topology(params.N, params.NB, model.m, params.n, params.d)
    cplan = build_cvar_plan(topo, replicate_quirks=True)
    B = 4
    rng = np.random.default_rng(7)
    xs = np.array([0.0, 1.8, 20.0, 0.0]) + rng.normal(0, 0.2, (B, 4))
    zs = np.array([12.0, 1.8, 17.0, 0.0]) + rng.normal(0, 0.5, (B, 4))
    xs = jnp.asarray(xs)
    zs = jnp.asarray(zs)
    xRef = jnp.asarray(params.xRef, xs.dtype)
    u0 = jnp.zeros((topo.totalu, params.d), xs.dtype)
    ts_b = jax.vmap(
        lambda x, z: build_tree(model, topo, x, z, u0, pset.params))(xs, zs)

    cfg = CVaRIPMConfig(iters=24, gondzio=2)

    def solve_v(ts):
        out = cvar_ipm_solve(
            cplan, ts, params.Q, params.R, params.Qslack, xRef, 0.9,
            params.Fx, params.bx, params.Fu, params.bu, ts.x_lin[0], cfg=cfg)
        return out[1], out[4]["gaps"]

    uv, gaps_v = jax.jit(jax.vmap(solve_v))(ts_b)
    x_bl, u_bl, s_bl, r_bl, aux = solve_pl(
        cplan, ts_b, params, jnp.broadcast_to(xRef, (B, 4)), 24, gondzio=2)
    gaps_p = np.asarray(aux["gaps"]).T                       # (B, iters)
    gv = np.asarray(gaps_v)
    assert np.allclose(gv[:, :10], gaps_p[:, :10], rtol=1e-8, atol=1e-10)
    up = np.asarray(jnp.moveaxis(u_bl, -1, 0))
    assert np.abs(np.asarray(uv)[:, 0] - up[:, 0]).max() < 2e-2
    # oracle gate at the bench's reduced iteration budget
    oracle, u_o, params1, model1, cplan1, ts1, x1 = setup_case(True)
    xRefs = jnp.asarray(params1.xRef)[None]
    _, u1, _, _, aux1 = solve_pl(cplan1, batch1(ts1), params1, xRefs, 24,
                                 gondzio=2)
    assert np.abs(np.asarray(u1)[..., 0][0] - u_o).max() < 5e-4


def test_cvar_pallas_kernel_body_interpret_matches_xla():
    """The ACTUAL CVaR Pallas kernel body (use_pallas=True) in interpret mode
    vs the plain-XLA twin (use_pallas=False) — same ``iterate`` closure, one
    through the Pallas tiling/BlockSpec plumbing, one direct. Divergence in
    the kernel wrapper (tile indexing, const tiling, 2D-gap boundary) fails
    here on CPU rather than only on-chip."""
    oracle, u_o, params, model, cplan, ts, x = setup_case(True)
    xRefs = jnp.asarray(params.xRef)[None]
    ts_b = batch1(ts)
    # B=2: duplicated lane, tile 1 → exercises the grid (2 programs)
    ts2 = jax.tree.map(lambda a: jnp.concatenate([a, a], 0), ts_b)
    xRefs2 = jnp.concatenate([xRefs, xRefs], 0)
    out_x = solve_pl(cplan, ts2, params, xRefs2, 6, gondzio=2)
    out_i = solve_pl(cplan, ts2, params, xRefs2, 6, gondzio=2,
                     use_pallas=True, interpret=True, tile_b=1)
    for a, b, name in [(out_x[1], out_i[1], "u"), (out_x[0], out_i[0], "x"),
                       (out_x[4]["gaps"], out_i[4]["gaps"], "gaps")]:
        da = np.abs(np.asarray(a) - np.asarray(b)).max()
        assert da < 1e-10, f"cvar kernel-body {name} mismatch {da}"
    # the two duplicated lanes (separate grid programs) agree with each other
    assert np.abs(np.asarray(out_i[1])[..., 0]
                  - np.asarray(out_i[1])[..., 1]).max() == 0.0


def test_cvar_pl_batched_controller_step():
    """Fused batched receding-horizon step ≈ vmapped step (2 warm steps)."""
    cons, pset, model, params = overtake_setup(N=8, NB=2)
    ipm = CVaRIPMConfig(iters=40)
    _, _, init_v, step_v = make_cvar_mpc_step(model, params, 0.9, ipm=ipm)
    _, _, init_b, step_b = make_cvar_mpc_batched_step(
        model, params, 0.9, ipm=ipm, use_pallas=False)
    vstep = jax.jit(jax.vmap(step_v, in_axes=(0, 0, 0, 0, None)))
    bstep = jax.jit(step_b)

    B = 3
    dtype = jnp.float64
    cv = init_v(dtype)
    cb = init_b(dtype)
    carrys_v = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape), cv)
    carrys_b = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape), cb)
    rng = np.random.default_rng(1)
    xs = jnp.asarray(np.array([0.0, 1.8, 20.0, 0.0])
                     + rng.normal(0, 0.1, (B, 4)), dtype)
    zs = jnp.asarray(np.array([12.0, 1.8, 17.0, 0.0])
                     + rng.normal(0, 0.3, (B, 4)), dtype)
    xRefs = jnp.asarray(np.tile([0., 1.8, 18., 0.], (B, 1)), dtype)
    pp = _cast_pytree(pset.params, dtype)

    for _ in range(2):
        carrys_v, res_v = vstep(carrys_v, xs, zs, xRefs, pp)
        carrys_b, res_b = bstep(carrys_b, xs, zs, xRefs, pp)
        assert np.abs(np.asarray(res_v.uPred[:, 0])
                      - np.asarray(res_b.uPred[:, 0])).max() < 2e-2
        assert np.asarray(res_b.gap).max() < 1.0


def test_cvar_pl_merge_S_matches_vmapped():
    """The merge shear transform S and per-lane runtime bx ride the fused
    batch-last path as per-lane constants: gap trajectories must match the
    vmapped solver with S= / bx= exactly (early iterations), and the applied
    input must agree after convergence."""
    from belief_planning_tpu.models.policies import merge_policy_set
    from belief_planning_tpu.models.predictive import merge_model
    from belief_planning_tpu.presets import init_branch_mpc
    from belief_planning_tpu.utils.config import BranchConstants

    N, NB = 3, 1
    cons = BranchConstants(am=7.0)
    pset = merge_policy_set(cons, 20.0, None)
    model = merge_model(cons, pset, N=N, dt=0.1)
    params = init_branch_mpc(4, 2, N, NB, np.array([0.5, 1.8, 15.0, 0.0]),
                             am=7.0, rm=0.3, N_lane=2, W=cons.W)
    topo = build_topology(params.N, params.NB, model.m, params.n, params.d)
    cplan = build_cvar_plan(topo, replicate_quirks=True)

    B = 3
    rng = np.random.default_rng(3)
    xs = jnp.asarray(np.array([0.0, 1.0, 15.0, 0.08])
                     + rng.normal(0, 0.1, (B, 4)))
    zs = jnp.asarray(np.array([8.0, 1.8, 14.0, 0.0])
                     + rng.normal(0, 0.2, (B, 4)))
    psi0 = 0.08 + 0.02 * rng.normal(size=B)
    Ss = np.tile(np.eye(4), (B, 1, 1))
    Ss[:, 1, 0] = -np.tan(psi0)
    Ss = jnp.asarray(Ss)
    bxs = np.tile(np.asarray(params.bx, np.float64)[None], (B, 1))
    bxs[:, 0] += rng.normal(0, 0.05, B)
    bxs = jnp.asarray(bxs)
    xRef = jnp.asarray(params.xRef, xs.dtype)
    u0 = jnp.zeros((topo.totalu, params.d), xs.dtype)
    ts_b = jax.vmap(
        lambda x, z: build_tree(model, topo, x, z, u0, pset.params))(xs, zs)

    cfg = CVaRIPMConfig(iters=40)

    def solve_v(ts, S, bx):
        out = cvar_ipm_solve(
            cplan, ts, params.Q, params.R, params.Qslack, xRef, 0.1,
            params.Fx, bx, params.Fu, params.bu, ts.x_lin[0], S=S, cfg=cfg)
        return out[1], out[4]["gaps"]

    uv, gaps_v = jax.jit(jax.vmap(solve_v))(ts_b, Ss, bxs)

    x_bl, u_bl, s_bl, r_bl, aux = cvar_ipm_solve_pl(
        cplan, _to_bl(ts_b.A), _to_bl(ts_b.Bm), _to_bl(ts_b.dh),
        _to_bl(ts_b.h0), _to_bl(ts_b.x_lin), _to_bl(ts_b.u_lin),
        jnp.moveaxis(ts_b.p, 0, -1),
        params.Q, params.R, params.Qslack,
        _to_bl(jnp.broadcast_to(xRef, (B, 4))), 0.1,
        params.Fx, jnp.moveaxis(bxs, 0, -1), params.Fu, params.bu,
        cfg=cfg, use_pallas=False, S_bl=jnp.moveaxis(Ss, 0, -1))

    gaps_p = np.asarray(aux["gaps"]).T
    gv = np.asarray(gaps_v)
    assert np.allclose(gv[:, :10], gaps_p[:, :10], rtol=1e-8, atol=1e-10)
    up = np.asarray(jnp.moveaxis(u_bl, -1, 0))
    assert np.abs(np.asarray(uv)[:, 0] - up[:, 0]).max() < 2e-2
