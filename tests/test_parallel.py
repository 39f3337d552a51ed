"""Mesh-sharded ensemble tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from belief_planning_tpu.models.policies import highway_policy_set
from belief_planning_tpu.models.predictive import highway_model
from belief_planning_tpu.parallel.ensemble import (
    make_batched_step,
    make_mesh,
    make_sharded_ensemble_step,
)
from belief_planning_tpu.presets import init_branch_mpc
from belief_planning_tpu.solvers.tree_qp import ADMMConfig
from belief_planning_tpu.utils.config import BranchConstants


def setup(N=3, NB=1, iters=40):
    cons = BranchConstants()
    xt = np.array([0.5, 1.8, 15.0, 0.0])
    pset = highway_policy_set(cons, xt)
    model = highway_model(cons, pset, N=N, dt=0.1)
    params = init_branch_mpc(4, 2, N, NB, xt, am=6.0, rm=0.3, N_lane=4, W=cons.W)
    admm = ADMMConfig(iters=iters, polish_iters=10)
    return cons, pset, model, params, admm


def test_sharded_matches_single_device():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    cons, pset, model, params, admm = setup()
    mesh = make_mesh((4, 2), ("dp", "mp"))
    topo, init_b, sharded = make_sharded_ensemble_step(model, params, mesh,
                                                       "prox", admm)
    _, _, vstep = make_batched_step(model, params, "prox", admm)

    B = 16
    rng = np.random.default_rng(0)
    xs = jnp.asarray(np.tile([0., 1.8, 20., 0.], (B, 1))
                     + rng.normal(0, 0.1, (B, 4)), jnp.float32)
    zs = jnp.asarray(np.tile([10., 1.8, 17., 0.], (B, 1)), jnp.float32)
    xR = jnp.asarray(np.tile([0., 1.8, 18., 0.], (B, 1)), jnp.float32)
    carrys = init_b(B, jnp.float32)

    c1, u_sharded, metrics = sharded(carrys, xs, zs, xR, pset.params)
    c2, res = vstep(carrys, xs, zs, xR, pset.params)

    assert np.allclose(np.asarray(u_sharded), np.asarray(res.uPred), atol=1e-5)
    assert 0.0 <= float(metrics["feasible_frac"]) <= 1.0
    # warm-started second step agrees too (carry round-trips through shard_map)
    c1b, u2s, _ = sharded(c1, xs, zs, xR, pset.params)
    c2b, res2 = vstep(c2, xs, zs, xR, pset.params)
    assert np.allclose(np.asarray(u2s), np.asarray(res2.uPred), atol=1e-4)


def test_mesh_1d():
    cons, pset, model, params, admm = setup()
    mesh = make_mesh((8,), ("dp",))
    topo, init_b, sharded = make_sharded_ensemble_step(model, params, mesh,
                                                       "prox", admm)
    B = 8
    xs = jnp.asarray(np.tile([0., 1.8, 20., 0.], (B, 1)), jnp.float32)
    zs = jnp.asarray(np.tile([10., 1.8, 17., 0.], (B, 1)), jnp.float32)
    xR = jnp.asarray(np.tile([0., 1.8, 18., 0.], (B, 1)), jnp.float32)
    carrys = init_b(B, jnp.float32)
    _, u, metrics = sharded(carrys, xs, zs, xR, pset.params)
    assert u.shape == (B, topo.totalu, 2)


# ---------------------------------------------------------------------------
# In-tree branch-axis sharding (parallel/tree_shard.py)
# ---------------------------------------------------------------------------


def _random_tree_kkt_case(N=4, NB=3, m=2, n=3, d=2, T=8, seed=0):
    from belief_planning_tpu.solvers.tree_qp import build_stage_plan
    from belief_planning_tpu.tree.topology import build_topology

    topo = build_topology(N, NB, m, n, d)
    plan = build_stage_plan(topo)
    rng = np.random.default_rng(seed)
    tu, nl = topo.totalu, m ** NB
    dt = jnp.float64

    # symmetric + diagonally-dominant blocks (batch-last)
    def sym(shape, dim, scale, shift):
        M = rng.normal(0, scale, shape)
        Ms = 0.5 * (M + np.swapaxes(M, -3, -2))
        return jnp.asarray(Ms + shift * np.eye(dim)[:, :, None], dt)

    blocks = dict(
        Qx2=sym((tu, n, n, T), n, 0.1, 2.0),
        Ru2=sym((tu, d, d, T), d, 0.1, 1.0),
        Dab2=jnp.asarray(rng.normal(0, 0.05, (tu, d, d, T)), dt),
        A=jnp.asarray(np.eye(n)[:, :, None] + rng.normal(0, 0.1, (tu, n, n, T)), dt),
        B=jnp.asarray(rng.normal(0, 0.3, (tu, n, d, T)), dt),
        qx=jnp.asarray(rng.normal(0, 1.0, (tu, n, T)), dt),
        qu=jnp.asarray(rng.normal(0, 1.0, (tu, d, T)), dt),
        Pterm2=sym((nl, n, n, T), n, 0.1, 2.0),
        qterm=jnp.asarray(rng.normal(0, 1.0, (nl, n, T)), dt),
    )
    return topo, plan, blocks


@pytest.mark.parametrize("mesh_shape", [(4, 2), (2, 4)])
def test_tree_kkt_branch_sharded_matches_unsharded(mesh_shape):
    """Branch-axis-sharded tree-Riccati KKT solve == unsharded level-blocked
    sweeps, bit-near-exactly (same fold order), on a deep m=2/NB=3 tree where
    levels 1..3 shard over mp and the root is replicated."""
    from belief_planning_tpu.parallel.tree_shard import (
        make_sharded_tree_kkt,
        split_ulevels,
    )
    from belief_planning_tpu.solvers.tree_qp_pl import (
        _factor_blocks,
        _forward_blocks,
        _linear_blocks,
        build_levels,
    )

    assert len(jax.devices()) >= 8
    topo, plan, bl = _random_tree_kkt_case()
    n, d, m, T = topo.n, topo.d, topo.m, 8
    levels = build_levels(plan)

    # reference: unsharded sweeps on the flat arrays
    K_l, Hinv_l, Acl_l = _factor_blocks(
        levels, bl["Qx2"], bl["Dab2"], bl["Ru2"], bl["Pterm2"],
        bl["A"], bl["B"], n, d, m, 0.0)
    kff_l = _linear_blocks(levels, K_l, Hinv_l, Acl_l, bl["B"],
                           bl["qx"], bl["qu"], bl["qterm"], n, d, m)
    dx_ref, du_ref = _forward_blocks(levels, K_l, Hinv_l, Acl_l, bl["B"],
                                     kff_l, n, d, m, jnp.float64, T)

    mesh = make_mesh(mesh_shape, ("dp", "mp"))
    solve = make_sharded_tree_kkt(plan, mesh)
    blocks = {k: split_ulevels(bl[k], levels)
              for k in ("Qx2", "Dab2", "Ru2", "A", "B", "qx", "qu")}
    blocks["Pterm2"] = bl["Pterm2"]
    blocks["qterm"] = bl["qterm"]
    dx_l, du_l = solve(blocks)

    dx_sh = jnp.concatenate(
        [b.reshape(-1, n, T) for b in dx_l], axis=0)
    du_sh = jnp.concatenate(
        [b.reshape(-1, d, T) for b in du_l], axis=0)
    assert np.abs(np.asarray(dx_sh) - np.asarray(dx_ref)).max() < 1e-11
    assert np.abs(np.asarray(du_sh) - np.asarray(du_ref)).max() < 1e-11


def test_sharded_episode_runs_and_reduces():
    """Mesh-sharded closed-loop episodes: device-local worlds, psum'd
    end-of-episode metrics, per-shard independent key streams."""
    from belief_planning_tpu.parallel.ensemble import (
        make_sharded_overtake_episode,
    )
    from belief_planning_tpu.solvers.tree_qp_ipm import QPIPMConfig

    cons = BranchConstants()
    xt = np.array([0.5, 1.8, 15.0, 0.0])
    pset = highway_policy_set(cons, xt)
    model = highway_model(cons, pset, N=3, dt=0.1)
    params = init_branch_mpc(4, 2, 3, 1, xt, am=6.0, rm=0.3, N_lane=4,
                             W=cons.W)
    mesh = make_mesh((4, 2), ("dp", "mp"))
    topo, init_worlds, ep = make_sharded_overtake_episode(
        cons, model, params, mesh, ipm=QPIPMConfig(iters=12),
        backend="pl_xla", dtype=jnp.float32)

    B, T = 16, 5
    worlds = init_worlds(B, jax.random.key(0))
    worlds2, traj, metrics = ep(worlds, jax.random.key(1), T)
    assert traj["u"].shape == (B, T, 2)
    assert np.abs(np.asarray(traj["u"][..., 0])).max() <= 6.0 + 1e-3
    feas = np.asarray(traj["feasible"], np.float32).mean()
    assert np.isclose(float(metrics["feasible_frac"]), feas, atol=1e-6)
    assert float(metrics["collided"]) == np.asarray(
        worlds2.collided, np.float32).sum()
    # per-shard key folding: obstacle streams differ across shards
    z_end = np.asarray(worlds2.z[:, 1]).reshape(8, 2)
    assert len(np.unique(np.round(z_end, 6))) > 1
