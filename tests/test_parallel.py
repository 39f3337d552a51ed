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
