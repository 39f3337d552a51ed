"""Batch-last solver layout vs the vmapped per-lane solver.

The batch-last path (solvers/tree_qp_bl) must be bit-for-bit the same algorithm
as the per-lane IPM under vmap — only the memory layout differs — so two
receding-horizon steps over a batch of perturbed overtake states must agree to
solver precision in f64.
"""

import numpy as np
import jax
import jax.numpy as jnp

from belief_planning_tpu.controllers.branch_mpc import (
    make_branch_mpc_batched_step,
    make_branch_mpc_step,
)
from belief_planning_tpu.solvers.tree_qp_ipm import QPIPMConfig

from tests.test_tree_qp import overtake_setup


def test_batched_step_matches_vmapped_step():
    cons, pset, model, params = overtake_setup(N=4, NB=2)
    ipm = QPIPMConfig(iters=20)

    topo, init_carry, step = make_branch_mpc_step(
        model, params, "prox", ipm=ipm)
    topo_b, init_carry_b, bstep = make_branch_mpc_batched_step(
        model, params, "prox", ipm=ipm)

    B = 8
    rng = np.random.default_rng(3)
    xs = jnp.asarray(np.array([0.0, 1.8, 20.0, 0.0])
                     + rng.normal(0, 0.1, (B, 4)))
    zs = jnp.asarray(np.array([9.0, 1.8, 17.0, 0.0])
                     + rng.normal(0, 0.2, (B, 4)))
    xRefs = jnp.asarray(np.tile([0.0, 1.8, 18.0, 0.0], (B, 1)))

    vstep = jax.jit(jax.vmap(step, in_axes=(0, 0, 0, 0, None)))
    bstep = jax.jit(bstep)

    c = init_carry(jnp.float64)
    carrys_v = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape), c)
    carrys_b = carrys_v

    # two steps: cold solve, then a warm-started (shifted) solve
    for it in range(2):
        carrys_v, res_v = vstep(carrys_v, xs, zs, xRefs, pset.params)
        carrys_b, res_b = bstep(carrys_b, xs, zs, xRefs, pset.params)
        du = np.abs(np.asarray(res_v.uPred) - np.asarray(res_b.uPred)).max()
        dx = np.abs(np.asarray(res_v.xPred) - np.asarray(res_b.xPred)).max()
        dp = np.abs(np.asarray(res_v.prim_res) - np.asarray(res_b.prim_res)).max()
        assert du < 1e-8, f"step {it}: u mismatch {du}"
        assert dx < 1e-7, f"step {it}: x mismatch {dx}"
        assert dp < 1e-8, f"step {it}: prim_res mismatch {dp}"
    assert np.all(np.asarray(res_b.feasible))
