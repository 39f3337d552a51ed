"""Fused level-blocked IPM iteration (solvers/tree_qp_pl) vs the independent
vmapped solver (solvers/tree_qp_ipm).

``qp_ipm_solve_pl(use_pallas=False)`` must be the same Mehrotra algorithm as
the independently-coded per-tree solver in ``tree_qp_ipm.py`` (gather-indexed
lax.scan sweeps vs level-blocked Python-unrolled recursions — two separate
implementations of the same math), so receding-horizon steps over a batch of
perturbed overtake states must agree to solver precision in f64. The
``use_pallas=True`` kernel BODY is additionally pinned on CPU via Pallas
interpret mode (tiny batch), bit-compared to the XLA twin — a divergence
between what the TPU kernel computes and what the tests validate fails here,
not just on-chip."""

import numpy as np
import jax
import jax.numpy as jnp

from belief_planning_tpu.controllers.branch_mpc import (
    make_branch_mpc_batched_step,
)
from belief_planning_tpu.solvers.tree_qp_ipm import QPIPMConfig

from tests.test_tree_qp import overtake_setup


def _run(backend, steps=2, iters=14, N=4, NB=2, B=8, gondzio=0,
         backend_opts=None):
    cons, pset, model, params = overtake_setup(N=N, NB=NB)
    ipm = QPIPMConfig(iters=iters, gondzio=gondzio)
    topo, init_carry, step = make_branch_mpc_batched_step(
        model, params, "prox", ipm=ipm, backend=backend,
        backend_opts=backend_opts)
    step = jax.jit(step)

    rng = np.random.default_rng(3)
    xs = jnp.asarray(np.array([0.0, 1.8, 20.0, 0.0])
                     + rng.normal(0, 0.1, (B, 4)))
    zs = jnp.asarray(np.array([9.0, 1.8, 17.0, 0.0])
                     + rng.normal(0, 0.2, (B, 4)))
    xRefs = jnp.asarray(np.tile([0.0, 1.8, 18.0, 0.0], (B, 1)))

    c = init_carry(jnp.float64)
    carrys = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape), c)
    outs = []
    for _ in range(steps):
        carrys, res = step(carrys, xs, zs, xRefs, pset.params)
        outs.append(res)
    return outs


def _run_vmapped(steps=2, iters=14, N=4, NB=2, B=8, gondzio=0):
    """Same receding-horizon batch through the INDEPENDENT per-tree solver
    (``make_branch_mpc_step`` → ``tree_qp_ipm.qp_ipm_solve``), vmapped.
    Separately-coded scan/gather implementation of the same Mehrotra
    iteration — the cross-check that pins the fused kernel's math."""
    from belief_planning_tpu.controllers.branch_mpc import make_branch_mpc_step

    cons, pset, model, params = overtake_setup(N=N, NB=NB)
    ipm = QPIPMConfig(iters=iters, gondzio=gondzio)
    topo, init_carry, step = make_branch_mpc_step(model, params, "prox",
                                                  ipm=ipm)
    vstep = jax.jit(jax.vmap(step, in_axes=(0, 0, 0, 0, None)))

    rng = np.random.default_rng(3)
    xs = jnp.asarray(np.array([0.0, 1.8, 20.0, 0.0])
                     + rng.normal(0, 0.1, (B, 4)))
    zs = jnp.asarray(np.array([9.0, 1.8, 17.0, 0.0])
                     + rng.normal(0, 0.2, (B, 4)))
    xRefs = jnp.asarray(np.tile([0.0, 1.8, 18.0, 0.0], (B, 1)))

    c = init_carry(jnp.float64)
    carrys = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape), c)
    outs = []
    for _ in range(steps):
        carrys, res = vstep(carrys, xs, zs, xRefs, pset.params)
        outs.append(res)
    return outs


def test_fused_iteration_matches_independent_solver():
    """Fused level-blocked iteration (pl_xla) vs the independently-written
    vmapped ``tree_qp_ipm`` solver: same Mehrotra algorithm, two separate
    codebases (level-blocked unrolled recursions vs gather-indexed lax.scan
    sweeps), identical inputs → converged outputs must agree to solver
    precision across two receding-horizon steps (warm-start carry included)."""
    res_ind = _run_vmapped()
    res_pl = _run("pl_xla")
    for it, (rb, rp) in enumerate(zip(res_ind, res_pl)):
        du = np.abs(np.asarray(rb.uPred) - np.asarray(rp.uPred)).max()
        dx = np.abs(np.asarray(rb.xPred) - np.asarray(rp.xPred)).max()
        assert du < 1e-7, f"step {it}: u mismatch {du}"
        assert dx < 1e-6, f"step {it}: x mismatch {dx}"
    assert np.all(np.asarray(res_pl[-1].feasible))
    assert np.asarray(res_pl[-1].prim_res).max() < 1e-7


def test_pallas_kernel_body_interpret_matches_xla():
    """The ACTUAL Pallas kernel body (use_pallas=True) in interpret mode vs
    the plain-XLA twin of the same iteration (pl_xla). The two run the same
    ``iterate`` closure — one through Pallas tiling/BlockSpecs, one directly —
    so any divergence introduced by the kernel plumbing (tile indexing, VMEM
    block shapes, const broadcasting) fails this test on CPU."""
    res_xla = _run("pl_xla", steps=1, iters=6, B=4, gondzio=2)
    res_int = _run("pl", steps=1, iters=6, B=4, gondzio=2,
                   backend_opts={"interpret": True, "tile_b": 2})
    du = np.abs(np.asarray(res_xla[0].uPred) - np.asarray(res_int[0].uPred)).max()
    dx = np.abs(np.asarray(res_xla[0].xPred) - np.asarray(res_int[0].xPred)).max()
    dp = np.abs(np.asarray(res_xla[0].prim_res)
                - np.asarray(res_int[0].prim_res)).max()
    assert du < 1e-10, f"kernel-body u mismatch {du}"
    assert dx < 1e-10, f"kernel-body x mismatch {dx}"
    assert dp < 1e-10, f"kernel-body prim_res mismatch {dp}"


def test_fused_gondzio_matches_vmapped():
    """Gondzio correctors on the fused path are the same algorithm as the
    vmapped solver's (``tree_qp_ipm.py``): converged applied inputs agree to
    solver precision, and the corrected run converges at least as well as
    plain Mehrotra at the same iteration count."""
    from belief_planning_tpu.controllers.branch_mpc import make_branch_mpc_step
    import jax

    cons, pset, model, params = overtake_setup(N=4, NB=2)
    ipm = QPIPMConfig(iters=10, gondzio=2)
    topo, init_carry, step = make_branch_mpc_step(model, params, "prox",
                                                  ipm=ipm)
    vstep = jax.jit(jax.vmap(step, in_axes=(0, 0, 0, 0, None)))

    B = 8
    rng = np.random.default_rng(3)
    xs = jnp.asarray(np.array([0.0, 1.8, 20.0, 0.0])
                     + rng.normal(0, 0.1, (B, 4)))
    zs = jnp.asarray(np.array([9.0, 1.8, 17.0, 0.0])
                     + rng.normal(0, 0.2, (B, 4)))
    xRefs = jnp.asarray(np.tile([0.0, 1.8, 18.0, 0.0], (B, 1)))
    c = init_carry(jnp.float64)
    carrys = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape), c)

    res_pl = _run("pl_xla", iters=10, gondzio=2)
    res_plain = _run("pl_xla", iters=10, gondzio=0)
    for it in range(2):
        carrys, rv = vstep(carrys, xs, zs, xRefs, pset.params)
        du = np.abs(np.asarray(rv.uPred)
                    - np.asarray(res_pl[it].uPred)).max()
        assert du < 1e-5, f"step {it}: gondzio u mismatch vs vmapped {du}"
    # correctors don't hurt convergence at a fixed budget
    assert (np.asarray(res_pl[-1].prim_res).max()
            <= 10.0 * np.asarray(res_plain[-1].prim_res).max() + 1e-9)
    assert np.all(np.asarray(res_pl[-1].feasible))
