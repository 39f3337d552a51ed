"""Scale-out: batched and mesh-sharded branch-MPC ensembles.

The reference is strictly serial single-process Python (SURVEY.md §2.4); all
parallelism here is new capability. The unit of scaling is the *scenario tree*:
per-tree math is tiny (n ≤ 4), so throughput comes from batching thousands of
independent trees per chip (`jax.vmap`) and sharding that batch across the
device mesh (`shard_map` over a data-parallel axis, with ICI collectives for
ensemble metrics). This is the "pod-scale batched ensemble" configuration of
BASELINE.json.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from belief_planning_tpu.controllers.branch_mpc import make_branch_mpc_step
from belief_planning_tpu.solvers.tree_qp import ADMMConfig


def make_mesh(axis_sizes: Tuple[int, ...], axis_names: Tuple[str, ...] = ("dp", "mp"),
              devices=None) -> Mesh:
    """Create a device mesh. For ensembles the batch shards over every axis."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    devices = devices[: int(np.prod(axis_sizes))].reshape(axis_sizes)
    return Mesh(devices, axis_names)


def make_batched_step(model, params, variant="prox",
                      admm: ADMMConfig = ADMMConfig(rho=5.0, iters=200,
                                                    rho_update_every=50,
                                                    polish_iters=30)):
    """vmapped single-chip ensemble step.

    Returns (topo, init_carry_batched, step) where
    ``step(carrys, xs, zs, xRefs, policy_params) -> (carrys, results)`` maps over
    the leading batch axis of carrys/xs/zs/xRefs (policy params broadcast).
    """
    topo, init_carry, step = make_branch_mpc_step(model, params, variant, admm)
    vstep = jax.vmap(step, in_axes=(0, 0, 0, 0, None))

    def init_batched(batch: int, dtype=jnp.float32):
        c = init_carry(dtype)
        return jax.tree.map(lambda a: jnp.broadcast_to(a, (batch,) + a.shape), c)

    return topo, init_batched, vstep


def make_sharded_ensemble_step(model, params, mesh: Mesh, variant="prox",
                               admm: ADMMConfig = ADMMConfig(rho=5.0, iters=200,
                                                             rho_update_every=50,
                                                             polish_iters=30)):
    """Mesh-sharded ensemble step via ``shard_map``.

    The batch axis is sharded over *all* mesh axes; per-step ensemble metrics
    (feasible fraction, worst primal residual) are reduced across the mesh with
    ``psum``/``pmax`` over ICI. Returns (topo, init_batched, sharded_step).
    """
    topo, init_batched, vstep = make_batched_step(model, params, variant, admm)
    axes = mesh.axis_names

    def step_local(carrys, xs, zs, xRefs, policy_params):
        carrys, res = vstep(carrys, xs, zs, xRefs, policy_params)
        feas = jnp.sum(res.feasible.astype(jnp.float32))
        count = jnp.asarray(xs.shape[0], jnp.float32)
        for ax in axes:
            feas = jax.lax.psum(feas, ax)
            count = jax.lax.psum(count, ax)
        worst = jnp.max(res.prim_res)
        for ax in axes:
            worst = jax.lax.pmax(worst, ax)
        metrics = {"feasible_frac": feas / count, "worst_prim_res": worst}
        return carrys, res.uPred, metrics

    spec = P(axes)      # batch dim sharded over every mesh axis
    repl = P()          # fully replicated
    sharded = jax.jit(
        jax.shard_map(
            step_local,
            mesh=mesh,
            in_specs=(spec, spec, spec, spec, repl),
            out_specs=(spec, spec, repl),
            check_vma=False,
        )
    )
    return topo, init_batched, sharded


def _shard_ensemble(mesh, init_carry, bstep, feas_of, res_of):
    """shard_map a batched controller step (batch-leading pytrees) over every
    mesh axis, with psum/pmax ensemble metrics over ICI."""
    axes = mesh.axis_names

    def step_local(carrys, xs, zs, xRefs, policy_params):
        carrys, res = bstep(carrys, xs, zs, xRefs, policy_params)
        feas = jnp.sum(feas_of(res).astype(jnp.float32))
        count = jnp.asarray(xs.shape[0], jnp.float32)
        worst = jnp.max(res_of(res))
        for ax in axes:
            feas = jax.lax.psum(feas, ax)
            count = jax.lax.psum(count, ax)
            worst = jax.lax.pmax(worst, ax)
        metrics = {"feasible_frac": feas / count, "worst_res": worst}
        return carrys, res.uPred, metrics

    spec, repl = P(axes), P()
    sharded = jax.jit(
        jax.shard_map(step_local, mesh=mesh,
                      in_specs=(spec, spec, spec, spec, repl),
                      out_specs=(spec, spec, repl), check_vma=False))

    def init_batched(batch: int, dtype=jnp.float32):
        c = init_carry(dtype)
        return jax.tree.map(lambda a: jnp.broadcast_to(a, (batch,) + a.shape), c)

    return init_batched, sharded


def make_sharded_ipm_ensemble_step(model, params, mesh: Mesh, variant="prox",
                                   ipm=None, backend="pl_xla",
                                   backend_opts=None):
    """Mesh-sharded ensemble step on the BENCH path: the batch-last fused-
    iteration Mehrotra IPM (``solvers/tree_qp_pl``) under ``shard_map``. This
    is the flagship configuration — identical math to ``bench.py``'s ``pl``
    backend (``pl_xla`` runs the same iteration as plain XLA so it also
    executes on CPU meshes). Returns (topo, init_batched, sharded_step)."""
    from belief_planning_tpu.controllers.branch_mpc import (
        make_branch_mpc_batched_step,
    )
    from belief_planning_tpu.solvers.tree_qp_ipm import QPIPMConfig

    ipm = ipm if ipm is not None else QPIPMConfig(iters=8, gondzio=2)
    topo, init_carry, bstep = make_branch_mpc_batched_step(
        model, params, variant, ipm=ipm, backend=backend,
        backend_opts=backend_opts)
    init_batched, sharded = _shard_ensemble(
        mesh, init_carry, bstep, lambda r: r.feasible, lambda r: r.prim_res)
    return topo, init_batched, sharded


def make_sharded_cvar_ensemble_step(model, params, mesh: Mesh, ralpha=0.9,
                                    ipm=None, use_pallas=False):
    """Mesh-sharded CVaR ensemble step (batch-last fused CVaR IPM,
    ``solvers/cvar_pl``, under ``shard_map``). ``use_pallas=False`` runs the
    XLA twin of the kernel so the same program executes on CPU meshes.
    Returns (topo, init_batched, sharded_step)."""
    from belief_planning_tpu.controllers.cvar_mpc import (
        make_cvar_mpc_batched_step,
    )
    from belief_planning_tpu.solvers.cvar_ipm import CVaRIPMConfig

    ipm = ipm if ipm is not None else CVaRIPMConfig(iters=24, gondzio=2)
    topo, cplan, init_carry, bstep = make_cvar_mpc_batched_step(
        model, params, ralpha, ipm=ipm, use_pallas=use_pallas)
    init_batched, sharded = _shard_ensemble(
        mesh, init_carry, bstep, lambda r: r.gap < 1.0, lambda r: r.gap)
    return topo, init_batched, sharded


def make_sharded_overtake_episode(cons, model, params, mesh: Mesh,
                                  variant="prox", ipm=None, backend="pl_xla",
                                  backend_opts=None, N_lane=4,
                                  dtype=jnp.float32):
    """Mesh-sharded closed-loop EPISODES: the fully-jitted batched overtake env
    + fused-IPM controller (``envs/batched_highway.make_batched_overtake_fused``)
    sharded over every mesh axis — whole receding-horizon episodes run
    device-local (worlds are independent; zero per-step communication), with
    end-of-episode ensemble metrics reduced over ICI.

    Each shard folds its mesh position into the episode key, so worlds on
    different devices draw independent obstacle-intent streams.

    Returns (topo, init_worlds(B, key), episode_sharded(worlds, key, n_steps)
    → (worlds, traj, metrics)); B must divide by the mesh size."""
    from belief_planning_tpu.envs.batched_highway import (
        make_batched_overtake_fused,
    )
    from belief_planning_tpu.solvers.tree_qp_ipm import QPIPMConfig

    ipm = ipm if ipm is not None else QPIPMConfig(iters=8, gondzio=2)
    topo, init_worlds, episode = make_batched_overtake_fused(
        cons, model, params, variant, ipm=ipm, backend=backend,
        backend_opts=backend_opts, N_lane=N_lane, dtype=dtype)
    axes = mesh.axis_names

    def _episode_local(worlds, key, n_steps):
        idx = jnp.asarray(0, jnp.int32)
        for ax in axes:
            idx = idx * mesh.shape[ax] + jax.lax.axis_index(ax)
        worlds, traj = episode(worlds, jax.random.fold_in(key, idx), n_steps)
        feas = jnp.sum(traj["feasible"].astype(jnp.float32))
        count = jnp.asarray(np.prod(traj["feasible"].shape), jnp.float32)
        coll = jnp.sum(worlds.collided.astype(jnp.float32))
        for ax in axes:
            feas = jax.lax.psum(feas, ax)
            count = jax.lax.psum(count, ax)
            coll = jax.lax.psum(coll, ax)
        metrics = {"feasible_frac": feas / count, "collided": coll}
        return worlds, traj, metrics

    spec, repl = P(axes), P()

    def episode_sharded(worlds, key, n_steps: int):
        f = jax.shard_map(
            partial(_episode_local, n_steps=n_steps), mesh=mesh,
            in_specs=(spec, repl), out_specs=(spec, spec, repl),
            check_vma=False)
        return jax.jit(f)(worlds, key)

    return topo, init_worlds, episode_sharded
