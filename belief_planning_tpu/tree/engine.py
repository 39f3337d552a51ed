"""Runtime tree engine: batched scenario/trajectory-tree construction.

Replaces the reference's per-node Python BFS with ~100 sequential CasADi calls per
MPC step (``inittree``/``updatetree``, ``MPC_branch.py:129-263``; hot loops A/B of
SURVEY.md §3.1) by:

- a level-by-level expansion where all branches of a level are processed in one
  vmapped call (branch probabilities + obstacle rollouts) and all child branches
  roll out in one vmapped ``lax.scan``;
- one batched linearization over all tree nodes (``jacfwd``);
- one batched collision-constraint evaluation over all constrained nodes;
- the warm-start shift (``updatetree``'s argmax-child rule, ``MPC_branch.py:
  225-234``) as pure gathers.

Everything is shaped by the static :class:`TreeTopology`; a single jit covers
init and update (init = update with zero warm-start inputs). A leading batch axis
over independent trees is added by ``jax.vmap`` at the controller level.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from belief_planning_tpu.ops.rollout import rollout_controls
from belief_planning_tpu.tree.topology import TreeTopology


class TreeState(NamedTuple):
    """Node-major arrays describing one built tree (= reference BranchTree state)."""

    x_lin: Any   # (totalx, n) linearization trajectory (QP layout; terminal filled)
    u_lin: Any   # (totalu, d) warm-start input trajectory
    z: Any       # (totalu, n) obstacle state at each constrained node
    p: Any       # (B, m) branch probabilities (leaves: zeros)
    dp: Any      # (B, m, n) ∂p/∂x (leaves: zeros)
    w: Any       # (B,) branch weights
    A: Any       # (totalx, n, n) dynamics to node i from its predecessor (row 0: 0)
    Bm: Any      # (totalx, n, d)
    C: Any       # (totalx, n)
    h0: Any      # (totalu,) linearized collision offset h − dh·x_lin
    dh: Any      # (totalu, n) collision gradient


def warm_shift_indices(topo: TreeTopology, p_prev):
    """Per-stage source indices of the warm-start shift (reference
    ``updatetree``, ``MPC_branch.py:225-234``): within each branch shift left by
    one; the freed last slot takes the argmax-probability child's first stage
    (non-leaf) or repeats itself (leaf). Also used to shift per-stage ADMM duals
    across receding-horizon steps."""
    steps = jnp.asarray(topo.unode_step)
    branch = jnp.asarray(topo.unode_branch)
    blen = jnp.asarray(topo.blen)[branch]
    is_leaf_b = jnp.asarray(topo.is_leaf)
    child_first_u = jnp.asarray(topo.u_off)[jnp.asarray(topo.children)]  # (B, m)

    best_child = jnp.argmax(p_prev, axis=1)                              # (B,)
    src_nonleaf = jnp.take_along_axis(child_first_u, best_child[:, None], axis=1)[:, 0]
    idx = jnp.arange(topo.totalu)
    last = steps == blen - 1
    src = jnp.where(
        last,
        jnp.where(is_leaf_b[branch], idx, src_nonleaf[branch]),
        jnp.minimum(idx + 1, topo.totalu - 1),
    )
    return src


def shift_warm_start(topo: TreeTopology, u_prev, p_prev):
    """Warm-start input shift (see :func:`warm_shift_indices`)."""
    return jnp.asarray(u_prev)[warm_shift_indices(topo, p_prev)]


def _f32_precision(fn):
    def wrapped(*a, **k):
        with jax.default_matmul_precision("float32"):
            return fn(*a, **k)
    return wrapped


@_f32_precision
def build_tree(model, topo: TreeTopology, x, z, u_lin, policy_params) -> TreeState:
    """Build/refresh the full tree from the measured states and warm-start inputs.

    Equivalent to reference ``inittree`` (with ``u_lin = 0``) and ``updatetree``
    (with ``u_lin = shift_warm_start(...)``), including the BranchMPCProx/live-
    BranchMPC root re-linearization (``MPC_branch.py:237-239``) which in this
    formulation is automatic (all linearizations are recomputed every call).
    """
    x = jnp.asarray(x)
    z = jnp.asarray(z)
    u_lin = jnp.asarray(u_lin)
    dtype = x.dtype
    n, d, N, m = topo.n, topo.d, topo.N, topo.m
    B = topo.n_branches

    x_lin = jnp.zeros((topo.totalx, n), dtype)
    znodes = jnp.zeros((topo.totalu, n), dtype)
    p_all = jnp.zeros((B, m), dtype)
    dp_all = jnp.zeros((B, m, n), dtype)
    w_all = jnp.zeros((B,), dtype).at[0].set(1.0)

    # per-branch last rolled state / obstacle state
    x_last = jnp.zeros((B, n), dtype).at[0].set(x)
    z_last = jnp.zeros((B, n), dtype).at[0].set(z)

    x_lin = x_lin.at[0].set(x)
    znodes = znodes.at[0].set(z)

    u_off = np.asarray(topo.u_off)
    x_off = np.asarray(topo.x_off)
    blen = np.asarray(topo.blen)

    branch_eval_v = jax.vmap(lambda xx, zz: model.branch_eval(xx, zz, policy_params))
    zpred_v = jax.vmap(lambda zz: model.zpred(zz, policy_params))
    step_v = jax.vmap(model.step)

    for k in range(topo.NB):
        lo, hi = topo.level_lo[k], topo.level_hi[k]
        nb = hi - lo
        clo, chi = topo.level_lo[k + 1], topo.level_hi[k + 1]

        xl = x_last[lo:hi]
        zl = z_last[lo:hi]
        p, dp = branch_eval_v(xl, zl)                  # (nb, m), (nb, m, n)
        zp = zpred_v(zl)                               # (nb, m, N, n)
        p_all = p_all.at[lo:hi].set(p)
        dp_all = dp_all.at[lo:hi].set(dp)
        w_children = (w_all[lo:hi, None] * p).reshape(nb * m)
        w_all = w_all.at[clo:chi].set(w_children)

        # propagate parent's last (state, input) into each child's first state
        u_last_idx = u_off[lo:hi] + blen[lo:hi] - 1    # static numpy indices
        xp = step_v(xl, u_lin[u_last_idx])             # (nb, n)
        x0c = jnp.repeat(xp, m, axis=0)                # (nb*m, n) children order

        # child input sequences (static gather indices)
        cui = (u_off[clo:chi][:, None] + np.arange(N)[None, :])   # (nb*m, N)
        u_seq = u_lin[cui]

        # states: [x0c, then N−1 Euler steps under u_seq[0:N−1]]
        xs_rest = jax.vmap(lambda x0_, us_: rollout_controls(model.dyn, x0_, us_, model.dt))(
            x0c, u_seq[:, : N - 1]
        )                                               # (nb*m, N-1, n)
        xtraj_c = jnp.concatenate([x0c[:, None, :], xs_rest], axis=1)  # (nb*m, N, n)

        # scatter children states / obstacle nodes
        cxi = (x_off[clo:chi][:, None] + np.arange(N)[None, :])
        x_lin = x_lin.at[cxi].set(xtraj_c)
        z_children = zp.reshape(nb * m, N, n)
        znodes = znodes.at[cui].set(z_children)

        x_last = x_last.at[clo:chi].set(xtraj_c[:, -1])
        z_last = z_last.at[clo:chi].set(z_children[:, -1])

    # leaf terminal nodes: fill with the propagated state (diagnostic only — the
    # QP determines them through the equality constraints)
    leaf_ids = np.nonzero(np.asarray(topo.is_leaf))[0]
    if len(leaf_ids) > 0:
        lu = u_off[leaf_ids] + blen[leaf_ids] - 1
        term_idx = x_off[leaf_ids] + blen[leaf_ids]
        x_term = step_v(x_last[leaf_ids], u_lin[lu])
        x_lin = x_lin.at[term_idx].set(x_term)

    # batched linearization at every node's predecessor (one jacfwd call)
    pred_x = np.asarray(topo.pred_x).copy()
    pred_u = np.asarray(topo.pred_u).copy()
    pred_x[0] = 0
    pred_u[0] = 0
    A, Bm, C, _ = model.linearize(x_lin[pred_x], u_lin[pred_u])
    A = A.at[0].set(jnp.zeros((n, n), dtype))
    Bm = Bm.at[0].set(jnp.zeros((n, d), dtype))
    C = C.at[0].set(jnp.zeros((n,), dtype))

    # batched collision rows at all constrained nodes
    cx = np.asarray(topo.cnode_x)
    col_v = jax.vmap(model.col_raw)
    h_raw, dh = col_v(x_lin[cx], znodes)
    h0 = h_raw - jnp.einsum("ij,ij->i", dh, x_lin[cx])

    return TreeState(
        x_lin=x_lin,
        u_lin=u_lin,
        z=znodes,
        p=p_all,
        dp=dp_all,
        w=w_all,
        A=A,
        Bm=Bm,
        C=C,
        h0=h0,
        dh=dh,
    )
