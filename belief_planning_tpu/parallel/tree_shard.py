"""In-tree branch-axis sharding: tree-Riccati KKT solves over a mesh axis.

The ensemble path (`parallel/ensemble.py`) scales by sharding the *batch* of
independent trees (DP). This module shards *inside one tree*: the branch axis
of each tree level is distributed over a model-parallel mesh axis ("mp"), so a
single huge scenario tree (wide m / deep NB — e.g. m=4, NB=5 → 1024 leaf
branches) can be factored across chips. This is the framework's analog of
tensor parallelism (SURVEY.md §2.4: "branch-parallel block factorization"),
with collectives riding ICI exactly at the tree's level crossings:

- **backward (factor / linear) sweep**: children fold into their parent by a
  sum over each parent's `m` children. Levels are laid out branch-major
  (children of one parent contiguous), so while both levels are sharded the
  fold is device-local; crossing from the last sharded level into a replicated
  one is a single `all_gather` over "mp" of the per-branch (nd, nd) Riccati
  heads — O(nb·(n+d)²) bytes, tiny vs the per-level factor work.
- **forward (rollout) sweep**: the parent's closed-loop state repeats to its
  children; entering a sharded level each device statically slices its own
  branch block (`lax.axis_index`) — no communication at all going down.

A level is sharded iff `mp` divides its branch count (the root never is);
replicated levels redundantly compute on every device, which is exact and
costs only the tiny top-of-tree work. Numerics are bit-identical to the
unsharded level-blocked sweeps (`tree_qp_pl._factor_blocks` etc.) because the
fold order is preserved (pinned in tests/test_parallel.py on a virtual CPU
mesh).

Reference: the serial Python tree loops at MPC_branch.py:129-263 (inittree /
updatetree) and the dense KKT assembly they feed — no distributed analog
exists there (SURVEY.md §2.4); this is new capability.
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from belief_planning_tpu.solvers.tree_qp import StagePlan
from belief_planning_tpu.solvers.tree_qp_pl import (
    LevelMeta,
    _addvec,
    _fold0,
    _mtv,
    _mv,
    _repeat0,
    _riccati_step,
    _ublk,
    build_levels,
)


def level_sharding(levels: Sequence[LevelMeta], mp_size: int) -> List[bool]:
    """A level is branch-sharded iff mp divides its branch count."""
    return [mt.nb >= mp_size and mt.nb % mp_size == 0 for mt in levels]


def split_ulevels(flat, levels):
    """Flat per-stage array (totalu, ..., T) → per-level (nb, l, ..., T)."""
    return [_ublk(flat, mt) for mt in levels]


def _shard_blk(blk, mt: LevelMeta, mp_size: int, sharded: bool):
    """Host-side: keep only this module's slicing convention documented —
    shard_map does the actual placement; nothing to do here."""
    return blk


class _Comms:
    """Level-crossing transfers, shard-aware. All methods take the CHILD level
    index k (crossing between level k and its parent level k-1)."""

    def __init__(self, shards: List[bool], m: int, mp_axis: str, mp_size: int):
        self.shards = shards
        self.m = m
        self.mp_axis = mp_axis
        self.mp_size = mp_size

    def fold_up(self, a, k: int):
        """Sum each parent's m children: child level k → parent level k-1.
        `a` is (nb_local, ..., T) on sharded levels, (nb, ..., T) otherwise."""
        child_sh, parent_sh = self.shards[k], self.shards[k - 1]
        if child_sh and not parent_sh:
            a = jax.lax.all_gather(a, self.mp_axis, axis=0, tiled=True)
        return _fold0(a, self.m)

    def repeat_down(self, xi, k: int):
        """Parent level k-1 state → child level k (repeat to the m children,
        then slice the local branch block when entering a sharded level)."""
        child_sh, parent_sh = self.shards[k], self.shards[k - 1]
        full = _repeat0(xi, self.m)
        if child_sh and not parent_sh:
            loc = full.shape[0] // self.mp_size
            idx = jax.lax.axis_index(self.mp_axis)
            full = jax.lax.dynamic_slice_in_dim(full, idx * loc, loc, axis=0)
        return full


def _factor_local(levels, comms, Qx2_l, Dab2_l, Ru2_l, Pterm2, A_l, B_l,
                  n, d, reg):
    """Backward quadratic sweep on local blocks (tree_qp_pl._factor_blocks
    with shard-aware level crossings)."""
    NB = len(levels) - 1
    K_l = [None] * (NB + 1)
    Hinv_l = [None] * (NB + 1)
    Acl_l = [None] * (NB + 1)
    P_head_next = None
    nd = n + d
    for k in range(NB, -1, -1):
        mt = levels[k]
        if k == NB:
            T = A_l[k].shape[-1]
            nb_loc = Pterm2.shape[0]
            top = jnp.concatenate(
                [Pterm2, jnp.zeros((nb_loc, n, d, T), A_l[k].dtype)], axis=2)
            W = jnp.concatenate(
                [top, jnp.zeros((nb_loc, d, nd, T), A_l[k].dtype)], axis=1)
        else:
            W = comms.fold_up(P_head_next, k + 1)
        Ks, His, Acls = [], [], []
        for j in range(mt.l - 1, -1, -1):
            W, K, Hinv, Acl = _riccati_step(
                W, Qx2_l[k][:, j], Dab2_l[k][:, j], Ru2_l[k][:, j],
                A_l[k][:, j], B_l[k][:, j], None, n, d, reg)
            Ks.append(K)
            His.append(Hinv)
            Acls.append(Acl)
        Ks.reverse(); His.reverse(); Acls.reverse()
        K_l[k] = jnp.stack(Ks, axis=1)
        Hinv_l[k] = jnp.stack(His, axis=1)
        Acl_l[k] = jnp.stack(Acls, axis=1)
        P_head_next = W
    return K_l, Hinv_l, Acl_l


def _linear_local(levels, comms, K_l, Hinv_l, Acl_l, B_l, qx_l, qu_l, qterm,
                  n, d):
    """Backward linear sweep on local blocks."""
    NB = len(levels) - 1
    kff_l = [None] * (NB + 1)
    p_head_next = None
    for k in range(NB, -1, -1):
        mt = levels[k]
        if k == NB:
            T = qx_l[k].shape[-1]
            p = jnp.concatenate(
                [qterm, jnp.zeros((qterm.shape[0], d, T), qterm.dtype)],
                axis=1)
        else:
            p = comms.fold_up(p_head_next, k + 1)
        kffs = []
        for j in range(mt.l - 1, -1, -1):
            l_u = qu_l[k][:, j] + _mtv(B_l[k][:, j], p[:, :n, :]) + p[:, n:, :]
            kff = -_mv(Hinv_l[k][:, j], l_u)
            pn = _mtv(Acl_l[k][:, j], p) + _mtv(K_l[k][:, j], qu_l[k][:, j])
            p = _addvec(pn, qx_l[k][:, j], 0)
            kffs.append(kff)
        kffs.reverse()
        kff_l[k] = jnp.stack(kffs, axis=1)
        p_head_next = p
    return kff_l


def _forward_local(levels, comms, K_l, Acl_l, B_l, kff_l, n, d, dtype, T):
    """Forward rollout; returns per-level dx (nb_loc, lx, n, T) and
    du (nb_loc, l, d, T) blocks."""
    NB = len(levels) - 1
    xi = jnp.zeros((1, n + d, T), dtype)
    dx_l, du_l = [], []
    for k in range(NB + 1):
        mt = levels[k]
        if k > 0:
            xi = comms.repeat_down(xi, k)
        us, xs = [], []
        for j in range(mt.l):
            kf = kff_l[k][:, j]
            u = _mv(K_l[k][:, j], xi) + kf
            xs.append(xi[:, :n, :])
            xi = _mv(Acl_l[k][:, j], xi) + jnp.concatenate(
                [_mv(B_l[k][:, j], kf), kf], axis=1)
            us.append(u)
        if mt.leaf:
            xs.append(xi[:, :n, :])
        du_l.append(jnp.stack(us, axis=1))
        dx_l.append(jnp.stack(xs, axis=1))
    return dx_l, du_l


def make_sharded_tree_kkt(plan: StagePlan, mesh: Mesh, reg: float = 0.0,
                          dp_axis: str = "dp", mp_axis: str = "mp"):
    """Branch-sharded tree-Riccati KKT solve over `mesh`.

    Returns ``solve(blocks) -> (dx_levels, du_levels)`` (jitted shard_map).
    ``blocks`` is a dict of per-level lists as produced by
    :func:`split_ulevels` — keys Qx2/Dab2/Ru2/A/B/qx/qu of shapes
    (nb_k, l_k, ..., T) plus leaf-level Pterm2 (n_leaves, n, n, T) and qterm
    (n_leaves, n, T). The batch axis T shards over ``dp_axis``; each level's
    branch axis shards over ``mp_axis`` when divisible (root replicated).
    Fold order matches the unsharded sweeps exactly, so results are
    bit-identical to ``tree_qp_pl``'s `_factor_blocks`+`_linear_blocks`+
    `_forward_blocks` composition.
    """
    topo = plan.topo
    n, d, m = topo.n, topo.d, topo.m
    levels = build_levels(plan)
    mp_size = int(mesh.shape[mp_axis])
    shards = level_sharding(levels, mp_size)
    comms = _Comms(shards, m, mp_axis, mp_size)

    def lev_spec(extra_dims: int, k: int):
        first = mp_axis if shards[k] else None
        return P(first, *([None] * extra_dims), dp_axis)

    nlev = len(levels)
    in_specs = {
        # (nb, l, i, j, T)
        "Qx2": [lev_spec(3, k) for k in range(nlev)],
        "Dab2": [lev_spec(3, k) for k in range(nlev)],
        "Ru2": [lev_spec(3, k) for k in range(nlev)],
        "A": [lev_spec(3, k) for k in range(nlev)],
        "B": [lev_spec(3, k) for k in range(nlev)],
        # (nb, l, i, T)
        "qx": [lev_spec(2, k) for k in range(nlev)],
        "qu": [lev_spec(2, k) for k in range(nlev)],
        # leaf-level heads (n_leaves, ..., T)
        "Pterm2": P(mp_axis if shards[-1] else None, None, None, dp_axis),
        "qterm": P(mp_axis if shards[-1] else None, None, dp_axis),
    }
    out_specs = (
        [lev_spec(2, k) for k in range(nlev)],   # dx per level (nb, lx, n, T)
        [lev_spec(2, k) for k in range(nlev)],   # du per level (nb, l, d, T)
    )

    def solve_local(blocks):
        dtype = blocks["A"][0].dtype
        T = blocks["A"][0].shape[-1]
        K_l, Hinv_l, Acl_l = _factor_local(
            levels, comms, blocks["Qx2"], blocks["Dab2"], blocks["Ru2"],
            blocks["Pterm2"], blocks["A"], blocks["B"], n, d, reg)
        kff_l = _linear_local(
            levels, comms, K_l, Hinv_l, Acl_l, blocks["B"],
            blocks["qx"], blocks["qu"], blocks["qterm"], n, d)
        return _forward_local(
            levels, comms, K_l, Acl_l, blocks["B"], kff_l, n, d, dtype, T)

    return jax.jit(jax.shard_map(
        solve_local, mesh=mesh, in_specs=(in_specs,), out_specs=out_specs,
        check_vma=False))
