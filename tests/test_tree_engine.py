"""Parity tests: static topology + JAX tree engine vs the NumPy oracle transcription
of the reference's BFS tree construction (``MPC_branch.py:129-263``)."""

import numpy as np
import pytest

from belief_planning_tpu.models.policies import highway_policy_set
from belief_planning_tpu.models.predictive import highway_model
from belief_planning_tpu.oracle.reference_tree import OracleModelAdapter, OracleBranchController
from belief_planning_tpu.tree.topology import build_topology
from belief_planning_tpu.tree.engine import build_tree, shift_warm_start
from belief_planning_tpu.utils.config import BranchConstants, BranchMPCParams
from belief_planning_tpu.oracle import reference_tree


def overtake_setup(N=8, NB=2):
    cons = BranchConstants()
    xt = np.array([0.5, 1.8, 15.0, 0.0])
    pset = highway_policy_set(cons, xt)
    model = highway_model(cons, pset, N=N, dt=0.1)
    Fx = np.array([[0., 1, 0, 0], [0., -1, 0, 0], [0., 0, 0, 1], [0., 0, 0, -1]])
    bx = np.array([4 * 3.6 - 1.25, -1.25, 0.25, 0.25])
    Fu = np.kron(np.eye(2), np.array([1., -1])).T
    bu = np.array([6.0, 6.0, 0.3, 0.3])
    params = BranchMPCParams(
        n=4, d=2, N=N, NB=NB,
        Q=np.diag([0., 3, 3, 10.]), R=np.diag([1., 100.]),
        Qslack=np.array([0., 300.]), Fx=Fx, bx=bx, Fu=Fu, bu=bu,
        xRef=xt,
    )
    return cons, pset, model, params


def test_topology_counts_match_reference_sizes():
    # SURVEY.md §2.2 derived sizes
    topo = build_topology(N=8, NB=2, m=3, n=4, d=2)
    assert topo.n_branches == 13
    assert topo.totalx == 106
    assert topo.totalu == 97
    topo = build_topology(N=40, NB=1, m=2, n=4, d=2)
    assert topo.totalx == 83 and topo.totalu == 81
    topo = build_topology(N=25, NB=2, m=2, n=3, d=3)
    assert topo.totalx == 155 and topo.totalu == 151


def test_topology_offsets_match_oracle():
    cons, pset, model, params = overtake_setup()
    adapter = OracleModelAdapter(model, pset.params)
    ctrl = OracleBranchController(params, adapter, "prox")
    x = np.array([0.0, 1.8, 20.0, 0.0])
    z = np.array([5.0, 5.4, 20.0, 0.0])
    ctrl.inittree(x, z)
    topo = build_topology(params.N, params.NB, model.m, params.n, params.d)
    brs = ctrl.branches_bfs()
    assert len(brs) == topo.n_branches
    for j, br in enumerate(brs):
        assert ctrl.ndx[br] == topo.x_off[j]
        assert ctrl.ndu[br] == topo.u_off[j]
        assert br.depth == topo.depth[j]
    assert ctrl.totalx == topo.totalx
    assert ctrl.totalu == topo.totalu


def compare_tree(ctrl, ts, topo, atol=1e-9):
    brs = ctrl.branches_bfs()
    ts_x = np.asarray(ts.x_lin)
    ts_z = np.asarray(ts.z)
    ts_p = np.asarray(ts.p)
    ts_dp = np.asarray(ts.dp)
    ts_w = np.asarray(ts.w)
    for j, br in enumerate(brs):
        ox, ou, l = topo.x_off[j], topo.u_off[j], topo.blen[j]
        assert np.allclose(ts_x[ox:ox + l], br.xtraj, atol=atol), f"xtraj branch {j}"
        assert np.allclose(ts_z[ou:ou + l], br.ztraj, atol=atol), f"ztraj branch {j}"
        assert np.isclose(ts_w[j], br.w, atol=atol), f"w branch {j}"
        if br.p is not None:
            assert np.allclose(ts_p[j], br.p, atol=atol), f"p branch {j}"
            assert np.allclose(ts_dp[j], br.dp, atol=atol), f"dp branch {j}"
    # dynamics matrices per node
    A = np.asarray(ts.A)
    Bm = np.asarray(ts.Bm)
    C = np.asarray(ts.C)
    for j, br in enumerate(brs):
        ox = topo.x_off[j]
        l = topo.blen[j]
        for t in range(1, l):
            Ar, Br, Cr = br.dynmatr[t - 1]
            assert np.allclose(A[ox + t], Ar, atol=atol)
            assert np.allclose(Bm[ox + t], Br, atol=atol)
            assert np.allclose(C[ox + t], Cr, atol=atol)
        Ar, Br, Cr = br.dynmatr[-1]
        if topo.is_leaf[j]:
            assert np.allclose(A[ox + l], Ar, atol=atol)
        else:
            for c in topo.children[j]:
                assert np.allclose(A[topo.x_off[c]], Ar, atol=atol)
                assert np.allclose(C[topo.x_off[c]], Cr, atol=atol)
    # collision rows
    Nc = ctrl.Fx.shape[0] + 1
    h0 = np.asarray(ts.h0)
    dh = np.asarray(ts.dh)
    for j, br in enumerate(brs):
        ou, l = topo.u_off[j], topo.blen[j]
        for i in range(l):
            h_r, dh_r = ctrl.model.col_eval(br.xtraj[i], br.ztraj[i])
            assert np.isclose(h0[ou + i], h_r, atol=atol)
            assert np.allclose(dh[ou + i], dh_r, atol=atol)


def test_inittree_parity():
    cons, pset, model, params = overtake_setup()
    adapter = OracleModelAdapter(model, pset.params)
    ctrl = OracleBranchController(params, adapter, "prox")
    x = np.array([0.0, 1.8, 20.0, 0.0])
    z = np.array([5.0, 5.4, 20.0, 0.0])
    ctrl.inittree(x, z)
    topo = build_topology(params.N, params.NB, model.m, params.n, params.d)
    u0 = np.zeros((topo.totalu, params.d))
    ts = build_tree(model, topo, x, z, u0, pset.params)
    compare_tree(ctrl, ts, topo)


def test_updatetree_parity():
    cons, pset, model, params = overtake_setup(N=4, NB=2)
    adapter = OracleModelAdapter(model, pset.params)
    ctrl = OracleBranchController(params, adapter, "prox")
    x = np.array([0.0, 1.8, 20.0, 0.0])
    z = np.array([6.0, 5.4, 19.0, 0.0])
    ctrl.inittree(x, z)
    topo = build_topology(params.N, params.NB, model.m, params.n, params.d)

    # pretend a solve produced some input trajectory
    rng = np.random.default_rng(3)
    u_sol = rng.normal(scale=0.2, size=(topo.totalu, params.d))
    ctrl.uLin = np.vstack((u_sol, u_sol[-1]))

    x2 = np.array([2.0, 1.9, 20.1, 0.01])
    z2 = np.array([7.9, 5.3, 19.0, -0.01])
    ctrl.updatetree(x2, z2)

    ts0 = build_tree(model, topo, x, z, np.zeros((topo.totalu, params.d)), pset.params)
    u_shift = shift_warm_start(topo, u_sol, ts0.p)
    # oracle shift result must match
    brs = ctrl.branches_bfs()
    for j, br in enumerate(brs):
        ou, l = topo.u_off[j], topo.blen[j]
        assert np.allclose(np.asarray(u_shift)[ou:ou + l], br.utraj, atol=1e-12), f"u shift branch {j}"

    ts = build_tree(model, topo, x2, z2, u_shift, pset.params)
    compare_tree(ctrl, ts, topo)
