"""Gate the oracle transcription against golden traces of the true reference.

The parity chain (PARITY.md) is anchored to ``oracle/reference_*.py`` — an
operation-for-operation transcription of the reference's assembly, solved to
optimality. The residual risk is transcription error. These tests shrink it:
``scripts/make_golden_traces.py`` runs the ACTUAL reference (casadi/osqp/ecos)
on a fixed closed-loop overtake scenario, and this module replays the oracle
on the identical scenario against the committed ``.npz`` traces.

Skipped while ``tests/golden/`` holds no traces (the build environment has no
casadi/osqp/ecos to generate them; see the generator's docstring). OSQP with
``polish=True`` and ECOS both return exact optima, so the oracle's dense IPM
should match within solver tolerance — the gate is 1e-3, the closed-loop
BASELINE.md tolerance.
"""

import os

import numpy as np
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
STEPS = 20


def _load(name):
    path = os.path.join(GOLDEN_DIR, name)
    if not os.path.exists(path):
        pytest.skip(f"no golden trace {name}; generate with "
                    "scripts/make_golden_traces.py in a casadi/osqp/ecos env")
    return np.load(path)["u"]


def _demo_setup():
    from belief_planning_tpu.models.policies import highway_policy_set
    from belief_planning_tpu.models.predictive import highway_model
    from belief_planning_tpu.presets import init_branch_mpc
    from belief_planning_tpu.utils.config import BranchConstants

    am, rm, dt, N_lane = 6.0, 0.3, 0.1, 4
    xRef = np.array([0.5, 1.8, 15.0, 0.0])
    cons = BranchConstants(s1=2, s2=3, c2=0.5, tran_diag=0.3, alpha=1, R=1.2,
                           am=am, rm=rm, J_c=20, s_c=1, ylb=0., yub=7.2,
                           L=4, W=2.5, col_alpha=5, Kpsi=0.1)
    pset = highway_policy_set(cons, xRef)
    model = highway_model(cons, pset, N=8, dt=dt)
    params = init_branch_mpc(4, 2, 8, 2, xRef, am, rm, N_lane, cons.W)
    return cons, pset, model, params, xRef


def _replay(solve_fn, cons, xRef):
    x = np.array([0.0, 1.8, 20.0, 0.0])
    z = np.array([9.0, 1.8, 17.0, 0.0])
    us = []
    dt = 0.1
    for t in range(STEPS):
        u = np.asarray(solve_fn(x, z, xRef), float).copy()
        us.append(u)
        x = x + np.array([x[2] * np.cos(x[3]), x[2] * np.sin(x[3]),
                          u[0], u[1]]) * dt
        z = z + np.array([z[2] * np.cos(z[3]), z[2] * np.sin(z[3]),
                          0.0, -cons.Kpsi * z[3]]) * dt
    return np.asarray(us)


def test_oracle_qp_matches_reference_golden():
    u_gold = _load("qp_overtake.npz")
    from belief_planning_tpu.oracle.reference_tree import (
        OracleBranchController, OracleModelAdapter,
    )

    cons, pset, model, params, xRef = _demo_setup()
    adapter = OracleModelAdapter(model, pset.params)
    oracle = OracleBranchController(params, adapter, "prox")
    u_o = _replay(oracle.solve, cons, xRef)
    assert u_gold.shape == u_o.shape
    assert np.abs(u_gold - u_o).max() < 1e-3


def test_oracle_cvar_matches_reference_golden():
    u_gold = _load("cvar_overtake.npz")
    from belief_planning_tpu.oracle.reference_cvar import OracleCVaRController
    from belief_planning_tpu.oracle.reference_tree import OracleModelAdapter

    cons, pset, model, params, xRef = _demo_setup()
    adapter = OracleModelAdapter(model, pset.params)
    oracle = OracleCVaRController(params, adapter, ralpha=0.9)
    u_o = _replay(oracle.solve, cons, xRef)
    assert u_gold.shape == u_o.shape
    assert np.abs(u_gold - u_o).max() < 1e-3
