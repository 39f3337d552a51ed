"""Generate golden reference traces by running the ACTUAL upstream reference.

This script cannot run in the build environment (casadi/osqp/ecos are not
installed there — the oracle in ``belief_planning_tpu/oracle/`` is an
operation-for-operation NumPy transcription of the reference's assembly, and
the parity chain is anchored to that transcription; see PARITY.md "Oracle
provenance"). Run it ONE-OFF anywhere the reference's own stack works:

    pip install casadi osqp ecos numpy scipy
    python scripts/make_golden_traces.py /path/to/belief-planning tests/golden

It drives the reference's controllers directly (no env RNG) on the fixed
deterministic closed-loop scenario below — the demo overtake configuration
(``main_branch.py:24-48``) with the obstacle holding its maintain policy —
and saves the applied-input sequences as ``.npz``. Commit the outputs under
``tests/golden/``; ``tests/test_golden_traces.py`` then gates the oracle
transcription against true reference behavior (skipped while no traces are
committed).

Outputs (matched in test_golden_traces.py):
  qp_overtake.npz   — BranchMPCProx,  N=8, NB=2, 20 steps, key ``u`` (20, 2)
  cvar_overtake.npz — BranchMPC_CVaR (ralpha=0.9), same scenario, key ``u``
"""

import os
import sys

import numpy as np

STEPS = 20


def main(ref_dir, out_dir):
    sys.path.insert(0, ref_dir)
    os.makedirs(out_dir, exist_ok=True)

    from highway_branch_dyn import (  # noqa: E402
        PredictiveModel, backup_maintain, backup_brake, backup_lc,
    )
    from Init_MPC import initBranchMPC  # noqa: E402
    from MPC_branch import BranchMPCProx, BranchMPC_CVaR  # noqa: E402
    from utils import Branch_constants  # noqa: E402

    # demo overtake configuration (main_branch.py:24-48)
    N, n, d, NB = 8, 4, 2, 2
    am, rm, dt, N_lane = 6.0, 0.3, 0.1, 4
    xRef = np.array([0.5, 1.8, 15.0, 0.0])
    cons = Branch_constants(s1=2, s2=3, c2=0.5, tran_diag=0.3, alpha=1, R=1.2,
                            am=am, rm=rm, J_c=20, s_c=1, ylb=0., yub=7.2,
                            L=4, W=2.5, col_alpha=5, Kpsi=0.1)
    backupcons = [lambda x: backup_maintain(x, cons),
                  lambda x: backup_brake(x, cons),
                  lambda x: backup_lc(x, xRef)]

    def run(ctrl_kind):
        model = PredictiveModel(n, d, N, backupcons, dt, cons)
        mpcParam = initBranchMPC(n, d, N, NB, xRef, am, rm, N_lane, cons.W)
        if ctrl_kind == "prox":
            mpc = BranchMPCProx(mpcParam, model)
        else:
            mpc = BranchMPC_CVaR(mpcParam, model, ralpha=0.9)
        x = np.array([0.0, 1.8, 20.0, 0.0])
        z = np.array([9.0, 1.8, 17.0, 0.0])
        us = []
        for t in range(STEPS):
            mpc.solve(x, z, xRef)
            u = np.asarray(mpc.uPred[0], float).copy()
            us.append(u)
            x = x + np.array([x[2] * np.cos(x[3]), x[2] * np.sin(x[3]),
                              u[0], u[1]]) * dt
            # obstacle holds the maintain policy: u_z = (0, −Kψ·ψ)
            z = z + np.array([z[2] * np.cos(z[3]), z[2] * np.sin(z[3]),
                              0.0, -cons.Kpsi * z[3]]) * dt
        return np.asarray(us)

    np.savez(os.path.join(out_dir, "qp_overtake.npz"), u=run("prox"))
    np.savez(os.path.join(out_dir, "cvar_overtake.npz"), u=run("cvar"))
    print("golden traces written to", out_dir)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2] if len(sys.argv) > 2 else "tests/golden")
