"""Closed-loop QP-IPM iteration-count study: iters × gondzio correctors.

For each (iters, gondzio) config, runs the test_controller_parity closed-loop
episode (N=8, NB=2 overtake, 10 steps, cold first solve included) and reports
the max applied-input deviation vs the NumPy oracle. The BASELINE.md gate is
1e-3; bench.py currently runs IPM-12 gondzio=0 (measured 2.6e-4).

CPU/f64 (conftest-equivalent config set below). Usage:
    python scripts/qp_iter_study.py [n_steps]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

from belief_planning_tpu.solvers.tree_qp_ipm import QPIPMConfig


def main():
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    from tests.test_controller_parity import simulate_closed_loop

    print(f"closed-loop overtake, {n_steps} steps, N=8 NB=2; gate 1e-3")
    for gondzio in (0, 1, 2):
        for iters in (6, 8, 10, 12):
            u_o, u_j, _, _ = simulate_closed_loop(
                n_steps=n_steps, N=8,
                ipm=QPIPMConfig(iters=iters, gondzio=gondzio))
            err = np.abs(u_o - u_j).max()
            ok = "PASS" if err < 1e-3 else "fail"
            print(f"iters={iters:3d} gondzio={gondzio}  max|du|={err:.3e} {ok}")


if __name__ == "__main__":
    main()
