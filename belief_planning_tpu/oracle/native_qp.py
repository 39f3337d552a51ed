"""ctypes binding for the first-party C++ OSQP-style QP solver.

The reference's QP backend is the third-party OSQP C library; ``native/
qp_admm.cpp`` is our self-contained native implementation of the same ADMM.
It is an *oracle cross-check* backend (the TPU path solves on device). The
shared library is built on demand with g++; if no compiler is available the
binding reports unavailable and callers fall back to the NumPy IPM.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_LIB = None
_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "native", "qp_admm.cpp")
_SO = os.path.join(os.path.dirname(__file__), "..", "..", "native", "libqp_admm.so")


def _build() -> bool:
    src = os.path.abspath(_SRC)
    so = os.path.abspath(_SO)
    if os.path.exists(so) and os.path.getmtime(so) >= os.path.getmtime(src):
        return True
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-o", so, src],
            check=True, capture_output=True,
        )
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def available() -> bool:
    return _load() is not None


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    if not _build():
        return None
    lib = ctypes.CDLL(os.path.abspath(_SO))
    lib.qp_admm_solve.restype = ctypes.c_int
    lib.qp_admm_solve.argtypes = [
        np.ctypeslib.ndpointer(np.float64, flags="C"),  # P
        np.ctypeslib.ndpointer(np.float64, flags="C"),  # q
        np.ctypeslib.ndpointer(np.float64, flags="C"),  # A
        np.ctypeslib.ndpointer(np.float64, flags="C"),  # l
        np.ctypeslib.ndpointer(np.float64, flags="C"),  # u
        ctypes.c_int, ctypes.c_int,
        ctypes.c_double, ctypes.c_double, ctypes.c_double, ctypes.c_int,
        ctypes.c_double,
        np.ctypeslib.ndpointer(np.float64, flags="C"),  # x_out
        np.ctypeslib.ndpointer(np.float64, flags="C"),  # y_out
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_double),
    ]
    _LIB = lib
    return lib


def solve_qp_native(
    P: np.ndarray,
    q: np.ndarray,
    A: Optional[np.ndarray] = None,
    b: Optional[np.ndarray] = None,
    G: Optional[np.ndarray] = None,
    g: Optional[np.ndarray] = None,
    rho: float = 0.1,
    sigma: float = 1e-6,
    alpha: float = 1.6,
    max_iter: int = 20000,
    eps: float = 1e-9,
) -> Tuple[np.ndarray, np.ndarray, int, float, bool]:
    """Solve min ½xᵀPx+qᵀx s.t. Ax ≤ b, Gx = g — the oracle `solve_qp`
    interface mapped onto the native l ≤ Mx ≤ u form (equalities get l = u,
    exactly as the reference stacks OSQP rows, ``MPC_branch.py:471-474``)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native QP solver unavailable (no g++)")
    P = np.ascontiguousarray(P, np.float64)
    q = np.ascontiguousarray(q, np.float64).ravel()
    n = q.shape[0]
    rows, lo, hi = [], [], []
    if A is not None and A.shape[0] > 0:
        rows.append(np.asarray(A, np.float64))
        lo.append(np.full(A.shape[0], -1e30))
        hi.append(np.asarray(b, np.float64).ravel())
    if G is not None and G.shape[0] > 0:
        rows.append(np.asarray(G, np.float64))
        lo.append(np.asarray(g, np.float64).ravel())
        hi.append(np.asarray(g, np.float64).ravel())
    M = np.ascontiguousarray(np.vstack(rows))
    l = np.ascontiguousarray(np.concatenate(lo))
    u = np.ascontiguousarray(np.concatenate(hi))
    m = M.shape[0]
    x = np.zeros(n)
    y = np.zeros(m)
    iters = ctypes.c_int(0)
    res = ctypes.c_double(0.0)
    code = lib.qp_admm_solve(P, q, M, l, u, n, m, rho, sigma, alpha,
                             max_iter, eps, x, y, ctypes.byref(iters),
                             ctypes.byref(res))
    return x, y, int(iters.value), float(res.value), code == 0
