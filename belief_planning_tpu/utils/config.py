"""Configuration dataclasses.

Mirrors the semantic content of the reference config layer (``utils.py:26-90`` and
``MPC_branch.py:27-54``) but split into *static* hashable scenario constants (safe to
close over in jitted functions) and *numeric* parameter bundles (arrays, passed as
runtime arguments so a single compiled program serves many parameterizations).

Notable reference behaviors preserved:
- ``BranchMPCParams.Qf`` defaults to ``Q`` (``MPC_branch.py:52``) while the legacy
  ``MPCParams.Qf`` defaults to zeros (``utils.py:88``).
- ``Qslack = [quadraticSlackCost, linearSlackCost]`` as *used* by the reference
  (``MPC_branch.py:317-321``: index 0 multiplies the identity quadratic term, index 1
  the linear term — the reference's own comment has them swapped).
- ``HMMConstants`` exists here even though the reference's import of it is broken
  (``HMM_backup_dyn.py:5`` imports a class ``utils.py`` never defines); the fields are
  those consumed by the HMM model (s1, s2, c2, tran_diag, alpha, R, am, rm, ylb, yub,
  L, W, col_alpha, Kpsi).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Optional

import numpy as np


@dataclass(frozen=True)
class BranchConstants:
    """Branch prediction / collision / vehicle-model constants.

    Reference: ``utils.py:26-42`` (``Branch_constants``).
    """

    s1: float = 2.0          # branch-probability temperature (paper eq. 11)
    s2: float = 3.0          # HMM observation-weight temperature
    c2: float = 0.5          # HMM observation-weight offset
    tran_diag: float = 0.3   # HMM transition-matrix diagonal boost
    alpha: float = 1.0       # CBF decay rate
    R: float = 1.2           # obstacle radius (legacy HMM cost)
    am: float = 6.0          # max acceleration magnitude
    rm: float = 0.3          # max steering rate magnitude
    J_c: float = 20.0        # legacy obstacle-cost magnitude
    s_c: float = 1.0         # legacy obstacle-cost sharpness
    ylb: float = 0.0         # road lower boundary
    yub: float = 7.2         # road upper boundary
    L: float = 4.0           # vehicle length
    W: float = 2.5           # vehicle width
    col_alpha: float = 5.0   # collision softmax sharpness
    Kpsi: float = 0.1        # heading P-gain for maintain/brake policies


@dataclass(frozen=True)
class QuadConstants:
    """Quadruped constants. Reference: ``utils.py:45-59`` (``Quad_constants``)."""

    s1: float = 2.0
    s2: float = 3.0
    c2: float = 0.5
    alpha: float = 1.0
    R: float = 1.2
    vxm: float = 0.2         # max body-frame forward velocity
    vym: float = 0.1         # max body-frame lateral velocity
    rm: float = 0.5          # max yaw rate
    W1: float = 0.3          # ego body width
    L1: float = 0.5          # ego body length
    W2: float = 0.6          # obstacle body width
    L2: float = 1.0          # obstacle body length
    col_tol: float = 0.2     # collision margin tolerance
    col_alpha: float = 5.0


@dataclass(frozen=True)
class HMMConstants:
    """Constants consumed by the HMM belief model (rebuilt working; the reference's
    ``HMM_constants`` import is broken, ``HMM_backup_dyn.py:5``)."""

    s1: float = 2.0
    s2: float = 3.0
    c2: float = 0.5
    tran_diag: float = 0.3
    alpha: float = 1.0
    R: float = 1.2
    am: float = 6.0
    rm: float = 0.3
    J_c: float = 20.0
    s_c: float = 1.0
    ylb: float = 0.0
    yub: float = 7.2
    L: float = 4.0
    W: float = 2.4
    col_alpha: float = 5.0
    Kpsi: float = 0.1


def _as_array(x, like=None) -> Optional[np.ndarray]:
    if x is None:
        return None
    return np.asarray(np.squeeze(np.asarray(x, dtype=np.float64)))


@dataclass
class BranchMPCParams:
    """Branch-MPC controller parameters. Reference: ``MPC_branch.py:27-54``.

    ``n, d, N, NB`` are static (determine compiled shapes); the arrays are runtime
    parameters. ``bx`` may arrive wrapped in a 1-tuple (the reference's ``Init_MPC``
    leaves a trailing comma, ``Init_MPC.py:48-51``); we unwrap and flatten it.
    """

    n: int = 4
    d: int = 2
    N: int = 8
    NB: int = 2

    Q: np.ndarray = None
    R: np.ndarray = None
    Qf: np.ndarray = None
    dR: np.ndarray = None
    Qslack: np.ndarray = None
    Fx: np.ndarray = None
    bx: np.ndarray = None
    Fu: np.ndarray = None
    bu: np.ndarray = None
    xRef: np.ndarray = None

    slacks: bool = True
    timeVarying: bool = False

    def __post_init__(self):
        if isinstance(self.bx, tuple):  # reference trailing-comma quirk
            self.bx = self.bx[0]
        for name in ("Q", "R", "Qf", "dR", "Qslack", "bx", "bu", "xRef"):
            setattr(self, name, _as_array(getattr(self, name)))
        for name in ("Fx", "Fu"):
            v = getattr(self, name)
            if v is not None:
                setattr(self, name, np.asarray(v, dtype=np.float64))
        if self.Qf is None and self.Q is not None:
            self.Qf = np.array(self.Q)   # MPC_branch.py:52 (differs from legacy)
        if self.dR is None:
            self.dR = np.zeros(self.d)
        if self.xRef is None:
            self.xRef = np.zeros(self.n)
        if self.bx is not None:
            self.bx = np.atleast_1d(self.bx)
        if self.bu is not None:
            self.bu = np.atleast_1d(self.bu)

    def replace(self, **kw) -> "BranchMPCParams":
        return dataclasses.replace(self, **kw)


@dataclass
class MPCParams:
    """Legacy HMM-belief MPC parameters. Reference: ``utils.py:62-90``.

    ``Qf`` defaults to zeros here (``utils.py:88``) — a deliberate behavioral
    difference from :class:`BranchMPCParams`.
    """

    n: int = 4
    d: int = 2
    N: int = 10
    M: int = 1               # number of uncontrolled agents
    m: int = 2               # number of backup policies

    Q: np.ndarray = None
    R: np.ndarray = None
    Qf: np.ndarray = None
    dR: np.ndarray = None
    Qslack: np.ndarray = None
    Fx: np.ndarray = None
    bx: np.ndarray = None
    Fu: np.ndarray = None
    bu: np.ndarray = None
    xRef: np.ndarray = None

    slacks: bool = True
    timeVarying: bool = False

    def __post_init__(self):
        if isinstance(self.bx, tuple):
            self.bx = self.bx[0]
        for name in ("Q", "R", "Qf", "dR", "Qslack", "bx", "bu", "xRef"):
            setattr(self, name, _as_array(getattr(self, name)))
        for name in ("Fx", "Fu"):
            v = getattr(self, name)
            if v is not None:
                setattr(self, name, np.asarray(v, dtype=np.float64))
        if self.Qf is None and self.Q is not None:
            self.Qf = np.zeros_like(self.Q)  # utils.py:88
        if self.dR is None:
            self.dR = np.zeros(self.d)
        if self.xRef is None:
            self.xRef = np.zeros(self.n)
        if self.bx is not None:
            self.bx = np.atleast_1d(self.bx)
        if self.bu is not None:
            self.bu = np.atleast_1d(self.bu)

    def replace(self, **kw) -> "MPCParams":
        return dataclasses.replace(self, **kw)
