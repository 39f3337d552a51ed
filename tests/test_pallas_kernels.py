"""Pallas kernels vs their jnp references (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from belief_planning_tpu.ops.pallas_kernels import proj_soc_pallas
from belief_planning_tpu.solvers.cvar import _proj_soc_batch


def test_soc_projection_matches_reference():
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.normal(scale=3.0, size=(64, 8)).astype(np.float32))
    ref = np.asarray(_proj_soc_batch(v))
    out = np.asarray(proj_soc_pallas(v))
    assert np.allclose(out, ref, atol=1e-6), np.abs(out - ref).max()
    # projection invariants: in-cone stays, output always in cone
    t = out[:, 0]
    nu = np.linalg.norm(out[:, 1:], axis=1)
    assert np.all(nu <= t + 1e-5)
