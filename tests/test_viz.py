"""Visualization smoke tests (Agg backend, no display)."""

import matplotlib

matplotlib.use("Agg")

import numpy as np
import jax.numpy as jnp
import pytest

from belief_planning_tpu.envs.viz import plot_highway_snapshot
from tests.test_subsystems import make_env


def test_highway_snapshot_renders():
    env = make_env()
    env.step(0)
    ax = plot_highway_snapshot(env)
    # vehicle patches + tree lines drawn
    assert len(ax.patches) >= 2
    assert len(ax.lines) >= 3
    import matplotlib.pyplot as plt
    plt.close("all")
