"""Test configuration.

Tests run on CPU with a virtual 8-device mesh (for sharding tests) and float64
enabled (the parity gate vs the NumPy oracle is 1e-3 over full closed-loop episodes;
see BASELINE.md). The library itself is dtype-agnostic — on TPU it runs float32.
"""

import os

# Force CPU: the ambient environment points JAX at the tunneled TPU ("axon"),
# which is both slow for many tiny test programs and single-chip. Tests validate
# numerics on CPU (x64) and shardings on a virtual 8-device CPU mesh.
# NOTE: a sitecustomize module imports jax before this file runs, so the env var
# alone is too late — set the config directly as well.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)
