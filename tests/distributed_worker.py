"""Multi-process (multi-host analog) worker for the distributed ensemble test.

Launched twice by ``tests/test_distributed.py`` (process_id 0 and 1), each
process owning 4 virtual CPU devices — the multi-controller SPMD topology of a
2-host TPU pod slice (SURVEY.md §2.4 comm-backend row; BASELINE.md
"1 host / ≥2 hosts"). Each process:

1. joins the coordination service (``jax.distributed.initialize``);
2. builds the global 2×4 ("dp","mp") mesh over all 8 global devices;
3. assembles globally-sharded inputs for a B=16 flagship-path IPM ensemble via
   ``jax.make_array_from_callback`` (each process materializes only its
   addressable shards);
4. runs the ``shard_map`` ensemble step (cross-process ``psum``/``pmax``
   ensemble metrics ride the collective backend);
5. checks its local output shards bitwise-nearly against a single-process
   reference computed locally, and the replicated metrics for consistency.

Prints ``DIST-OK <pid>`` on success; any assertion/exception exits nonzero.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=4"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402


def main():
    coord, pid = sys.argv[1], int(sys.argv[2])
    jax.distributed.initialize(coordinator_address=coord, num_processes=2,
                               process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, len(jax.devices())
    assert len(jax.local_devices()) == 4

    from belief_planning_tpu.models.policies import highway_policy_set
    from belief_planning_tpu.models.predictive import highway_model
    from belief_planning_tpu.parallel.ensemble import (
        make_sharded_ipm_ensemble_step,
    )
    from belief_planning_tpu.presets import init_branch_mpc
    from belief_planning_tpu.solvers.tree_qp_ipm import QPIPMConfig
    from belief_planning_tpu.utils.config import BranchConstants

    N, NB, B = 4, 1, 16
    xRef = np.array([0.5, 1.8, 15.0, 0.0])
    cons = BranchConstants()
    pset = highway_policy_set(cons, xRef)
    model = highway_model(cons, pset, N=N, dt=0.1)
    params = init_branch_mpc(4, 2, N, NB, xRef, 6.0, 0.3, 4, cons.W)
    ipm = QPIPMConfig(iters=6, gondzio=1)

    mesh = Mesh(np.asarray(jax.devices()).reshape(2, 4), ("dp", "mp"))
    topo, init_batched, sharded = make_sharded_ipm_ensemble_step(
        model, params, mesh, ipm=ipm, backend="pl_xla")

    rng = np.random.default_rng(0)
    xs = np.tile([0.0, 1.8, 20.0, 0.0], (B, 1)) + 0.1 * rng.standard_normal((B, 4))
    zs = np.tile([9.0, 1.8, 17.0, 0.0], (B, 1)) + 0.1 * rng.standard_normal((B, 4))
    xRefs = np.tile(xRef, (B, 1))

    # host-side full pytrees (identical on both processes — same seed)
    carry_host = jax.tree.map(np.asarray, init_batched(B, jnp.float64))
    host = {"carry": carry_host, "x": xs, "z": zs, "xRef": xRefs}

    sh = NamedSharding(mesh, P(("dp", "mp")))

    def to_global(a):
        a = np.asarray(a)
        return jax.make_array_from_callback(a.shape, sh, lambda idx: a[idx])

    carry_g = jax.tree.map(to_global, host["carry"])
    xs_g, zs_g, xRefs_g = map(to_global, (xs, zs, xRefs))

    _, u_g, metrics = sharded(carry_g, xs_g, zs_g, xRefs_g, pset.params)

    # replicated metrics are addressable everywhere
    feas = float(metrics["feasible_frac"])
    assert feas == 1.0, f"feasible_frac {feas}"

    # local single-device reference on the full batch (vmapped prep + same
    # solver layout, no mesh): compare this process's addressable shards
    from belief_planning_tpu.controllers.branch_mpc import (
        make_branch_mpc_batched_step,
    )
    _, init_local, bstep = make_branch_mpc_batched_step(
        model, params, ipm=ipm, backend="pl_xla")
    carry_l = init_local(jnp.float64)
    carry_lb = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape), carry_l)
    _, res = jax.jit(bstep, static_argnames=())(carry_lb, xs, zs, xRefs, pset.params)
    u_ref = np.asarray(res.uPred)

    for shard in u_g.addressable_shards:
        sl = shard.index[0]
        np.testing.assert_allclose(np.asarray(shard.data), u_ref[sl],
                                   rtol=0, atol=1e-9)
    print(f"DIST-OK {pid}", flush=True)


if __name__ == "__main__":
    main()
