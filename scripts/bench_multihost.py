"""Multi-host aggregate-throughput harness (BASELINE.md "1 host / >=2 hosts").

Runs the flagship batched branch-MPC ensemble step under ``jax.distributed``
across N processes, each owning its local devices, with the batch sharded
over the global mesh — the same multi-controller SPMD topology as a real TPU
pod slice. Every process times its own lock-step execution (device->host
fetch of a local shard, the only truthful clock through the tunneled
runtime); per-process times are allgathered and the AGGREGATE number uses the
slowest process (the pod's actual rate). Process 0 prints one JSON line:

    {"metric": "multihost_aggregate_solves_per_sec", "value": ...,
     "n_proc": ..., "n_devices": ..., "B_global": ..., "per_proc_ms": [...]}

Modes
-----
Launcher (this box, 2-process CPU mesh — the CI-exercised path):

    python scripts/bench_multihost.py                 # spawns 2 workers

Worker (one per host; launched by the launcher, or run manually per host of
a real multi-host pod — the script runs UNMODIFIED there):

    # real TPU pod (one invocation per host; jax autodetects the pod):
    python scripts/bench_multihost.py --worker --tpu --config flagship --backend pl

    # CPU-mesh worker (what the launcher spawns):
    python scripts/bench_multihost.py --worker --coord 127.0.0.1:PORT \
        --nproc 2 --pid 0 --devices-per-proc 4

Protocol (BASELINE.md scaling story): record bench.py (1 chip), this script
with --nproc 1 (1 host), and with --nproc >=2 (multi-host). On CPU meshes the
absolute rate is meaningless — the artifact is that the SPMD program, the
sharded data plumbing, and the timing/reduction protocol run unmodified at
every scale. ``tests/test_distributed.py`` exercises the 2-process path.
"""

import argparse
import json
import os
import socket
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def worker(args):
    if args.tpu:
        import jax
        jax.distributed.initialize()  # autodetects the pod topology
    else:
        os.environ["JAX_PLATFORMS"] = "cpu"
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags +
                f" --xla_force_host_platform_device_count={args.devices_per_proc}"
            ).strip()
        import jax
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", args.devices_per_proc)
        jax.distributed.initialize(coordinator_address=args.coord,
                                   num_processes=args.nproc,
                                   process_id=args.pid)

    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from belief_planning_tpu.models.policies import highway_policy_set
    from belief_planning_tpu.models.predictive import highway_model
    from belief_planning_tpu.parallel.ensemble import (
        make_sharded_ipm_ensemble_step,
    )
    from belief_planning_tpu.presets import init_branch_mpc
    from belief_planning_tpu.solvers.tree_qp_ipm import QPIPMConfig
    from belief_planning_tpu.utils.config import BranchConstants

    pid = jax.process_index()
    n_proc = jax.process_count()
    devs = jax.devices()
    n_dev = len(devs)

    if args.config == "flagship":
        # the bench.py overtake configuration (reference main_branch.py:24-48)
        N, NB = 8, 2
        ipm = QPIPMConfig(iters=8, gondzio=2)
        b_per_dev = args.batch_per_device or 2048
    else:
        # small CPU-mesh config (matches tests/distributed_worker.py sizes)
        N, NB = 4, 1
        ipm = QPIPMConfig(iters=6, gondzio=1)
        b_per_dev = args.batch_per_device or 8
    B = b_per_dev * n_dev

    xRef = np.array([0.5, 1.8, 15.0, 0.0])
    cons = BranchConstants()
    pset = highway_policy_set(cons, xRef)
    model = highway_model(cons, pset, N=N, dt=0.1)
    params = init_branch_mpc(4, 2, N, NB, xRef, 6.0, 0.3, 4, cons.W)

    # 1-D dp mesh over every global device: worlds are independent, so the
    # batch axis is the only sharded axis and the step is communication-free
    # except for the psum'd ensemble metrics.
    mesh = Mesh(np.asarray(devs).reshape(n_dev), ("dp",))
    topo, init_batched, sharded = make_sharded_ipm_ensemble_step(
        model, params, mesh, ipm=ipm, backend=args.backend)

    rng = np.random.default_rng(0)
    xs = np.tile([0.0, 1.8, 20.0, 0.0], (B, 1)) + 0.1 * rng.standard_normal((B, 4))
    zs = np.tile([9.0, 1.8, 17.0, 0.0], (B, 1)) + 0.1 * rng.standard_normal((B, 4))
    xRefs = np.tile(xRef, (B, 1))
    dtype = jnp.float32

    sh = NamedSharding(mesh, P("dp"))

    def to_global(a):
        a = np.asarray(a, dtype)
        return jax.make_array_from_callback(a.shape, sh, lambda idx: a[idx])

    carry_g = jax.tree.map(to_global,
                           jax.tree.map(np.asarray, init_batched(B, dtype)))
    xs_g, zs_g, xRefs_g = map(to_global, (xs, zs, xRefs))

    # warm-up / compile
    carry_g, u_g, metrics = sharded(carry_g, xs_g, zs_g, xRefs_g, pset.params)
    _ = np.asarray(u_g.addressable_shards[0].data)

    times = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        carry_g, u_g, metrics = sharded(carry_g, xs_g, zs_g, xRefs_g,
                                        pset.params)
        # fetch a local shard: through the tunneled runtime only a
        # device->host copy is a truthful barrier (bench.py docstring)
        _ = np.asarray(u_g.addressable_shards[0].data)
        times.append(time.perf_counter() - t0)
    my_ms = float(np.median(times)) * 1e3

    from jax.experimental import multihost_utils
    all_ms = np.asarray(
        multihost_utils.process_allgather(jnp.asarray([my_ms]))).ravel()
    agg = B / (float(all_ms.max()) * 1e-3)

    if pid == 0:
        print(json.dumps({
            "metric": "multihost_aggregate_solves_per_sec",
            "value": round(agg, 1),
            "unit": "solves/s",
            "n_proc": n_proc,
            "n_devices": n_dev,
            "B_global": B,
            "config": args.config,
            "backend": args.backend,
            "feasible_frac": float(metrics["feasible_frac"]),
            "per_proc_ms": [round(m, 2) for m in all_ms.tolist()],
        }), flush=True)
    jax.distributed.shutdown()


def launcher(args):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    procs = []
    for pid in range(args.nproc):
        cmd = [sys.executable, os.path.abspath(__file__), "--worker",
               "--coord", coord, "--nproc", str(args.nproc), "--pid", str(pid),
               "--devices-per-proc", str(args.devices_per_proc),
               "--config", args.config, "--backend", args.backend,
               "--iters", str(args.iters)]
        if args.batch_per_device:
            cmd += ["--batch-per-device", str(args.batch_per_device)]
        procs.append(subprocess.Popen(
            cmd, stdout=(None if pid == 0 else subprocess.DEVNULL),
            stderr=subprocess.DEVNULL, cwd=REPO))
    rcs = [p.wait(timeout=args.timeout) for p in procs]
    if any(rcs):
        raise SystemExit(f"worker exit codes: {rcs}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--tpu", action="store_true",
                    help="real pod: jax.distributed.initialize() autodetect")
    ap.add_argument("--coord", default="127.0.0.1:12345")
    ap.add_argument("--nproc", type=int, default=2)
    ap.add_argument("--pid", type=int, default=0)
    ap.add_argument("--devices-per-proc", type=int, default=4)
    ap.add_argument("--config", choices=["cpu-small", "flagship"],
                    default="cpu-small")
    ap.add_argument("--backend", default="pl_xla")
    ap.add_argument("--batch-per-device", type=int, default=0)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--timeout", type=float, default=600.0)
    args = ap.parse_args()
    if args.worker:
        worker(args)
    else:
        launcher(args)


if __name__ == "__main__":
    main()
