"""Multi-process distributed-ensemble test (the multi-host comm-backend claim).

Launches two OS processes, each owning 4 virtual CPU devices, joined through
``jax.distributed`` into one 8-device 2×4 ("dp","mp") mesh — the
multi-controller SPMD topology of a multi-host TPU slice. The flagship-path
IPM ensemble step runs under ``shard_map`` across both processes with
cross-process ``psum``/``pmax`` metric collectives; each worker verifies its
output shards against a single-process reference (tests/distributed_worker.py).
"""

import os
import socket
import subprocess
import sys

import pytest


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_ensemble():
    coord = f"127.0.0.1:{_free_port()}"
    worker = os.path.join(os.path.dirname(__file__), "distributed_worker.py")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)          # worker sets its own device count
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, worker, coord, str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=os.path.dirname(os.path.dirname(worker)),
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=540)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"
        assert f"DIST-OK {pid}" in out, f"worker {pid} no OK marker:\n{out[-4000:]}"


def test_multihost_throughput_harness():
    """The aggregate-throughput protocol (scripts/bench_multihost.py) runs on
    the 2-process CPU mesh and reports a sane JSON line — the same script, run
    per-host with --tpu, is the >=2-hosts row of the BASELINE.md scaling
    protocol."""
    import json

    script = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                          "scripts", "bench_multihost.py")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [sys.executable, script, "--nproc", "2", "--devices-per-proc", "2",
         "--iters", "3"],
        capture_output=True, text=True, timeout=540, env=env,
        cwd=os.path.dirname(script))
    assert out.returncode == 0, out.stderr[-4000:] + out.stdout[-2000:]
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    rec = json.loads(line)
    assert rec["metric"] == "multihost_aggregate_solves_per_sec"
    assert rec["n_proc"] == 2 and rec["n_devices"] == 4
    assert rec["value"] > 0 and len(rec["per_proc_ms"]) == 2
    assert rec["feasible_frac"] == 1.0
