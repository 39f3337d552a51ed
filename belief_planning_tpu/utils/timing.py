"""Per-stage timing and profiling.

The reference's only instrumentation is an unused wall-clock delta around the
solver call (``solverTime``, ``MPC_branch.py:412-416``; ``linearizationTime`` is
never even updated). This module provides real per-stage timing (tree build /
cost assembly / factorization / iterations), an XLA profiler hook, and a
lightweight structured event log.
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from dataclasses import dataclass, field
from typing import Dict, List, Optional


@dataclass
class StageTimer:
    """Accumulating wall-clock timer keyed by stage name.

    Note: for on-device work, wrap the region so the last array of the stage is
    blocked on (or fetch to host) — otherwise dispatch time is measured, not
    execution (async dispatch; see bench.py for the device→host pattern).
    """

    totals: Dict[str, float] = field(default_factory=lambda: defaultdict(float))
    counts: Dict[str, int] = field(default_factory=lambda: defaultdict(int))

    @contextlib.contextmanager
    def stage(self, name: str, block_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                import jax
                jax.block_until_ready(block_on)
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            k: {
                "total_s": self.totals[k],
                "count": self.counts[k],
                "mean_ms": 1e3 * self.totals[k] / max(self.counts[k], 1),
            }
            for k in self.totals
        }

    def report(self) -> str:
        lines = [f"{'stage':<24}{'count':>8}{'mean ms':>12}{'total s':>12}"]
        for k, v in sorted(self.summary().items()):
            lines.append(
                f"{k:<24}{v['count']:>8}{v['mean_ms']:>12.3f}{v['total_s']:>12.3f}"
            )
        return "\n".join(lines)


@contextlib.contextmanager
def xla_trace(logdir: str):
    """XLA profiler capture around a region (view with TensorBoard/xprof)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class EventLog:
    """Structured JSONL event log (metrics / solver health / sim events)."""

    def __init__(self, path: Optional[str] = None):
        self.path = path
        self.events: List[dict] = []

    def log(self, kind: str, **fields):
        evt = {"t": time.time(), "kind": kind, **fields}
        self.events.append(evt)
        if self.path:
            with open(self.path, "a") as f:
                f.write(json.dumps(evt, default=float) + "\n")

    def of_kind(self, kind: str) -> List[dict]:
        return [e for e in self.events if e["kind"] == kind]
