"""Timing / metrics harness — the analogue of the reference's GPU timestamp
bracketing (vkCmdWriteTimestamp around the sort region, src/test/sort.cpp:
388-450) plus its missing structured metrics (SURVEY §5: the reference
prints raw ms to stdout and reads no counters).

Honest timing over async/remote backends: `block_until_ready` can
under-report (the axon relay overlaps dispatch), so `time_op` times k
chained applications inside one jit against a single application, with a
small device_get readback forcing real completion, and reports
(t_k - t_1)/(k-1).  Keys/s and bytes/s are derived per op.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable

import jax


@dataclasses.dataclass
class Metrics:
    """Structured per-op metrics (SURVEY §5 'metrics/logging' gap)."""

    name: str
    seconds: float
    items: int
    bytes_moved: int = 0

    @property
    def items_per_s(self) -> float:
        return self.items / self.seconds if self.seconds > 0 else float("inf")

    @property
    def gbytes_per_s(self) -> float:
        return self.bytes_moved / self.seconds / 1e9 if self.seconds > 0 else 0.0

    def row(self) -> str:
        return (
            f"{self.name:32s} {self.seconds*1e3:9.3f} ms  "
            f"{self.items_per_s/1e9:8.3f} G items/s  "
            f"{self.gbytes_per_s:8.1f} GB/s"
        )


def time_op(
    fn: Callable,
    x,
    *,
    name: str = "op",
    items: int | None = None,
    bytes_moved: int = 0,
    iters: int = 8,
    repeats: int = 3,
) -> Metrics:
    """Measure fn (array -> same-shape array) with chained-iteration timing.

    fn must be shape-preserving so applications can be chained; this is true
    of every in-place pipeline op in the engine (sorts, merges, passes).
    """

    def chain(k):
        @jax.jit
        def f(v):
            for _ in range(k):
                v = fn(v)
            return v

        return f

    f1, fk = chain(1), chain(iters)

    def run(f):
        t0 = time.perf_counter()
        jax.device_get(jax.tree.leaves(f(x))[0].reshape(-1)[:8])
        return time.perf_counter() - t0

    run(f1), run(fk)  # compile + warm
    t1 = min(run(f1) for _ in range(repeats))
    tk = min(run(fk) for _ in range(repeats))
    dt = max((tk - t1) / (iters - 1), 1e-12)
    n = items if items is not None else jax.tree.leaves(x)[0].size
    return Metrics(name=name, seconds=dt, items=n, bytes_moved=bytes_moved)


def trace(path: str = "/tmp/radx_trace"):
    """Context manager: capture an XProf/Perfetto trace of the enclosed ops
    (jax.profiler) — the RenderDoc-capture analogue (sort.cpp:271-301)."""
    return jax.profiler.trace(path)
