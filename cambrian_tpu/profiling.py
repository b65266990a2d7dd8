"""Tracing / profiling subsystem (SURVEY.md §5: the reference had nothing
beyond xm.mark_step; this is a first-class replacement).

- :func:`trace` — context manager around ``jax.profiler`` writing a
  TensorBoard-compatible trace directory.
- :func:`start_server` — on-demand profiling endpoint
  (``jax.profiler.start_server``) so a running trainer can be profiled from
  TensorBoard / xprof without restarts.
- :class:`PhaseTimer` — wall-clock accounting of the pipeline phases
  (preprocess / tower encode / SVA / decode / optimizer), the per-phase
  breakdown the reference never had.
- :func:`annotate` — ``jax.profiler.TraceAnnotation`` wrapper so phases show
  up on the device timeline.
"""

import contextlib
import json
import time
from collections import defaultdict
from typing import Dict, Optional


def start_server(port: int = 9999):
    import jax

    return jax.profiler.start_server(port)


@contextlib.contextmanager
def trace(log_dir: str):
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield


class PhaseTimer:
    """Accumulates wall-clock per named phase; blocking is the caller's job
    (time jitted calls after block_until_ready, as in bench.py)."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        start = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - start
            self.counts[name] += 1

    def summary(self) -> Dict[str, dict]:
        return {
            name: {
                "total_s": round(self.totals[name], 4),
                "count": self.counts[name],
                "mean_ms": round(1000 * self.totals[name] / max(self.counts[name], 1), 3),
            }
            for name in sorted(self.totals)
        }

    def report(self) -> str:
        return json.dumps(self.summary(), indent=2)

    def reset(self):
        self.totals.clear()
        self.counts.clear()
