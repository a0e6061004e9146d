"""Tracing / profiling / throughput observability.

The reference has none of this (SURVEY §5: one commented-out timing stub,
a tqdm bar).  Here:

- `StageTimers`: lightweight wall-clock accounting per pipeline stage
  (decode / dispatch / host-infer / collate), exposed by the engine as
  `engine.stats` and summarized with utterances/sec — the BASELINE.json
  headline metric.
- `device_trace`: context manager around `jax.profiler.trace` for XLA/TPU
  traces viewable in TensorBoard/Perfetto; enabled with
  `EvalEngine(..., profile_dir=...)` or SSR_EVAL_TPU_PROFILE=<dir>.
"""

from __future__ import annotations

import contextlib
import os
import time
from collections import defaultdict


class StageTimers:
    def __init__(self):
        self.seconds = defaultdict(float)
        self.counts = defaultdict(int)
        self.utterances = 0
        self._t0 = time.perf_counter()

    @contextlib.contextmanager
    def stage(self, name: str):
        t = time.perf_counter()
        try:
            yield
        finally:
            self.seconds[name] += time.perf_counter() - t
            self.counts[name] += 1

    def add_utterances(self, n: int):
        self.utterances += n

    def summary(self) -> dict:
        total = time.perf_counter() - self._t0
        out = {
            "total_s": round(total, 4),
            "utterances": self.utterances,
            "utterances_per_s": round(self.utterances / total, 3) if total > 0 else 0.0,
            "stages": {
                k: {"s": round(v, 4), "calls": self.counts[k]}
                for k, v in sorted(self.seconds.items())
            },
        }
        return out


@contextlib.contextmanager
def device_trace(profile_dir: str | None):
    """jax.profiler trace when a directory is given (or env override)."""
    profile_dir = profile_dir or os.environ.get("SSR_EVAL_TPU_PROFILE")
    if not profile_dir:
        yield
        return
    import jax

    os.makedirs(profile_dir, exist_ok=True)
    with jax.profiler.trace(profile_dir):
        yield
