"""Profiling hooks.

Parity+: the reference wraps learner steps in
``jax.profiler.StepTraceAnnotation`` (acme/jax/muzero/learning.py:271);
here the same annotation wraps driver iterations, plus a trace-window
context manager for capturing perfetto/tensorboard traces of the jitted
programs (SURVEY §5 tracing).
"""
from __future__ import annotations

import contextlib
import time

import jax


step_annotation = jax.profiler.StepTraceAnnotation


@contextlib.contextmanager
def trace(log_dir: str):
  """Capture a device trace for the enclosed block:
  ``with profiling.trace('/tmp/trace'): run_iterations()``"""
  jax.profiler.start_trace(log_dir)
  try:
    yield
  finally:
    jax.profiler.stop_trace()


class Stopwatch:
  """Wall-clock phase timing (rollout/update/eval) with running means."""

  def __init__(self):
    self.totals: dict[str, float] = {}
    self.counts: dict[str, int] = {}

  @contextlib.contextmanager
  def time(self, name: str):
    t0 = time.perf_counter()
    try:
      yield
    finally:
      dt = time.perf_counter() - t0
      self.totals[name] = self.totals.get(name, 0.0) + dt
      self.counts[name] = self.counts.get(name, 0) + 1

  def means_ms(self) -> dict[str, float]:
    return {k: 1000.0 * self.totals[k] / max(self.counts[k], 1)
            for k in self.totals}
