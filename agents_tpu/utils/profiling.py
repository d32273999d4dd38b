"""Profiling and timing utilities.

The reference has no built-in profiler — it relies on wall-clock helpers
(``tf_agents/utils/timer.py``), per-env wrappers
(``environments/wrappers.py:191`` PerformanceProfiler, :453 RunStats) and
TensorBoard summaries. On TPU the right tool is the XLA profiler: these
helpers wrap ``jax.profiler`` so a training script can capture a device
trace (op-level HLO timeline, HBM usage) or annotate host-side phases
without importing jax.profiler everywhere.
"""
from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
  """Capture an XLA device trace viewable in TensorBoard/Perfetto.

  Usage:
    with profiling.trace("/tmp/trace"):
      state, _ = jitted_run(state)
      jax.block_until_ready(state)
  """
  jax.profiler.start_trace(log_dir)
  try:
    yield
  finally:
    jax.profiler.stop_trace()


def annotate(name: str):
  """Named host-span annotation appearing on the profiler timeline
  (TraceAnnotation); usable as decorator or context manager."""
  return jax.profiler.TraceAnnotation(name)


class Timer:
  """Cumulative wall-clock timer (reference utils/timer.py): `with t:`
  accumulates; value() returns seconds; also usable un-nested via
  start/stop."""

  def __init__(self):
    self._total = 0.0
    self._start: Optional[float] = None
    self._laps = 0

  def __enter__(self):
    self.start()
    return self

  def __exit__(self, *exc):
    self.stop()
    return False

  def start(self):
    self._start = time.perf_counter()

  def stop(self):
    if self._start is not None:
      self._total += time.perf_counter() - self._start
      self._laps += 1
      self._start = None

  def value(self) -> float:
    return self._total

  def laps(self) -> int:
    return self._laps

  def reset(self):
    self._total, self._start, self._laps = 0.0, None, 0
