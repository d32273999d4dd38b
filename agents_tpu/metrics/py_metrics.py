"""Numpy metric twins for host drivers.

Analogue of ``tf_agents/metrics/py_metrics.py`` (NumpyDeque :34,
AverageReturnMetric etc.). The metric-equality contract with the device
metrics is tested in tests/test_metric_equality.py, mirroring the
reference's metrics/metric_equality_test.py.
"""
from __future__ import annotations

import collections
from typing import Optional

import numpy as np

from agents_tpu.trajectories import time_step as ts


class PyMetric:
  name = "py_metric"

  def __call__(self, traj):
    raise NotImplementedError

  def result(self):
    raise NotImplementedError

  def reset(self):
    raise NotImplementedError

  # Checkpointable metric state (the analogue of the reference's
  # NumpyState-backed py_metrics, utils/numpy_storage.py: metric state
  # survives a preemption). JSON-serializable by contract.
  def get_state(self):
    return {}

  def set_state(self, state):
    del state


class NumpyDeque:
  """reference py_metrics.NumpyDeque(:34)."""

  def __init__(self, maxlen: int, dtype=np.float64):
    self._deque = collections.deque(maxlen=maxlen)
    self._dtype = dtype

  def add(self, value):
    self._deque.append(value)

  def extend(self, values):
    self._deque.extend(values)

  def clear(self):
    self._deque.clear()

  def __len__(self):
    return len(self._deque)

  def mean(self, default=0.0):
    return np.mean(self._deque) if self._deque else default

  def max(self, default=0.0):
    return np.max(self._deque) if self._deque else default

  def min(self, default=0.0):
    return np.min(self._deque) if self._deque else default


class StreamingMetric(PyMetric):
  """Per-row accumulate + deque of finished episodes (reference :120)."""

  def __init__(self, name, buffer_size: int = 10,
               batch_size: Optional[int] = None):
    self.name = name
    self._buffer = NumpyDeque(buffer_size)
    self._batch_size = batch_size
    self.reset()

  def reset(self):
    self._buffer.clear()
    self._acc = None

  def _ensure_acc(self, batch_size):
    if self._acc is None:
      self._acc = np.zeros(batch_size, np.float64)

  def __call__(self, traj):
    step_type = np.atleast_1d(np.asarray(traj.step_type))
    next_step_type = np.atleast_1d(np.asarray(traj.next_step_type))
    reward = np.atleast_1d(np.asarray(traj.reward))
    self._ensure_acc(len(step_type))
    is_boundary = step_type == ts.StepType.LAST
    self._update(reward, is_boundary)
    done = next_step_type == ts.StepType.LAST
    for i in np.where(done)[0]:
      self._buffer.add(self._acc[i])
      self._acc[i] = 0.0

  def _update(self, reward, is_boundary):
    raise NotImplementedError

  def result(self):
    return float(self._buffer.mean())

  def get_state(self):
    # The per-row accumulator is deliberately NOT saved: on resume the
    # host envs restart from reset (reference semantics — a preempted
    # actor loses its in-flight episodes, train/learner.py:146-152 only
    # protects training state), so a restored accumulator would credit
    # the old half-episode to the new one.
    return {"buffer": [float(v) for v in self._buffer._deque]}

  def set_state(self, state):
    self.reset()
    self._buffer.extend(state.get("buffer", []))


class AverageReturnMetric(StreamingMetric):

  def __init__(self, buffer_size: int = 10, batch_size=None):
    super().__init__("AverageReturn", buffer_size, batch_size)

  def _update(self, reward, is_boundary):
    self._acc += np.where(is_boundary, 0.0, reward)


class AverageEpisodeLengthMetric(StreamingMetric):

  def __init__(self, buffer_size: int = 10, batch_size=None):
    super().__init__("AverageEpisodeLength", buffer_size, batch_size)

  def _update(self, reward, is_boundary):
    self._acc += np.where(is_boundary, 0.0, 1.0)


class EnvironmentSteps(PyMetric):

  def __init__(self):
    self.name = "EnvironmentSteps"
    self.count = 0

  def reset(self):
    self.count = 0

  def __call__(self, traj):
    step_type = np.atleast_1d(np.asarray(traj.step_type))
    self.count += int(np.sum(step_type != ts.StepType.LAST))

  def result(self):
    return self.count

  def get_state(self):
    return {"count": self.count}

  def set_state(self, state):
    self.count = int(state.get("count", 0))


class NumberOfEpisodes(PyMetric):

  def __init__(self):
    self.name = "NumberOfEpisodes"
    self.count = 0

  def reset(self):
    self.count = 0

  def __call__(self, traj):
    next_step_type = np.atleast_1d(np.asarray(traj.next_step_type))
    self.count += int(np.sum(next_step_type == ts.StepType.LAST))

  def result(self):
    return self.count

  def get_state(self):
    return {"count": self.count}

  def set_state(self, state):
    self.count = int(state.get("count", 0))
