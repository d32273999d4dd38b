"""Metrics as pytree accumulators updated inside jitted collect loops.

Analogue of ``tf_agents/metrics/tf_metrics.py``: each metric is a pure
(state, trajectory-frame) -> state reducer plus a result() readout, so
drivers can thread metric state through `lax.scan` with zero host syncs.

The reference's `TFDeque` (:32) — a bounded episode-return window — becomes
a fixed-size ring array. Defaults mirror the reference (buffer_size=10).

Frames arrive batched ``[B]`` (one frame per parallel env row), exactly as
driver observers receive them.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from agents_tpu.trajectories import time_step as ts
from agents_tpu.trajectories.trajectory import Trajectory


@struct.dataclass
class DequeState:
  """Fixed-capacity ring of scalars with masked mean/max/min (TFDeque :32)."""
  data: jax.Array   # [capacity]
  count: jax.Array  # int32 total pushes

  @staticmethod
  def create(capacity: int, dtype=jnp.float32) -> "DequeState":
    return DequeState(data=jnp.zeros((capacity,), dtype),
                      count=jnp.zeros((), jnp.int32))

  def add(self, value) -> "DequeState":
    cap = self.data.shape[0]
    return DequeState(data=self.data.at[self.count % cap].set(value),
                      count=self.count + 1)

  def add_where(self, cond, value) -> "DequeState":
    """Conditionally push (used for vectorized episode-end pushes)."""
    cap = self.data.shape[0]
    idx = self.count % cap
    new_data = self.data.at[idx].set(
        jnp.where(cond, value, self.data[idx]))
    return DequeState(data=new_data,
                      count=self.count + cond.astype(jnp.int32))

  def push_batch(self, mask, values) -> "DequeState":
    """Push values[i] where mask[i], as one scatter.

    Ring positions are assigned in row order via an exclusive cumsum of
    the mask; masked-out rows scatter to an out-of-bounds index and are
    dropped. One vectorized op — compiles and runs far faster than a
    per-row loop inside collection scans.
    """
    cap = self.data.shape[0]
    mask_i = mask.astype(jnp.int32)
    rank = jnp.cumsum(mask_i) - mask_i           # exclusive prefix count
    total = jnp.sum(mask_i)
    # More masked-in rows than capacity (e.g. a whole lockstep batch
    # finishing on the same scan step): keep the LAST `cap` of them —
    # their ranks are consecutive so ring indices stay unique; scattering
    # all of them would leave XLA to pick an arbitrary duplicate per slot.
    keep = mask & (rank >= total - cap)
    pos = jnp.where(keep, (self.count + rank) % cap, cap)
    new_data = self.data.at[pos].set(values, mode="drop")
    return DequeState(data=new_data, count=self.count + total)

  @property
  def _valid(self):
    cap = self.data.shape[0]
    n = jnp.minimum(self.count, cap)
    return jnp.arange(cap) < n, n

  def mean(self):
    mask, n = self._valid
    return jnp.where(n > 0,
                     jnp.sum(jnp.where(mask, self.data, 0)) /
                     jnp.maximum(n, 1), 0.0)

  def max(self):
    mask, n = self._valid
    return jnp.where(n > 0,
                     jnp.max(jnp.where(mask, self.data, -jnp.inf)), 0.0)

  def min(self):
    mask, n = self._valid
    return jnp.where(n > 0,
                     jnp.min(jnp.where(mask, self.data, jnp.inf)), 0.0)


class Metric:
  """Base: init(batch_size) -> state; update(state, traj) -> state;
  result(state) -> scalar."""
  name: str = "metric"
  # What result() returns: "scalar", or "counts" (a 1-D vector of
  # per-bucket counts, e.g. ChosenActionHistogram). Summary writers route
  # on this attribute, never on the metric's name.
  result_kind: str = "scalar"

  def init(self, batch_size: int):
    raise NotImplementedError

  def update(self, state, traj: Trajectory):
    raise NotImplementedError

  def result(self, state):
    raise NotImplementedError

  def __call__(self, state, traj):
    return self.update(state, traj)


class EnvironmentSteps(Metric):
  """Counts non-boundary frames (tf_metrics.py:87)."""
  name = "EnvironmentSteps"

  def init(self, batch_size: int):
    return jnp.zeros((), jnp.int32)

  def update(self, state, traj):
    return state + jnp.sum(1 - traj.is_boundary().astype(jnp.int32))

  def result(self, state):
    return state


class NumberOfEpisodes(Metric):
  """Counts completed episodes = LAST frames (tf_metrics.py:124)."""
  name = "NumberOfEpisodes"

  def init(self, batch_size: int):
    return jnp.zeros((), jnp.int32)

  def update(self, state, traj):
    return state + jnp.sum(traj.is_last().astype(jnp.int32))

  def result(self, state):
    return state


@struct.dataclass
class _ReturnAccumulatorState:
  accumulator: jax.Array  # [B] running per-row value
  deque: DequeState


class AverageReturnMetric(Metric):
  """Mean undiscounted episode return over the last `buffer_size` episodes
  (tf_metrics.py:160). Accumulates reward per env row; on is_last pushes
  the row's return into the deque and zeroes the row."""
  name = "AverageReturn"

  def __init__(self, buffer_size: int = 10):
    self.buffer_size = buffer_size

  def init(self, batch_size: int):
    return _ReturnAccumulatorState(
        accumulator=jnp.zeros((batch_size,), jnp.float32),
        deque=DequeState.create(self.buffer_size))

  def update(self, state, traj):
    # Boundary frames carry no reward (reference zeroes them the same way:
    # the accumulator resets when the next FIRST arrives).
    not_boundary = 1.0 - traj.is_boundary().astype(jnp.float32)
    acc = state.accumulator + traj.reward * not_boundary
    done = traj.is_last()
    deque = state.deque.push_batch(done, acc)
    acc = jnp.where(done, 0.0, acc)
    return _ReturnAccumulatorState(accumulator=acc, deque=deque)

  def result(self, state):
    return state.deque.mean()


class MaxReturnMetric(AverageReturnMetric):
  name = "MaxReturn"

  def result(self, state):
    return state.deque.max()


class MinReturnMetric(AverageReturnMetric):
  name = "MinReturn"

  def result(self, state):
    return state.deque.min()


class AverageEpisodeLengthMetric(Metric):
  """Mean episode length over last `buffer_size` episodes
  (tf_metrics.py:312)."""
  name = "AverageEpisodeLength"

  def __init__(self, buffer_size: int = 10):
    self.buffer_size = buffer_size

  def init(self, batch_size: int):
    return _ReturnAccumulatorState(
        accumulator=jnp.zeros((batch_size,), jnp.float32),
        deque=DequeState.create(self.buffer_size))

  def update(self, state, traj):
    not_boundary = 1.0 - traj.is_boundary().astype(jnp.float32)
    acc = state.accumulator + not_boundary
    done = traj.is_last()
    deque = state.deque.push_batch(done, acc)
    acc = jnp.where(done, 0.0, acc)
    return _ReturnAccumulatorState(accumulator=acc, deque=deque)

  def result(self, state):
    return state.deque.mean()


class AverageReturnMultiMetric(Metric):
  """Per-component mean return for vector rewards (tf_metrics.py:394) —
  multi-objective bandits and the ranking env's score-vector feedback.
  One deque per reward component, updated in lockstep."""
  name = "AverageReturnMulti"

  def __init__(self, reward_len: int, buffer_size: int = 10):
    self.reward_len = reward_len
    self.buffer_size = buffer_size

  def init(self, batch_size: int):
    return _ReturnAccumulatorState(
        accumulator=jnp.zeros((batch_size, self.reward_len), jnp.float32),
        deque=jax.vmap(lambda _: DequeState.create(self.buffer_size))(
            jnp.arange(self.reward_len)))

  def update(self, state, traj):
    not_boundary = 1.0 - traj.is_boundary().astype(jnp.float32)
    acc = state.accumulator + traj.reward * not_boundary[..., None]
    done = traj.is_last()
    # vmap over the reward component axis: each component's deque gets
    # the same done mask and its own column of returns.
    deque = jax.vmap(
        lambda dq, vals: dq.push_batch(done, vals),
        in_axes=(0, 1))(state.deque, acc)
    acc = jnp.where(done[..., None], 0.0, acc)
    return _ReturnAccumulatorState(accumulator=acc, deque=deque)

  def result(self, state):
    return jax.vmap(lambda dq: dq.mean())(state.deque)


class ChosenActionHistogram(Metric):
  """Histogram of discrete actions (tf_metrics.py:369)."""
  name = "ChosenActionHistogram"
  result_kind = "counts"

  def __init__(self, num_actions: int):
    self.num_actions = num_actions

  def init(self, batch_size: int):
    return jnp.zeros((self.num_actions,), jnp.int32)

  def update(self, state, traj):
    # Boundary frames carry no chosen action (post-episode filler; the
    # episode driver's quota masking also rewrites dead rows as
    # boundaries) — counting them would skew the histogram, so they are
    # masked out like every other standard metric does.
    valid = 1 - traj.is_boundary().astype(jnp.int32)
    onehot = jax.nn.one_hot(traj.action, self.num_actions, dtype=jnp.int32)
    return state + jnp.sum(onehot * valid[:, None], axis=0)

  def result(self, state):
    return state


def standard_collect_metrics(buffer_size: int = 10):
  """The reference's Actor collect preset (train/actor.py:240)."""
  return (EnvironmentSteps(), NumberOfEpisodes(),
          AverageReturnMetric(buffer_size),
          AverageEpisodeLengthMetric(buffer_size))
