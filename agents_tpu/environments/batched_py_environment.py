"""Thread-batched host environments.

Analogue of ``tf_agents/environments/batched_py_environment.py:41``:
stacks N PyEnvironments into one batched env, stepping them on a thread
pool (C simulators release the GIL, so MuJoCo instances genuinely step in
parallel).
"""
from __future__ import annotations

from concurrent import futures
from typing import Any, Sequence

import numpy as np

from agents_tpu.environments.py_environment import PyEnvironment
from agents_tpu.trajectories import time_step as ts
from agents_tpu.utils import nest_utils


class BatchedPyEnvironment(PyEnvironment):

  def __init__(self, envs: Sequence[PyEnvironment],
               multithreading: bool = True):
    super().__init__()
    if not envs:
      raise ValueError("Need at least one environment")
    self._envs = list(envs)
    self._spec = envs[0].observation_spec()
    for e in envs[1:]:
      if e.observation_spec() != self._spec and \
          repr(e.observation_spec()) != repr(self._spec):
        raise ValueError("All envs must share observation specs")
    self._pool = (futures.ThreadPoolExecutor(max_workers=len(envs))
                  if multithreading and len(envs) > 1 else None)

  @property
  def batched(self):
    return True

  @property
  def batch_size(self):
    return len(self._envs)

  @property
  def envs(self):
    return self._envs

  def observation_spec(self):
    return self._envs[0].observation_spec()

  def action_spec(self):
    return self._envs[0].action_spec()

  def reward_spec(self):
    return self._envs[0].reward_spec()

  def _execute(self, fn, iterable):
    if self._pool is None:
      return [fn(x) for x in iterable]
    return list(self._pool.map(fn, iterable))

  def _stack(self, time_steps):
    import jax
    return jax.tree_util.tree_map(
        lambda *xs: np.stack(xs), *time_steps)

  def _reset(self):
    steps = self._execute(lambda e: e.reset(), self._envs)
    return self._stack(steps)

  def _step(self, actions):
    import jax
    unstacked = [
        jax.tree_util.tree_map(lambda x: np.asarray(x)[i], actions)
        for i in range(len(self._envs))
    ]
    steps = self._execute(
        lambda ea: ea[0].step(ea[1]), list(zip(self._envs, unstacked)))
    return self._stack(steps)

  def step(self, action) -> ts.TimeStep:
    """Per-row auto-reset: rows whose current step is LAST reset
    individually (unlike the base class's all-rows check)."""
    if self._current_time_step is None:
      return self.reset()
    self._current_time_step = self._step(action)
    return self._current_time_step

  def _step_env_row(self, env, action):
    return env.step(action)

  def seed(self, seeds):
    if np.ndim(seeds) == 0:
      # A scalar seed must NOT give every row the same RNG stream (that
      # would collapse a batch of N envs to 1 env's worth of data);
      # derive distinct per-row seeds.
      seeds = int(seeds) + np.arange(len(self._envs))
    seeds = np.asarray(seeds)
    if seeds.shape != (len(self._envs),):
      raise ValueError(f"need {len(self._envs)} seeds, got {seeds.shape}")
    return self._execute(
        lambda es: es[0].seed(int(es[1])), list(zip(self._envs, seeds)))

  def close(self):
    self._execute(lambda e: e.close(), self._envs)
    if self._pool:
      self._pool.shutdown()
