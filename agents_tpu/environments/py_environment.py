"""Host-side (numpy) environment ABC.

Analogue of ``tf_agents/environments/py_environment.py:38`` with the same
auto-reset protocol (:203-240): calling `step` on a LAST time step ignores
the action and restarts. Host envs cover the C/C++ simulator backends
(MuJoCo, Atari, ...) that cannot run on-device; pure-JAX envs
(jax_environment.py) are preferred wherever dynamics can be expressed in
XLA.
"""
from __future__ import annotations

import abc
from typing import Any, Optional

import numpy as np

from agents_tpu.specs import array_spec
from agents_tpu.trajectories import time_step as ts


def np_restart(observation, batch_size=None, reward_spec=None):
  outer = (batch_size,) if batch_size is not None else ()
  make_reward = lambda s: np.zeros(outer + s.shape, s.dtype)
  if reward_spec is None:
    reward = np.zeros(outer, np.float32)
  else:
    reward = array_spec.map_spec_nest(make_reward, reward_spec)
  return ts.TimeStep(
      step_type=np.full(outer, ts.StepType.FIRST, np.int32),
      reward=reward,
      discount=np.ones(outer, np.float32),
      observation=observation)


def np_transition(observation, reward, discount=1.0):
  reward = np.asarray(reward)
  return ts.TimeStep(
      step_type=np.full(reward.shape, ts.StepType.MID, np.int32),
      reward=reward,
      discount=np.broadcast_to(np.asarray(discount, np.float32),
                               reward.shape).copy(),
      observation=observation)


def np_termination(observation, reward):
  reward = np.asarray(reward)
  return ts.TimeStep(
      step_type=np.full(reward.shape, ts.StepType.LAST, np.int32),
      reward=reward,
      discount=np.zeros(reward.shape, np.float32),
      observation=observation)


def np_truncation(observation, reward, discount=1.0):
  reward = np.asarray(reward)
  return ts.TimeStep(
      step_type=np.full(reward.shape, ts.StepType.LAST, np.int32),
      reward=reward,
      discount=np.broadcast_to(np.asarray(discount, np.float32),
                               reward.shape).copy(),
      observation=observation)


class PyEnvironment(abc.ABC):
  """Reference-parity surface: reset/step/current_time_step, batched props,
  render/seed/close/get_state/set_state."""

  def __init__(self, handle_auto_reset: bool = True):
    # handle_auto_reset=False restores reference opt-out semantics
    # (py_environment.py:52-59,117): stepping past LAST is then the
    # caller's responsibility (manual reset), e.g. GymWrapper(
    # auto_reset=False) for eval loops that count episodes by reset().
    self._current_time_step: Optional[ts.TimeStep] = None
    self._handle_auto_reset = handle_auto_reset

  @property
  def batched(self) -> bool:
    return False

  @property
  def batch_size(self) -> Optional[int]:
    return None

  @abc.abstractmethod
  def observation_spec(self):
    ...

  @abc.abstractmethod
  def action_spec(self):
    ...

  def reward_spec(self):
    return array_spec.ArraySpec((), np.float32, name="reward")

  def time_step_spec(self):
    return ts.time_step_spec(self.observation_spec(), self.reward_spec())

  def current_time_step(self) -> ts.TimeStep:
    if self._current_time_step is None:
      return self.reset()
    return self._current_time_step

  def reset(self) -> ts.TimeStep:
    self._current_time_step = self._reset()
    return self._current_time_step

  def step(self, action) -> ts.TimeStep:
    if self._current_time_step is None:
      return self.reset()
    # Auto-reset protocol (reference :203-240).
    if getattr(self, "_handle_auto_reset", True) and np.all(
        self._current_time_step.step_type == ts.StepType.LAST):
      return self.reset()
    self._current_time_step = self._step(action)
    return self._current_time_step

  @abc.abstractmethod
  def _reset(self) -> ts.TimeStep:
    ...

  @abc.abstractmethod
  def _step(self, action) -> ts.TimeStep:
    ...

  # Optional surface.
  def render(self, mode="rgb_array"):
    raise NotImplementedError

  def seed(self, seed):
    raise NotImplementedError

  def close(self):
    pass

  def get_state(self):
    raise NotImplementedError

  def set_state(self, state):
    raise NotImplementedError

  def get_info(self):
    return None

  def __enter__(self):
    return self

  def __exit__(self, *args):
    self.close()
