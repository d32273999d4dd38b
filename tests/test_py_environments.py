"""Host env layer tests (mirrors environments/*_test.py)."""
import numpy as np
import pytest

from agents_tpu.environments import suite_gym, wrappers
from agents_tpu.environments.batched_py_environment import (
    BatchedPyEnvironment,)
from agents_tpu.environments.gym_wrapper import GymWrapper
from agents_tpu.environments.test_envs import (CountingPyEnv,
                                               RandomPyEnvironment)
from agents_tpu.environments.utils import validate_py_environment
from agents_tpu import specs
from agents_tpu.trajectories import time_step as ts


def test_counting_env_protocol():
  env = CountingPyEnv(steps_per_episode=2)
  first = env.reset()
  assert first.step_type == ts.StepType.FIRST
  assert first.observation == 0
  mid = env.step(0)
  assert mid.step_type == ts.StepType.MID and mid.observation == 1
  last = env.step(0)
  assert last.step_type == ts.StepType.LAST and last.discount == 0.0
  # auto-reset: stepping a LAST resets
  again = env.step(0)
  assert again.step_type == ts.StepType.FIRST
  assert again.observation == 10  # episode 1


def test_validate_py_environment():
  assert validate_py_environment(CountingPyEnv(), episodes=2)
  env = RandomPyEnvironment(
      specs.ArraySpec((3,), np.float32),
      specs.BoundedArraySpec((), np.int32, 0, 3),
      episode_end_probability=0.3)
  assert validate_py_environment(env, episodes=2)


def test_gym_wrapper_cartpole():
  env = suite_gym.load("CartPole-v1")
  assert env.action_spec().num_values == 2
  assert env.observation_spec().shape == (4,)
  step = env.reset()
  assert step.step_type == ts.StepType.FIRST
  n = 0
  while n < 300:
    step = env.step(np.asarray(1, np.int64))
    n += 1
    if step.step_type == ts.StepType.LAST:
      break
  assert step.step_type == ts.StepType.LAST


def test_time_limit_truncates_with_discount_one():
  env = wrappers.TimeLimit(CountingPyEnv(steps_per_episode=100), duration=4)
  env.reset()
  for _ in range(3):
    step = env.step(0)
  assert step.step_type == ts.StepType.MID
  step = env.step(0)
  assert step.step_type == ts.StepType.LAST
  assert step.discount == 1.0  # truncation, not termination


def test_action_repeat_sums_rewards():
  env = wrappers.ActionRepeat(CountingPyEnv(steps_per_episode=10), times=3)
  env.reset()
  step = env.step(0)
  assert step.reward == 3.0


def test_run_stats():
  env = wrappers.RunStats(CountingPyEnv(steps_per_episode=2))
  env.reset()
  for _ in range(6):
    env.step(0)
  assert env.episodes >= 1
  assert env.total_steps >= 4


def test_history_wrapper_stacks():
  env = wrappers.HistoryWrapper(CountingPyEnv(steps_per_episode=5),
                                history_length=3)
  step = env.reset()
  assert step.observation.shape == (3,)
  np.testing.assert_array_equal(step.observation, [0, 0, 0])
  step = env.step(0)
  np.testing.assert_array_equal(step.observation, [0, 0, 1])


def test_action_discretize():
  from agents_tpu.environments.py_environment import PyEnvironment, \
      np_restart, np_transition

  class ContEnv(PyEnvironment):
    def observation_spec(self):
      return specs.ArraySpec((1,), np.float32)

    def action_spec(self):
      return specs.BoundedArraySpec((), np.float32, -1.0, 1.0)

    def _reset(self):
      return np_restart(np.zeros(1, np.float32))

    def _step(self, action):
      self.last_action = float(action)
      return np_transition(np.zeros(1, np.float32),
                           np.asarray(0.0, np.float32))

  env = wrappers.ActionDiscretizeWrapper(ContEnv(), num_actions=5)
  assert env.action_spec().num_values == 5
  env.reset()
  env.step(np.asarray(0, np.int32))
  assert env.wrapped_env.last_action == -1.0
  env.step(np.asarray(4, np.int32))
  assert env.wrapped_env.last_action == 1.0
  env.step(np.asarray(2, np.int32))
  assert env.wrapped_env.last_action == 0.0


def test_batched_py_environment():
  env = BatchedPyEnvironment(
      [CountingPyEnv(steps_per_episode=2 + i) for i in range(3)])
  assert env.batch_size == 3
  step = env.reset()
  assert step.observation.shape == (3,)
  step = env.step(np.zeros(3, np.int32))
  assert step.step_type.shape == (3,)
  # Row 0 (2-step episodes) hits LAST first; the others keep going.
  step = env.step(np.zeros(3, np.int32))
  assert step.step_type[0] == ts.StepType.LAST
  assert step.step_type[1] == ts.StepType.MID
  # Auto-reset only row 0.
  step = env.step(np.zeros(3, np.int32))
  assert step.step_type[0] == ts.StepType.FIRST
  assert step.step_type[1] == ts.StepType.LAST


def test_py_driver_with_metrics():
  from agents_tpu.drivers.py_driver import PyDriver
  from agents_tpu.metrics import py_metrics

  class GoRight:
    def action(self, time_step, state=()):
      from agents_tpu.trajectories import policy_step as ps
      return ps.PolicyStep(action=np.asarray(0, np.int32), state=state)

  env = CountingPyEnv(steps_per_episode=3)
  m_ret = py_metrics.AverageReturnMetric()
  m_len = py_metrics.AverageEpisodeLengthMetric()
  m_steps = py_metrics.EnvironmentSteps()
  driver = PyDriver(env, GoRight(),
                    observers=[m_ret, m_len, m_steps], max_steps=12)
  driver.run(env.reset())
  assert m_ret.result() == 3.0
  assert m_len.result() == 3.0
  assert m_steps.result() == 12


def test_parallel_env_blocking_mode():
  """blocking=True must step workers serially and produce identical
  results to the promise-overlapped default."""
  from agents_tpu.environments.parallel_py_environment import (
      ParallelPyEnvironment)
  from agents_tpu.environments.test_envs import CountingPyEnv

  envs = ParallelPyEnvironment([lambda: CountingPyEnv(steps_per_episode=3)
                                for _ in range(2)], blocking=True)
  try:
    ts0 = envs.reset()
    assert ts0.observation.shape[0] == 2
    ts1 = envs.step(np.zeros((2,), np.int32))
    np.testing.assert_array_equal(ts1.observation,
                                  ts0.observation + 1)
  finally:
    envs.close()
