import numpy as np
import pytest

from agents_tpu import specs
from agents_tpu.environments import wrappers
from agents_tpu.environments.py_environment import (PyEnvironment,
                                                    np_restart,
                                                    np_transition)
from agents_tpu.environments.test_envs import CountingPyEnv


class NestActionEnv(PyEnvironment):
  def observation_spec(self):
    return specs.ArraySpec((1,), np.float32)

  def action_spec(self):
    return {"a": specs.BoundedArraySpec((2,), np.float32, -1, 1),
            "b": specs.BoundedArraySpec((), np.float32, 0, 2)}

  def _reset(self):
    return np_restart(np.zeros(1, np.float32))

  def _step(self, action):
    self.last = action
    return np_transition(np.zeros(1, np.float32), np.asarray(0., np.float32))


def test_flatten_action_wrapper():
  env = wrappers.FlattenActionWrapper(NestActionEnv())
  assert env.action_spec().shape == (3,)
  env.reset()
  env.step(np.asarray([0.5, -0.5, 1.5], np.float32))
  np.testing.assert_allclose(env.wrapped_env.last["a"], [0.5, -0.5])
  np.testing.assert_allclose(env.wrapped_env.last["b"], 1.5)


def test_extra_disabled_actions():
  env = wrappers.ExtraDisabledActionsWrapper(CountingPyEnv(), 3)
  assert env.action_spec().num_values == 5
  step = env.reset()
  np.testing.assert_array_equal(step.observation["valid_actions"],
                                [True, True, False, False, False])
  env.step(np.asarray(1))
  with pytest.raises(ValueError):
    env.step(np.asarray(4))


def test_time_limit_batched_per_row():
  """TimeLimit over a batched env: rows hit the limit independently; a
  freshly auto-reset FIRST row must never be stamped LAST (round-4
  review: the global counter corrupted such rows into length-1
  episodes)."""
  import numpy as np

  from agents_tpu.environments import wrappers
  from agents_tpu.environments.batched_py_environment import (
      BatchedPyEnvironment,)
  from agents_tpu.trajectories import time_step as ts_mod
  from tests.test_py_environments import CountingPyEnv

  # Row 0 ends naturally at 3 steps; row 1 runs long and needs truncation.
  env = wrappers.TimeLimit(
      BatchedPyEnvironment([CountingPyEnv(steps_per_episode=3),
                            CountingPyEnv(steps_per_episode=100)]),
      duration=5)
  step = env.reset()
  types = []
  for _ in range(9):
    step = env.step(np.zeros(2, np.int32))
    types.append(np.asarray(step.step_type).copy())
  types = np.stack(types)  # [T, 2]
  # Row 1 is truncated at duration=5 and again 6 steps later (5 MIDs
  # after its relabeled FIRST), never before.
  assert types[4, 1] == ts_mod.StepType.LAST, types[:, 1]
  assert types[5, 1] == ts_mod.StepType.FIRST, types[:, 1]
  assert np.all(types[6:10, 1] == ts_mod.StepType.MID), types[:, 1]
  for row in range(2):
    for t in range(1, len(types)):
      # Every LAST is followed by a FIRST (auto-reset protocol); no row
      # ever emits two consecutive LASTs (round-4 advisor: the truncated
      # row used to be re-stamped LAST on every subsequent frame).
      if types[t - 1, row] == ts_mod.StepType.LAST:
        assert types[t, row] == ts_mod.StepType.FIRST, (row, types[:, row])
      # No row ever goes FIRST -> LAST in consecutive frames (the corrupt
      # length-1 episode the old global counter produced).
      if types[t - 1, row] == ts_mod.StepType.FIRST:
        assert types[t, row] != ts_mod.StepType.LAST, (row, types[:, row])


def test_history_wrapper_zero_pads_by_default():
  """Reference default (wrappers.py:1029): pre-episode history is ZERO
  frames; tile_first_step_obs=True tiles the first observation."""
  import numpy as np

  from agents_tpu.environments import wrappers
  from tests.test_py_environments import CountingPyEnv

  class OffsetEnv(CountingPyEnv):
    def _reset(self):
      step = super()._reset()
      return step.replace(observation=step.observation + 7)

    def _step(self, action):
      step = super()._step(action)
      return step.replace(observation=step.observation + 7)

  zero = wrappers.HistoryWrapper(OffsetEnv(steps_per_episode=5),
                                 history_length=3)
  np.testing.assert_array_equal(zero.reset().observation, [0, 0, 7])
  tiled = wrappers.HistoryWrapper(OffsetEnv(steps_per_episode=5),
                                  history_length=3,
                                  tile_first_step_obs=True)
  np.testing.assert_array_equal(tiled.reset().observation, [7, 7, 7])
