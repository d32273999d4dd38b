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
