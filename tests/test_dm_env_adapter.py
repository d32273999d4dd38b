"""dm_env adapter tests against fake dm_env-conforming classes (no
dm_control/bsuite backend needed — the adapter is duck-typed exactly so
this is possible; reference behavior: dm_control_wrapper.py:33-140)."""
import collections

import numpy as np
import pytest

from agents_tpu.environments import suites, utils as env_utils
from agents_tpu.environments.dm_env_wrapper import (DmEnvWrapper,
                                                    convert_spec,
                                                    convert_time_step)
from agents_tpu.specs import array_spec
from agents_tpu.trajectories import time_step as ts

DmTimeStep = collections.namedtuple(
    "DmTimeStep", ["step_type", "reward", "discount", "observation"])


class FakeArraySpec:

  def __init__(self, shape, dtype, name=None):
    self.shape, self.dtype, self.name = shape, dtype, name


class FakeBoundedSpec(FakeArraySpec):

  def __init__(self, shape, dtype, minimum, maximum, name=None):
    super().__init__(shape, dtype, name)
    self.minimum, self.maximum = minimum, maximum


class FakeDmEnv:
  """Conforms to the dm_env.Environment protocol: float64 dict
  observations, bounded float64 actions, reward=None on restart."""

  def __init__(self, episode_len=3):
    self.episode_len = episode_len
    self._t = 0
    self.closed = False

  def observation_spec(self):
    return collections.OrderedDict(
        position=FakeArraySpec((2,), np.float64, "position"),
        velocity=FakeArraySpec((3,), np.float64, "velocity"))

  def action_spec(self):
    return FakeBoundedSpec((2,), np.float64, -1.0, 1.0, "action")

  def _obs(self):
    return collections.OrderedDict(
        position=np.full((2,), float(self._t), np.float64),
        velocity=np.zeros((3,), np.float64))

  def reset(self):
    self._t = 0
    return DmTimeStep(0, None, None, self._obs())

  def step(self, action):
    assert action.dtype == np.float64, "adapter must cast to the dm spec"
    self._t += 1
    if self._t >= self.episode_len:
      return DmTimeStep(2, 1.0, 0.0, self._obs())
    return DmTimeStep(1, 0.5, 1.0, self._obs())

  def close(self):
    self.closed = True


def test_convert_spec_demotes_float64_and_keeps_bounds():
  spec = convert_spec(FakeArraySpec((2,), np.float64, "p"))
  assert isinstance(spec, array_spec.ArraySpec)
  assert spec.dtype == np.float32 and spec.shape == (2,)

  bspec = convert_spec(FakeBoundedSpec((1,), np.float64, -2.0, 3.0))
  assert isinstance(bspec, array_spec.BoundedArraySpec)
  assert bspec.dtype == np.float32
  assert float(bspec.minimum) == -2.0 and float(bspec.maximum) == 3.0

  ispec = convert_spec(FakeArraySpec((), np.int32))
  assert ispec.dtype == np.int32


def test_convert_time_step_restart_none_reward():
  t = convert_time_step(DmTimeStep(0, None, None, np.zeros(2, np.float64)))
  assert int(t.step_type) == ts.StepType.FIRST
  assert float(t.reward) == 0.0 and float(t.discount) == 1.0
  assert t.observation.dtype == np.float32


def test_dm_env_wrapper_episode_and_specs():
  env = DmEnvWrapper(FakeDmEnv(episode_len=2))
  obs_spec = env.observation_spec()
  assert set(obs_spec.keys()) == {"position", "velocity"}
  assert obs_spec["position"].dtype == np.float32

  first = env.reset()
  assert first.is_first()
  mid = env.step(np.zeros((2,), np.float32))   # float32 in, cast inside
  assert int(mid.step_type) == ts.StepType.MID
  assert float(mid.reward) == 0.5
  last = env.step(np.zeros((2,), np.float32))
  assert last.is_last() and float(last.discount) == 0.0

  # Auto-reset protocol: stepping after LAST restarts.
  again = env.step(np.zeros((2,), np.float32))
  assert again.is_first()
  env.close()
  assert env._env.closed


def test_dm_env_wrapper_passes_validate():
  env_utils.validate_py_environment(DmEnvWrapper(FakeDmEnv()), episodes=2)


def test_wrap_dm_env_flatten_and_extra_wrappers():
  from agents_tpu.environments import wrappers

  env = suites.wrap_dm_env(FakeDmEnv(), flatten_observations=True)
  flat = env.reset().observation
  assert flat.shape == (5,)

  env2 = suites.wrap_dm_env(
      FakeDmEnv(), env_wrappers=(lambda e: wrappers.TimeLimit(e, 2),))
  env2.reset()
  env2.step(np.zeros((2,), np.float32))
  limited = env2.step(np.zeros((2,), np.float32))
  assert limited.is_last()


def test_suite_loaders_gate_on_backend():
  if not suites.is_dm_control_available():
    with pytest.raises(ImportError):
      suites.load_dm_control("cartpole", "swingup")
  else:
    env = suites.load_dm_control("cartpole", "swingup")
    env_utils.validate_py_environment(env, episodes=1)
  if not suites.is_bsuite_available():
    with pytest.raises(ImportError):
      suites.load_bsuite("deep_sea/0")
  else:
    env = suites.load_bsuite("deep_sea/0")
    env_utils.validate_py_environment(env, episodes=1)
