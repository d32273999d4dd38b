"""Interop adapters: PyEnvironment->dm_env, device-env wrappers, and
batched-observer unbatching (reference py_to_dm_wrapper.py,
tf_wrappers.py, utils/batched_observer_unbatching.py)."""
import jax
import jax.numpy as jnp
import numpy as np

from agents_tpu.environments.classic.cartpole import CartPole
from agents_tpu.environments.dm_env_wrapper import PyToDmWrapper
from agents_tpu.environments.jax_environment import BatchedJaxEnv
from agents_tpu.environments.jax_wrappers import (JaxEnvironmentWrapper,
                                                 OneHotActionJaxWrapper)
from agents_tpu.environments.test_envs import CountingPyEnv
from agents_tpu.trajectories import trajectory as tj
from agents_tpu.utils.observers import BatchedObserverUnbatching


def test_py_to_dm_wrapper_protocol():
  env = PyToDmWrapper(CountingPyEnv(steps_per_episode=3))
  first = env.reset()
  # FIRST carries reward=0.0/discount=1.0 exactly as the reference's
  # py_to_dm_wrapper._convert_timestep does (:29-43).
  assert first.first()
  assert float(first.reward) == 0.0 and float(first.discount) == 1.0
  steps = [env.step(0) for _ in range(3)]
  assert steps[-1].last()
  assert all(s.mid() for s in steps[:-1])
  # rewards/discounts materialize as arrays after FIRST
  assert float(steps[0].reward) == steps[0].reward
  # specs pass through (duck-typed when dm_env absent)
  ospec = env.observation_spec()
  assert tuple(np.shape(np.zeros(ospec.shape))) == tuple(ospec.shape)


def test_py_to_dm_wrapper_rejects_batched_env():
  import pytest
  from agents_tpu.environments.batched_py_environment import (
      BatchedPyEnvironment,)
  batched = BatchedPyEnvironment(
      [CountingPyEnv(steps_per_episode=3) for _ in range(2)])
  with pytest.raises(ValueError, match="unbatched"):
    PyToDmWrapper(batched)


def test_one_hot_action_jax_wrapper():
  env = OneHotActionJaxWrapper(CartPole())
  spec = env.action_spec()
  assert spec.shape == (2,) and spec.dtype == np.float32
  benv = BatchedJaxEnv(env, batch_size=4)
  state, ts0 = benv.reset(jax.random.key(0))
  onehot = jnp.tile(jnp.asarray([[0.0, 1.0]]), (4, 1))

  @jax.jit
  def take(state, ts0, a):
    return benv.step(state, ts0, a, jax.random.key(1))

  state, ts1 = take(state, ts0, onehot)
  assert ts1.observation.shape == (4, 4)
  # argmax([0,1]) == action 1 == push right: identical to stepping the
  # raw env with action 1.
  raw = BatchedJaxEnv(CartPole(), batch_size=4)
  rs, rts0 = raw.reset(jax.random.key(0))
  rs, rts1 = jax.jit(
      lambda s, t, a: raw.step(s, t, a, jax.random.key(1)))(
          rs, rts0, jnp.ones((4,), jnp.int32))
  np.testing.assert_allclose(np.asarray(ts1.observation),
                             np.asarray(rts1.observation))


def test_wrapper_base_delegates():
  w = JaxEnvironmentWrapper(CartPole())
  assert w.action_spec() == CartPole().action_spec()
  assert w.wrapped_env.__class__ is CartPole


def test_batched_observer_unbatching():
  seen = []

  def make_observer():
    rows = []
    seen.append(rows)
    return rows.append

  obs = BatchedObserverUnbatching(make_observer, batch_size=3)
  traj = tj.Trajectory(
      step_type=jnp.zeros((3,), jnp.int32),
      observation=jnp.arange(6.0).reshape(3, 2),
      action=jnp.arange(3, dtype=jnp.int32),
      policy_info=(),
      next_step_type=jnp.ones((3,), jnp.int32),
      reward=jnp.asarray([1.0, 2.0, 3.0]),
      discount=jnp.ones((3,)))
  obs(traj)
  obs(traj)
  assert len(seen) == 3
  for i, rows in enumerate(seen):
    assert len(rows) == 2
    assert float(rows[0].reward) == i + 1.0
    np.testing.assert_array_equal(np.asarray(rows[0].observation),
                                  [2.0 * i, 2.0 * i + 1])
