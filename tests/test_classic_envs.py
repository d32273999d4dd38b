"""Pure-JAX classic-control envs: spec compliance, batched lockstep
stepping, and step-for-step dynamics parity with gymnasium's reference
implementations (the backends the reference reaches via suite_gym.load,
tf_agents/environments/suite_gym.py:45)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from agents_tpu.environments.classic import (
    Acrobot,
    CartPole,
    ContinuousMountainCar,
    MountainCar,
    Pendulum,
)
from agents_tpu.environments.jax_environment import BatchedJaxEnv
from agents_tpu.trajectories import time_step as ts

gym = pytest.importorskip("gymnasium")


def _rollout_jax(env, actions, key):
  state, step = env.reset(key)
  obs, rewards, discounts = [np.asarray(step.observation)], [], []
  for a in actions:
    state, step = env.step(state, jnp.asarray(a), jax.random.key(0))
    obs.append(np.asarray(step.observation))
    rewards.append(float(step.reward))
    discounts.append(float(step.discount))
    if int(step.step_type) == int(ts.StepType.LAST):
      break
  return obs, rewards, discounts


def _rollout_gym(gym_env, start_state, actions):
  gym_env.reset(seed=0)
  gym_env.unwrapped.state = start_state
  obs, rewards, terms = [], [], []
  for a in actions:
    o, r, term, trunc, _ = gym_env.step(a)
    obs.append(np.asarray(o))
    rewards.append(float(r))
    terms.append(bool(term))
    if term or trunc:
      break
  return obs, rewards, terms


@pytest.mark.parametrize("seed", [0, 7])
def test_mountain_car_matches_gymnasium(seed):
  env = MountainCar()
  state, first = env.reset(jax.random.key(seed))
  start = np.asarray(state.physics, np.float64)
  rng = np.random.RandomState(seed)
  actions = rng.randint(0, 3, size=60).tolist()

  jobs, jrew, jdisc = _rollout_jax(env, actions, jax.random.key(seed))
  genv = gym.make("MountainCar-v0")
  gobs, grew, gterm = _rollout_gym(genv, start, actions)

  for jo, go in zip(jobs[1:], gobs):
    np.testing.assert_allclose(jo, go, atol=1e-5)
  assert jrew[:len(grew)] == grew


@pytest.mark.parametrize("seed", [1, 5])
def test_continuous_mountain_car_matches_gymnasium(seed):
  env = ContinuousMountainCar()
  state, _ = env.reset(jax.random.key(seed))
  start = np.asarray(state.physics, np.float64)
  rng = np.random.RandomState(seed)
  actions = [np.asarray([a], np.float32)
             for a in rng.uniform(-1, 1, size=60)]

  jobs, jrew, _ = _rollout_jax(env, actions, jax.random.key(seed))
  genv = gym.make("MountainCarContinuous-v0")
  gobs, grew, _ = _rollout_gym(genv, start, actions)

  for jo, go in zip(jobs[1:], gobs):
    np.testing.assert_allclose(jo, go, atol=1e-5)
  np.testing.assert_allclose(jrew[:len(grew)], grew, atol=1e-5)


@pytest.mark.parametrize("seed", [0, 3])
def test_acrobot_matches_gymnasium(seed):
  env = Acrobot()
  state, _ = env.reset(jax.random.key(seed))
  start = np.asarray(state.physics, np.float64)
  rng = np.random.RandomState(seed)
  actions = rng.randint(0, 3, size=80).tolist()

  jobs, jrew, _ = _rollout_jax(env, actions, jax.random.key(seed))
  genv = gym.make("Acrobot-v1")
  gobs, grew, _ = _rollout_gym(genv, start, actions)

  # float32 RK4 vs float64 RK4: tolerances loose but tight enough to
  # catch any dynamics mistake (wrong sign flips trajectories entirely).
  for jo, go in zip(jobs[1:], gobs):
    np.testing.assert_allclose(jo, go, rtol=2e-3, atol=2e-3)
  assert jrew[:len(grew)] == grew


def test_mountain_car_termination_semantics():
  """Reaching the goal emits LAST/discount 0; timeout emits LAST/discount 1."""
  env = MountainCar(max_episode_steps=5)
  state, step = env.reset(jax.random.key(0))
  for _ in range(5):
    state, step = env.step(state, jnp.asarray(1, jnp.int32),
                           jax.random.key(0))
  assert int(step.step_type) == int(ts.StepType.LAST)
  assert float(step.discount) == 1.0  # truncation, not termination

  # Drive to the goal: start near the top with positive velocity.
  env2 = MountainCar()
  state, _ = env2.reset(jax.random.key(0))
  state = state.replace(physics=jnp.asarray([0.49, 0.07], jnp.float32))
  state, step = env2.step(state, jnp.asarray(2, jnp.int32),
                          jax.random.key(0))
  assert int(step.step_type) == int(ts.StepType.LAST)
  assert float(step.discount) == 0.0


@pytest.mark.parametrize("env_ctor", [
    MountainCar,
    lambda: ContinuousMountainCar(max_episode_steps=100),
    Acrobot, CartPole, Pendulum])
def test_batched_lockstep_autoreset(env_ctor):
  env = BatchedJaxEnv(env_ctor(), batch_size=4)
  asp = env.action_spec()
  state, step = env.reset(jax.random.key(0))
  assert step.observation.shape[0] == 4

  @jax.jit
  def roll(state, step, key):
    def body(carry, k):
      state, step = carry
      if asp.dtype == np.int32:
        action = jnp.zeros((4,) + asp.shape, jnp.int32)
      else:
        action = jnp.zeros((4,) + asp.shape, jnp.float32)
      state, step = env.step(state, step, action, k)
      return (state, step), step.step_type
    (state, step), types = jax.lax.scan(
        body, (state, step), jax.random.split(key, 600))
    return types

  types = roll(state, step, jax.random.key(1))
  # Every episode boundary must be followed by a FIRST (auto-reset).
  types = np.asarray(types)
  last_rows, last_cols = np.where(types == int(ts.StepType.LAST))
  for r, c in zip(last_rows, last_cols):
    if r + 1 < types.shape[0]:
      assert types[r + 1, c] == int(ts.StepType.FIRST)
  assert (types == int(ts.StepType.LAST)).any()
