"""JaxEpisodeDriver: jitted run-until-N-episodes with per-row masking.

Reference semantics: ``tf_agents/drivers/dynamic_episode_driver.py:45``
(episode-counting tf.while_loop). Exactness here is stronger: the
reference can overshoot by up to batch_size-1 episodes in the final
iteration; the per-row quota masking counts exactly N.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import struct

from agents_tpu.drivers import JaxEpisodeDriver
from agents_tpu.environments.jax_environment import (BatchedJaxEnv,
                                                     JaxEnvironment)
from agents_tpu.eval import metric_utils
from agents_tpu.metrics import jax_metrics
from agents_tpu.policies import RandomPolicy
from agents_tpu.specs import array_spec
from agents_tpu.trajectories import time_step as ts

HORIZON = 5


@struct.dataclass
class _CountState:
  t: jax.Array


class FixedHorizonEnv(JaxEnvironment):
  """Reward 1.0 per step; episode ends after HORIZON steps."""

  def observation_spec(self):
    return array_spec.ArraySpec((1,), np.float32, "obs")

  def action_spec(self):
    return array_spec.BoundedArraySpec((), np.int32, 0, 1, "action")

  def reset(self, key):
    del key
    state = _CountState(t=jnp.zeros((), jnp.int32))
    return state, ts.restart(jnp.zeros((1,), jnp.float32))

  def step(self, state, action, key):
    del action, key
    t = state.t + 1
    done = t >= HORIZON
    return _CountState(t=t), ts.TimeStep(
        step_type=jnp.where(done, ts.StepType.LAST,
                            ts.StepType.MID).astype(jnp.int32),
        reward=jnp.ones((), jnp.float32),
        discount=jnp.where(done, 0.0, 1.0).astype(jnp.float32),
        observation=t.astype(jnp.float32)[None])


def _run(num_episodes, batch_size=4, max_steps=200):
  env = BatchedJaxEnv(FixedHorizonEnv(), batch_size=batch_size)
  policy = RandomPolicy(env.time_step_spec(), env.action_spec())
  metrics = jax_metrics.standard_collect_metrics(buffer_size=64)
  driver = JaxEpisodeDriver(env, policy,
                            observers=[m.update for m in metrics])

  @jax.jit
  def go(key):
    k_init, k_run = jax.random.split(key)
    dstate = driver.init(k_init)
    obs = tuple(m.init(batch_size) for m in metrics)
    _, obs, steps, completed = driver.run((), dstate, obs, k_run,
                                          num_episodes, max_steps)
    return obs, steps, completed

  obs, steps, completed = go(jax.random.key(0))
  results = {m.name: np.asarray(m.result(s)) for m, s in zip(metrics, obs)}
  results["_episodes_completed"] = int(completed)
  return results, int(steps)


def test_exact_episode_count():
  # 6 episodes over 4 rows: quotas [2, 2, 1, 1].
  results, steps = _run(num_episodes=6)
  assert results["NumberOfEpisodes"] == 6
  assert results["EnvironmentSteps"] == 6 * HORIZON
  np.testing.assert_allclose(results["AverageReturn"], HORIZON)
  np.testing.assert_allclose(results["AverageEpisodeLength"], HORIZON)
  # Rows 0,1 run 2 full episodes: LAST of episode 2 lands at lockstep
  # step 2*HORIZON + 1 (one boundary frame between the episodes).
  assert steps == 2 * HORIZON + 1


def test_fewer_episodes_than_rows():
  results, steps = _run(num_episodes=2, batch_size=4)
  assert results["NumberOfEpisodes"] == 2
  assert results["EnvironmentSteps"] == 2 * HORIZON
  assert steps == HORIZON


def test_max_steps_bounds_loop():
  results, steps = _run(num_episodes=100, batch_size=2, max_steps=7)
  assert steps == 7
  # Only episodes completed within the budget are counted: each row
  # finishes exactly one episode (at step 5) within 7 lockstep steps.
  assert results["NumberOfEpisodes"] == 2
  # The driver reports the shortfall instead of hiding it.
  assert results["_episodes_completed"] == 2


def test_quota_filled_reported():
  results, _ = _run(num_episodes=6)
  assert results["_episodes_completed"] == 6


def test_fused_loop_evaluate():
  import optax

  from agents_tpu import networks
  from agents_tpu.agents.dqn import DqnAgent
  from agents_tpu.environments.classic.cartpole import CartPole
  from agents_tpu.replay_buffers import UniformReplay
  from agents_tpu.train import FusedTrainLoop
  from agents_tpu.trajectories import trajectory as tj
  from agents_tpu.utils import common

  env = BatchedJaxEnv(CartPole(), batch_size=4)
  tss, asp = env.time_step_spec(), env.action_spec()
  qnet = networks.make_q_network(tss.observation, asp,
                                 fc_layer_params=(16,))
  agent = DqnAgent(tss, asp, qnet, optax.adam(1e-3),
                   td_errors_loss_fn=common.element_wise_squared_loss)
  replay = UniformReplay(tj.trajectory_spec(tss, asp), batch_size=4,
                         max_length=64)
  loop = FusedTrainLoop(env, agent, replay, sample_batch_size=8)
  state = jax.jit(lambda k: loop.init(k, initial_collect_steps=8))(
      jax.random.key(0))
  out = jax.jit(
      lambda s, k: loop.evaluate(s, k, num_episodes=6, max_steps=600))(
          state, jax.random.key(1))
  out = {k: np.asarray(v) for k, v in out.items()}
  assert out["NumberOfEpisodes"] == 6
  assert out["AverageReturn"] > 0
  assert out["AverageEpisodeLength"] > 0


def test_evaluate_jax_env_episodes_helper():
  env = BatchedJaxEnv(FixedHorizonEnv(), batch_size=3)
  policy = RandomPolicy(env.time_step_spec(), env.action_spec())
  out = metric_utils.evaluate_jax_env_episodes(
      env, policy, (), jax.random.key(1), num_episodes=5, max_steps=100)
  assert out["NumberOfEpisodes"] == 5
  np.testing.assert_allclose(out["AverageReturn"], HORIZON)
  assert out["_steps"] <= 2 * (HORIZON + 1)
