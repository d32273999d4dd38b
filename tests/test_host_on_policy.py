"""Host-env PPO loop test (gymnasium CartPole, CPU)."""
import jax
import numpy as np
import optax

from agents_tpu import networks
from agents_tpu.environments import suite_gym
from agents_tpu.environments.batched_py_environment import (
    BatchedPyEnvironment,)
from agents_tpu.agents.ppo import PPOAgent
from agents_tpu.metrics import py_metrics
from agents_tpu.train import HostOnPolicyTrainLoop


def test_host_ppo_iteration():
  env = BatchedPyEnvironment(
      [suite_gym.load("CartPole-v1") for _ in range(4)])
  tss, asp = env.time_step_spec(), env.action_spec()
  agent = PPOAgent(
      tss, asp, optax.adam(3e-4),
      networks.make_actor_distribution_network(tss.observation, asp,
                                               fc_layer_params=(16,)),
      networks.make_value_network(tss.observation, fc_layer_params=(16,)),
      num_epochs=2, num_minibatches=2)
  loop = HostOnPolicyTrainLoop(env, agent, rollout_length=16,
                               py_metrics=[py_metrics.EnvironmentSteps()])
  agent_state, time_step = loop.init(0)
  key = jax.random.key(1)
  agent_state, time_step, key, info = loop.run_iteration(
      agent_state, time_step, key)
  assert np.isfinite(float(info.loss))
  agent_state, time_step, key, info = loop.run_iteration(
      agent_state, time_step, key)
  assert loop.metric_results()["EnvironmentSteps"] >= 100
