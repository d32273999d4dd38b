"""Measure the reference TF-Agents classic in-graph DQN CartPole
train_eval throughput on this host CPU — the `vs_baseline` denominator
for bench.py.

Faithful to /root/reference/tf_agents/agents/dqn/examples/v2/train_eval.py
(batch 64, replay 100k, fc (100,), adam 1e-3, eps 0.1, tau 0.05/period 5,
collect 1 env step + 1 train step per iteration, tf.function-wrapped
driver.run/train), minus interval-gated checkpoints/summaries/eval (kept
off => measured number is an upper bound on reference throughput).

tfp/gin/gym are import stubs (benchmark/stubs) — the DQN path only uses
tfp.Categorical/SeedStream, implemented for real in the stub.
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "stubs"))
sys.path.insert(0, "/root/reference")

import numpy as np
import tensorflow as tf

from tf_agents.agents.dqn import dqn_agent
from tf_agents.drivers import dynamic_step_driver
from tf_agents.environments import py_environment, tf_py_environment
from tf_agents.networks import sequential
from tf_agents.policies import random_tf_policy
from tf_agents.replay_buffers import tf_uniform_replay_buffer
from tf_agents.specs import array_spec
from tf_agents.trajectories import time_step as ts
from tf_agents.utils import common

import gymnasium


class CartPolePyEnv(py_environment.PyEnvironment):
  """gymnasium CartPole-v1 behind the reference PyEnvironment protocol
  (suite_gym.load equivalent; gym-classic API shim inline)."""

  def __init__(self):
    super().__init__()
    self._env = gymnasium.make("CartPole-v1")
    self._obs_spec = array_spec.BoundedArraySpec(
        (4,), np.float32, minimum=-3.4e38, maximum=3.4e38, name="observation")
    self._action_spec = array_spec.BoundedArraySpec(
        (), np.int64, minimum=0, maximum=1, name="action")
    self._done = True

  def observation_spec(self):
    return self._obs_spec

  def action_spec(self):
    return self._action_spec

  def _reset(self):
    obs, _ = self._env.reset()
    self._done = False
    return ts.restart(np.asarray(obs, np.float32))

  def _step(self, action):
    if self._done:
      return self._reset()
    obs, reward, terminated, truncated, _ = self._env.step(int(action))
    obs = np.asarray(obs, np.float32)
    self._done = terminated or truncated
    if terminated:
      return ts.termination(obs, reward)
    if truncated:
      return ts.truncation(obs, reward)
    return ts.transition(obs, reward)


def main():
  tf_env = tf_py_environment.TFPyEnvironment(CartPolePyEnv())

  num_actions = 2
  # create_feedforward_network(train_eval.py:63-74): dense(100) + logits
  dense = tf.keras.layers.Dense(
      100, activation=tf.keras.activations.relu,
      kernel_initializer=tf.keras.initializers.VarianceScaling(
          scale=2.0, mode="fan_in", distribution="truncated_normal"))
  q_values = tf.keras.layers.Dense(
      num_actions, activation=None,
      kernel_initializer=tf.keras.initializers.RandomUniform(-0.03, 0.03),
      bias_initializer=tf.keras.initializers.Constant(-0.2))
  q_net = sequential.Sequential([dense, q_values])

  global_step = tf.compat.v1.train.get_or_create_global_step()
  agent = dqn_agent.DqnAgent(
      tf_env.time_step_spec(), tf_env.action_spec(), q_network=q_net,
      epsilon_greedy=0.1, n_step_update=1,
      target_update_tau=0.05, target_update_period=5,
      optimizer=tf.keras.optimizers.Adam(learning_rate=1e-3),
      td_errors_loss_fn=common.element_wise_squared_loss, gamma=0.99,
      train_step_counter=global_step)
  agent.initialize()

  replay_buffer = tf_uniform_replay_buffer.TFUniformReplayBuffer(
      data_spec=agent.collect_data_spec, batch_size=tf_env.batch_size,
      max_length=100_000)

  collect_driver = dynamic_step_driver.DynamicStepDriver(
      tf_env, agent.collect_policy, observers=[replay_buffer.add_batch],
      num_steps=1)
  collect_driver.run = common.function(collect_driver.run)
  agent.train = common.function(agent.train)

  dynamic_step_driver.DynamicStepDriver(
      tf_env,
      random_tf_policy.RandomTFPolicy(tf_env.time_step_spec(),
                                      tf_env.action_spec()),
      observers=[replay_buffer.add_batch], num_steps=1000).run()

  dataset = replay_buffer.as_dataset(
      num_parallel_calls=3, sample_batch_size=64, num_steps=2).prefetch(3)
  iterator = iter(dataset)

  def train_step():
    experience, _ = next(iterator)
    return agent.train(experience)

  train_step = common.function(train_step)

  time_step, policy_state = None, agent.collect_policy.get_initial_state(
      tf_env.batch_size)

  def run_iters(n):
    nonlocal time_step, policy_state
    loss = None
    for _ in range(n):
      time_step, policy_state = collect_driver.run(
          time_step=time_step, policy_state=policy_state)
      loss = train_step()
    return loss

  run_iters(300)  # warmup: trace + compile both functions
  t0 = time.time()
  N = 10000
  loss = run_iters(N)
  dt = time.time() - t0
  print(f"loss={float(loss.loss):.4f}")
  print(f"reference_dqn_cartpole_env_steps_per_s={N/dt:.1f}  "
        f"(N={N}, wall={dt:.1f}s, host CPU)")


if __name__ == "__main__":
  main()
