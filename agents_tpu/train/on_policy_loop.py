"""Fused on-policy training iteration (PPO / REINFORCE).

The analogue of the reference's PPOLearner dataflow
(``tf_agents/train/ppo_learner.py:270-310``): where the reference drains
episodes from a Reverb FIFO table, updates normalizers, then runs
epochs x minibatches through tf.data, here one jitted iteration collects a
[B, T] rollout with the scan driver and hands it straight to
`agent.train` (which fuses normalizer updates, GAE, and the whole
epoch/minibatch loop) — rollout never leaves HBM.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from agents_tpu.drivers.jax_driver import DriverState, JaxDriver
from agents_tpu.utils.common import LossInfo


@struct.dataclass
class OnPolicyLoopState:
  driver_state: DriverState
  agent_state: Any
  metric_states: Any
  key: jax.Array


class OnPolicyTrainLoop:

  def __init__(self, env, agent, metrics=(), rollout_length: int = 128):
    import inspect
    self.env = env
    self.agent = agent
    self.metrics = tuple(metrics)
    self.rollout_length = rollout_length
    self.driver = JaxDriver(env, agent.collect_policy,
                            observers=[m.update for m in self.metrics],
                            return_trajectories=True)
    self._train_takes_key = "key" in inspect.signature(
        agent.train).parameters

  def init(self, key) -> OnPolicyLoopState:
    k_agent, k_driver, k_loop = jax.random.split(key, 3)
    return OnPolicyLoopState(
        driver_state=self.driver.init(k_driver),
        agent_state=self.agent.init(k_agent),
        metric_states=tuple(
            m.init(self.env.batch_size) for m in self.metrics),
        key=k_loop)

  def iteration(self, state: OnPolicyLoopState,
                _=None) -> Tuple[OnPolicyLoopState, LossInfo]:
    key, k_collect, k_train = jax.random.split(state.key, 3)
    params = self.agent.collect_policy_params(state.agent_state)
    driver_state, metric_states, frames = self.driver.run(
        params, state.driver_state, state.metric_states, k_collect,
        self.rollout_length)
    # [T, B, ...] -> [B, T, ...]
    experience = jax.tree_util.tree_map(
        lambda x: jnp.swapaxes(x, 0, 1), frames)
    if self._train_takes_key:
      agent_state, loss_info = self.agent.train(
          state.agent_state, experience, key=k_train)
    else:
      agent_state, loss_info = self.agent.train(state.agent_state,
                                                experience)
    return OnPolicyLoopState(
        driver_state=driver_state, agent_state=agent_state,
        metric_states=metric_states, key=key), loss_info

  def run(self, state: OnPolicyLoopState, num_iterations: int):
    def body(s, _):
      s, loss = self.iteration(s)
      return s, loss.loss

    return jax.lax.scan(body, state, None, length=num_iterations)

  def results(self, state: OnPolicyLoopState):
    return {
        m.name: m.result(ms)
        for m, ms in zip(self.metrics, state.metric_states)
    }
