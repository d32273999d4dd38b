"""QtOpt: Q-learning with a CEM action optimizer (continuous actions).

Analogue of ``tf_agents/agents/qtopt/qtopt_agent.py:78``: TD targets use
CEM-argmax over the target critic instead of a discrete max.
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from agents_tpu.agents.agent import Agent
from agents_tpu.policies.cem_policy import CEMPolicy
from agents_tpu.policies.wrappers import EpsilonGreedyPolicy, GaussianPolicy
from agents_tpu.trajectories import trajectory as tj
from agents_tpu.utils import common
from agents_tpu.utils.common import LossInfo


@struct.dataclass
class QtOptAgentState:
  q_params: Any
  target_q_params: Any
  opt_state: Any
  train_step: jax.Array


class QtOptAgent(Agent):

  def __init__(self, time_step_spec, action_spec, q_network, optimizer,
               exploration_noise_std: float = 0.1,
               cem_num_samples: int = 32, cem_num_elites: int = 4,
               cem_num_iterations: int = 3,
               td_errors_loss_fn: Callable = common.element_wise_huber_loss,
               gamma: float = 1.0, reward_scale_factor: float = 1.0,
               target_update_tau: float = 1.0,
               target_update_period: int = 1,
               gradient_clipping: Optional[float] = None):
    self.time_step_spec = time_step_spec
    self.action_spec = action_spec
    self.q_network = q_network
    self.optimizer = optimizer
    self.td_errors_loss_fn = td_errors_loss_fn
    self.gamma = gamma
    self.reward_scale_factor = reward_scale_factor
    self.target_update_tau = target_update_tau
    self.target_update_period = target_update_period
    self.gradient_clipping = gradient_clipping
    self.train_sequence_length = 2

    self.policy = CEMPolicy(time_step_spec, action_spec, q_network,
                            num_samples=cem_num_samples,
                            num_elites=cem_num_elites,
                            num_iterations=cem_num_iterations)
    self.collect_policy = GaussianPolicy(self.policy,
                                         scale=exploration_noise_std)

  def init(self, key) -> QtOptAgentState:
    q_params = self.q_network.init_params(key)
    return QtOptAgentState(
        q_params=q_params,
        target_q_params=jax.tree_util.tree_map(jnp.copy, q_params),
        opt_state=self.optimizer.init(q_params),
        train_step=jnp.zeros((), jnp.int32))

  def policy_params(self, agent_state):
    return agent_state.q_params

  def _loss(self, q_params, agent_state, experience, key, weights=None):
    transition = tj.to_transition(experience)
    squeeze = lambda x: jax.tree_util.tree_map(lambda t: t[:, 0], x)
    time_steps = squeeze(transition.time_step)
    actions = squeeze(transition.action_step.action)
    next_time_steps = squeeze(transition.next_time_step)

    _, next_q = self.policy.optimize(
        agent_state.target_q_params, next_time_steps, key)
    rewards = self.reward_scale_factor * next_time_steps.reward
    discounts = self.gamma * next_time_steps.discount
    td_targets = jax.lax.stop_gradient(rewards + discounts * next_q)
    q, _ = self.q_network.apply(
        q_params, (time_steps.observation, actions), time_steps.step_type,
        ())
    per_example = self.td_errors_loss_fn(td_targets, q)
    valid_mask = (~time_steps.is_last()).astype(jnp.float32)
    return common.aggregate_losses(
        per_example_loss=per_example * valid_mask, sample_weight=weights)

  def train(self, agent_state: QtOptAgentState, experience, weights=None,
            key: Optional[jax.Array] = None) -> Tuple[QtOptAgentState,
                                                      LossInfo]:
    if key is None:
      key = jax.random.fold_in(jax.random.key(53), agent_state.train_step)
    loss, grads = jax.value_and_grad(self._loss)(
        agent_state.q_params, agent_state, experience, key, weights)
    if self.gradient_clipping is not None:
      grads = common.clip_gradient_norms(grads, self.gradient_clipping)
    updates, opt_state = self.optimizer.update(
        grads, agent_state.opt_state, agent_state.q_params)
    q_params = optax.apply_updates(agent_state.q_params, updates)
    train_step = agent_state.train_step + 1
    target = common.periodic_soft_update(
        train_step, self.target_update_period, q_params,
        agent_state.target_q_params, self.target_update_tau)
    return QtOptAgentState(
        q_params=q_params, target_q_params=target, opt_state=opt_state,
        train_step=train_step), LossInfo(loss, ())
