"""TD3.

Analogue of ``tf_agents/agents/td3/td3_agent.py:55``: twin critics,
delayed actor updates (`actor_update_period`), and target policy smoothing
noise (clipped Gaussian on target actions).
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from agents_tpu.agents.agent import Agent
from agents_tpu.policies.actor_policy import DeterministicActorPolicy
from agents_tpu.policies.policy import clip_to_spec
from agents_tpu.policies.wrappers import GaussianPolicy
from agents_tpu.trajectories import trajectory as tj
from agents_tpu.utils import common
from agents_tpu.utils.common import LossInfo


@struct.dataclass
class Td3AgentState:
  actor_params: Any
  critic1_params: Any
  critic2_params: Any
  target_actor_params: Any
  target_critic1_params: Any
  target_critic2_params: Any
  actor_opt_state: Any
  critic_opt_state: Any
  train_step: jax.Array


@struct.dataclass
class Td3LossExtra:
  actor_loss: jax.Array
  critic_loss: jax.Array


class Td3Agent(Agent):

  def __init__(self, time_step_spec, action_spec, actor_network,
               critic_network, actor_optimizer, critic_optimizer,
               exploration_noise_std: float = 0.1,
               target_update_tau: float = 1.0,
               target_update_period: int = 1,
               actor_update_period: int = 1,
               gamma: float = 1.0,
               reward_scale_factor: float = 1.0,
               target_policy_noise: float = 0.2,
               target_policy_noise_clip: float = 0.5,
               td_errors_loss_fn: Callable = common.element_wise_squared_loss,
               gradient_clipping: Optional[float] = None):
    self.time_step_spec = time_step_spec
    self.action_spec = action_spec
    self.actor_network = actor_network
    self.critic_network = critic_network
    self.actor_optimizer = actor_optimizer
    self.critic_optimizer = critic_optimizer
    self.target_update_tau = target_update_tau
    self.target_update_period = target_update_period
    self.actor_update_period = actor_update_period
    self.gamma = gamma
    self.reward_scale_factor = reward_scale_factor
    self.target_policy_noise = target_policy_noise
    self.target_policy_noise_clip = target_policy_noise_clip
    self.td_errors_loss_fn = td_errors_loss_fn
    self.gradient_clipping = gradient_clipping
    self.train_sequence_length = 2

    self.policy = DeterministicActorPolicy(time_step_spec, action_spec,
                                           actor_network)
    self.collect_policy = GaussianPolicy(self.policy,
                                         scale=exploration_noise_std)

  def init(self, key) -> Td3AgentState:
    k_a, k_c1, k_c2 = jax.random.split(key, 3)
    a = self.actor_network.init_params(k_a)
    c1 = self.critic_network.init_params(k_c1)
    c2 = self.critic_network.init_params(k_c2)
    return Td3AgentState(
        actor_params=a, critic1_params=c1, critic2_params=c2,
        target_actor_params=jax.tree_util.tree_map(jnp.copy, a),
        target_critic1_params=jax.tree_util.tree_map(jnp.copy, c1),
        target_critic2_params=jax.tree_util.tree_map(jnp.copy, c2),
        actor_opt_state=self.actor_optimizer.init(a),
        critic_opt_state=self.critic_optimizer.init((c1, c2)),
        train_step=jnp.zeros((), jnp.int32))

  def policy_params(self, agent_state):
    return agent_state.actor_params

  def _actor(self, params, time_steps):
    a, _ = self.actor_network.apply(
        params, time_steps.observation, time_steps.step_type, ())
    return a

  def _critic(self, params, time_steps, actions):
    q, _ = self.critic_network.apply(
        params, (time_steps.observation, actions), time_steps.step_type, ())
    return q

  def critic_loss(self, critic_params, agent_state, time_steps, actions,
                  next_time_steps, key, weights=None):
    """td3_agent.py:330-410: target actions get clipped smoothing noise."""
    c1, c2 = critic_params
    target_actions = self._actor(agent_state.target_actor_params,
                                 next_time_steps)
    noise = jnp.clip(
        self.target_policy_noise * jax.random.normal(
            key, jnp.shape(target_actions), target_actions.dtype),
        -self.target_policy_noise_clip, self.target_policy_noise_clip)
    target_actions = clip_to_spec(target_actions + noise, self.action_spec)
    tq1 = self._q_target(agent_state.target_critic1_params, next_time_steps,
                         target_actions)
    tq2 = self._q_target(agent_state.target_critic2_params, next_time_steps,
                         target_actions)
    target_q = jnp.minimum(tq1, tq2)
    td_targets = jax.lax.stop_gradient(
        self.reward_scale_factor * next_time_steps.reward
        + self.gamma * next_time_steps.discount * target_q)
    per_example = (self.td_errors_loss_fn(td_targets,
                                          self._critic(c1, time_steps, actions))
                   + self.td_errors_loss_fn(
                       td_targets, self._critic(c2, time_steps, actions)))
    valid_mask = (~time_steps.is_last()).astype(jnp.float32)
    return common.aggregate_losses(per_example_loss=per_example * valid_mask,
                                   sample_weight=weights)

  def _q_target(self, params, time_steps, actions):
    return self._critic(params, time_steps, actions)

  def actor_loss(self, actor_params, agent_state, time_steps, weights=None):
    actions = self._actor(actor_params, time_steps)
    per_example = -self._critic(agent_state.critic1_params, time_steps,
                                actions)
    return common.aggregate_losses(per_example_loss=per_example,
                                   sample_weight=weights)

  def train(self, agent_state: Td3AgentState, experience, weights=None,
            key: Optional[jax.Array] = None) -> Tuple[Td3AgentState, LossInfo]:
    if key is None:
      key = jax.random.fold_in(jax.random.key(23), agent_state.train_step)
    tj.check_adjacent_transition_sequence(experience, "Td3Agent")
    transition = tj.to_transition(experience)
    squeeze = lambda x: jax.tree_util.tree_map(lambda t: t[:, 0], x)
    time_steps = squeeze(transition.time_step)
    actions = squeeze(transition.action_step.action)
    next_time_steps = squeeze(transition.next_time_step)

    critic_params = (agent_state.critic1_params, agent_state.critic2_params)
    critic_loss, critic_grads = jax.value_and_grad(self.critic_loss)(
        critic_params, agent_state, time_steps, actions, next_time_steps,
        key, weights)
    actor_loss, actor_grads = jax.value_and_grad(self.actor_loss)(
        agent_state.actor_params, agent_state, time_steps, weights)
    if self.gradient_clipping is not None:
      critic_grads = common.clip_gradient_norms(critic_grads,
                                                self.gradient_clipping)
      actor_grads = common.clip_gradient_norms(actor_grads,
                                               self.gradient_clipping)
    cu, critic_opt_state = self.critic_optimizer.update(
        critic_grads, agent_state.critic_opt_state, critic_params)
    c1, c2 = optax.apply_updates(critic_params, cu)

    train_step = agent_state.train_step + 1

    # Delayed actor update (td3_agent.py:300-320): apply actor gradients
    # only every `actor_update_period` steps.
    au, actor_opt_state_new = self.actor_optimizer.update(
        actor_grads, agent_state.actor_opt_state, agent_state.actor_params)
    actor_params_new = optax.apply_updates(agent_state.actor_params, au)
    do_actor = (train_step % self.actor_update_period) == 0
    actor_params = jax.tree_util.tree_map(
        lambda n, o: jnp.where(do_actor, n, o), actor_params_new,
        agent_state.actor_params)
    actor_opt_state = jax.tree_util.tree_map(
        lambda n, o: jnp.where(do_actor, n, o), actor_opt_state_new,
        agent_state.actor_opt_state)

    ta = common.periodic_soft_update(
        train_step, self.target_update_period, actor_params,
        agent_state.target_actor_params, self.target_update_tau)
    tc1 = common.periodic_soft_update(
        train_step, self.target_update_period, c1,
        agent_state.target_critic1_params, self.target_update_tau)
    tc2 = common.periodic_soft_update(
        train_step, self.target_update_period, c2,
        agent_state.target_critic2_params, self.target_update_tau)

    new_state = Td3AgentState(
        actor_params=actor_params, critic1_params=c1, critic2_params=c2,
        target_actor_params=ta, target_critic1_params=tc1,
        target_critic2_params=tc2, actor_opt_state=actor_opt_state,
        critic_opt_state=critic_opt_state, train_step=train_step)
    return new_state, LossInfo(
        loss=actor_loss + critic_loss,
        extra=Td3LossExtra(actor_loss=actor_loss, critic_loss=critic_loss))
