"""DDPG.

Analogue of ``tf_agents/agents/ddpg/ddpg_agent.py:50``: deterministic
actor + critic with target copies of both, OU exploration noise on the
collect policy, TD critic loss and -Q(s, pi(s)) actor loss.
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from agents_tpu.agents.agent import Agent
from agents_tpu.policies.actor_policy import DeterministicActorPolicy
from agents_tpu.policies.wrappers import OUNoisePolicy
from agents_tpu.trajectories import trajectory as tj
from agents_tpu.utils import common
from agents_tpu.utils.common import LossInfo


@struct.dataclass
class DdpgAgentState:
  actor_params: Any
  critic_params: Any
  target_actor_params: Any
  target_critic_params: Any
  actor_opt_state: Any
  critic_opt_state: Any
  train_step: jax.Array


@struct.dataclass
class DdpgLossExtra:
  actor_loss: jax.Array
  critic_loss: jax.Array


class DdpgAgent(Agent):

  def __init__(self, time_step_spec, action_spec, actor_network,
               critic_network, actor_optimizer, critic_optimizer,
               ou_stddev: float = 1.0, ou_damping: float = 1.0,
               target_update_tau: float = 1.0,
               target_update_period: int = 1, gamma: float = 1.0,
               reward_scale_factor: float = 1.0,
               td_errors_loss_fn: Callable = common.element_wise_squared_loss,
               dqda_clipping: Optional[float] = None,
               gradient_clipping: Optional[float] = None):
    self.time_step_spec = time_step_spec
    self.action_spec = action_spec
    self.actor_network = actor_network
    self.critic_network = critic_network
    self.actor_optimizer = actor_optimizer
    self.critic_optimizer = critic_optimizer
    self.target_update_tau = target_update_tau
    self.target_update_period = target_update_period
    self.gamma = gamma
    self.reward_scale_factor = reward_scale_factor
    self.td_errors_loss_fn = td_errors_loss_fn
    self.dqda_clipping = dqda_clipping
    self.gradient_clipping = gradient_clipping
    self.train_sequence_length = 2

    self.policy = DeterministicActorPolicy(time_step_spec, action_spec,
                                           actor_network)
    self.collect_policy = OUNoisePolicy(self.policy, ou_stddev=ou_stddev,
                                        ou_damping=ou_damping)

  def init(self, key) -> DdpgAgentState:
    k_a, k_c = jax.random.split(key)
    a = self.actor_network.init_params(k_a)
    c = self.critic_network.init_params(k_c)
    return DdpgAgentState(
        actor_params=a, critic_params=c,
        target_actor_params=jax.tree_util.tree_map(jnp.copy, a),
        target_critic_params=jax.tree_util.tree_map(jnp.copy, c),
        actor_opt_state=self.actor_optimizer.init(a),
        critic_opt_state=self.critic_optimizer.init(c),
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
                  next_time_steps, weights=None):
    """ddpg_agent.py:293-360."""
    target_actions = self._actor(agent_state.target_actor_params,
                                 next_time_steps)
    target_q = self._critic(agent_state.target_critic_params,
                            next_time_steps, target_actions)
    td_targets = jax.lax.stop_gradient(
        self.reward_scale_factor * next_time_steps.reward
        + self.gamma * next_time_steps.discount * target_q)
    q = self._critic(critic_params, time_steps, actions)
    per_example = self.td_errors_loss_fn(td_targets, q)
    valid_mask = (~time_steps.is_last()).astype(jnp.float32)
    return common.aggregate_losses(per_example_loss=per_example * valid_mask,
                                   sample_weight=weights)

  def actor_loss(self, actor_params, agent_state, time_steps, weights=None):
    """ddpg_agent.py:362-420 — with optional dqda clipping implemented as
    a straight-through clip on dQ/da."""
    actions = self._actor(actor_params, time_steps)

    if self.dqda_clipping is not None:
      # Reference clips dq/da before backprop through the actor: compute
      # dqda explicitly, then a surrogate loss sum(dqda * a).
      def q_of_a(a):
        return jnp.sum(self._critic(agent_state.critic_params, time_steps, a))

      dqda = jax.grad(q_of_a)(actions)
      dqda = jnp.clip(dqda, -self.dqda_clipping, self.dqda_clipping)
      per_example = jnp.sum(
          -jax.lax.stop_gradient(dqda) * actions,
          axis=tuple(range(1, actions.ndim)))
    else:
      per_example = -self._critic(agent_state.critic_params, time_steps,
                                  actions)
    return common.aggregate_losses(per_example_loss=per_example,
                                   sample_weight=weights)

  def train(self, agent_state: DdpgAgentState, experience,
            weights=None) -> Tuple[DdpgAgentState, LossInfo]:
    tj.check_adjacent_transition_sequence(experience, "DdpgAgent")
    transition = tj.to_transition(experience)
    squeeze = lambda x: jax.tree_util.tree_map(lambda t: t[:, 0], x)
    time_steps = squeeze(transition.time_step)
    actions = squeeze(transition.action_step.action)
    next_time_steps = squeeze(transition.next_time_step)

    critic_loss, critic_grads = jax.value_and_grad(self.critic_loss)(
        agent_state.critic_params, agent_state, time_steps, actions,
        next_time_steps, weights)
    actor_loss, actor_grads = jax.value_and_grad(self.actor_loss)(
        agent_state.actor_params, agent_state, time_steps, weights)
    if self.gradient_clipping is not None:
      critic_grads = common.clip_gradient_norms(critic_grads,
                                                self.gradient_clipping)
      actor_grads = common.clip_gradient_norms(actor_grads,
                                               self.gradient_clipping)
    cu, critic_opt_state = self.critic_optimizer.update(
        critic_grads, agent_state.critic_opt_state,
        agent_state.critic_params)
    critic_params = optax.apply_updates(agent_state.critic_params, cu)
    au, actor_opt_state = self.actor_optimizer.update(
        actor_grads, agent_state.actor_opt_state, agent_state.actor_params)
    actor_params = optax.apply_updates(agent_state.actor_params, au)

    train_step = agent_state.train_step + 1
    ta = common.periodic_soft_update(
        train_step, self.target_update_period, actor_params,
        agent_state.target_actor_params, self.target_update_tau)
    tc = common.periodic_soft_update(
        train_step, self.target_update_period, critic_params,
        agent_state.target_critic_params, self.target_update_tau)

    new_state = DdpgAgentState(
        actor_params=actor_params, critic_params=critic_params,
        target_actor_params=ta, target_critic_params=tc,
        actor_opt_state=actor_opt_state, critic_opt_state=critic_opt_state,
        train_step=train_step)
    return new_state, LossInfo(
        loss=actor_loss + critic_loss,
        extra=DdpgLossExtra(actor_loss=actor_loss, critic_loss=critic_loss))
