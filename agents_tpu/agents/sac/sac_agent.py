"""Soft Actor-Critic.

Analogue of ``tf_agents/agents/sac/sac_agent.py:61``:
  - twin critics with min() target (:604)
  - entropy temperature `log_alpha` trained via `alpha_loss` (:696)
  - `critic_loss` (:559): targets r + gamma*d*(min Q'(s',a') - alpha log pi')
  - `actor_loss` (:645): alpha*log_pi - min Q(s, a~pi)
  - squashed-Gaussian actor (tanh_normal_projection_network.py:143)
  - target critics with periodic polyak updates

One fused train step updates critics, actor, and alpha from the same batch
(matching the reference's single `_train` pass).
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from agents_tpu.agents.agent import Agent
from agents_tpu.policies.actor_policy import ActorPolicy
from agents_tpu.policies.wrappers import GreedyPolicy
from agents_tpu.specs import array_spec
from agents_tpu.trajectories import trajectory as tj
from agents_tpu.utils import common
from agents_tpu.utils.common import LossInfo


@struct.dataclass
class SacAgentState:
  actor_params: Any
  critic1_params: Any
  critic2_params: Any
  target_critic1_params: Any
  target_critic2_params: Any
  log_alpha: jax.Array
  actor_opt_state: Any
  critic_opt_state: Any
  alpha_opt_state: Any
  train_step: jax.Array


@struct.dataclass
class SacLossExtra:
  critic_loss: jax.Array
  actor_loss: jax.Array
  alpha_loss: jax.Array


class SacAgent(Agent):

  def __init__(self, time_step_spec, action_spec, critic_network,
               actor_network, actor_optimizer, critic_optimizer,
               alpha_optimizer, target_update_tau: float = 0.005,
               target_update_period: int = 1, gamma: float = 0.99,
               reward_scale_factor: float = 1.0,
               target_entropy: Optional[float] = None,
               td_errors_loss_fn: Callable = common.element_wise_squared_loss,
               initial_log_alpha: float = 0.0,
               critic_loss_weight: float = 0.5,
               gradient_clipping: Optional[float] = None):
    self.time_step_spec = time_step_spec
    self.action_spec = action_spec
    self.critic_network = critic_network
    self.actor_network = actor_network
    self.actor_optimizer = actor_optimizer
    self.critic_optimizer = critic_optimizer
    self.alpha_optimizer = alpha_optimizer
    self.target_update_tau = target_update_tau
    self.target_update_period = target_update_period
    self.gamma = gamma
    self.reward_scale_factor = reward_scale_factor
    self.td_errors_loss_fn = td_errors_loss_fn
    self.initial_log_alpha = initial_log_alpha
    # Reference default 0.5 (sac_agent.py:74). With this agent's three
    # SEPARATE Adam optimizers the constant is scale-invariant for plain
    # SAC; it matters in CqlSacAgent where the critic optimizer sees the
    # weighted SUM of the TD term and the CQL penalty.
    self.critic_loss_weight = critic_loss_weight
    self.gradient_clipping = gradient_clipping
    self.train_sequence_length = 2

    if target_entropy is None:
      # Reference default: -sum(action dims) (sac_agent.py:_get_default_target_entropy)
      dims = sum(
          int(np.prod(s.shape)) for s in jax.tree_util.tree_leaves(
              action_spec,
              is_leaf=lambda x: isinstance(x, array_spec.ArraySpec)))
      target_entropy = -float(dims)
    self.target_entropy = target_entropy

    # Collection samples from the squashed Gaussian; eval takes its mode
    # (reference: collect=SAC policy, eval=greedy wrapper).
    self.collect_policy = ActorPolicy(time_step_spec, action_spec,
                                      actor_network)
    self.policy = GreedyPolicy(self.collect_policy)

  # -- lifecycle -----------------------------------------------------------
  def init(self, key) -> SacAgentState:
    k_actor, k_c1, k_c2 = jax.random.split(key, 3)
    actor_params = self.actor_network.init_params(k_actor)
    c1 = self.critic_network.init_params(k_c1)
    c2 = self.critic_network.init_params(k_c2)
    log_alpha = jnp.asarray(self.initial_log_alpha, jnp.float32)
    return SacAgentState(
        actor_params=actor_params,
        critic1_params=c1,
        critic2_params=c2,
        target_critic1_params=jax.tree_util.tree_map(jnp.copy, c1),
        target_critic2_params=jax.tree_util.tree_map(jnp.copy, c2),
        log_alpha=log_alpha,
        actor_opt_state=self.actor_optimizer.init(actor_params),
        critic_opt_state=self.critic_optimizer.init((c1, c2)),
        alpha_opt_state=self.alpha_optimizer.init(log_alpha),
        train_step=jnp.zeros((), jnp.int32),
    )

  def policy_params(self, agent_state):
    return agent_state.actor_params

  # -- pieces --------------------------------------------------------------
  def _sample_actions(self, actor_params, time_steps, key):
    dist, _ = self.actor_network.apply(
        actor_params, time_steps.observation, time_steps.step_type, ())
    leaves, treedef = jax.tree_util.tree_flatten(
        dist, is_leaf=lambda d: hasattr(d, "sample_and_log_prob"))
    keys = jax.random.split(key, len(leaves))
    pairs = [d.sample_and_log_prob(k) for d, k in zip(leaves, keys)]
    actions = jax.tree_util.tree_unflatten(treedef, [p[0] for p in pairs])
    log_pi = pairs[0][1]
    for p in pairs[1:]:
      log_pi = log_pi + p[1]
    return actions, log_pi

  def _q(self, critic_params, time_steps, actions):
    q, _ = self.critic_network.apply(
        critic_params, (time_steps.observation, actions),
        time_steps.step_type, ())
    return q

  # -- losses (reference sac_agent.py:559,645,696) ---------------------------
  def critic_loss(self, critic_params, agent_state, time_steps, actions,
                  next_time_steps, key, weights=None):
    c1, c2 = critic_params
    next_actions, next_log_pi = self._sample_actions(
        agent_state.actor_params, next_time_steps, key)
    target_q1 = self._q(agent_state.target_critic1_params, next_time_steps,
                        next_actions)
    target_q2 = self._q(agent_state.target_critic2_params, next_time_steps,
                        next_actions)
    alpha = jnp.exp(agent_state.log_alpha)
    target_value = jnp.minimum(target_q1, target_q2) - alpha * next_log_pi
    td_targets = jax.lax.stop_gradient(
        self.reward_scale_factor * next_time_steps.reward
        + self.gamma * next_time_steps.discount * target_value)
    q1 = self._q(c1, time_steps, actions)
    q2 = self._q(c2, time_steps, actions)
    per_example = (self.td_errors_loss_fn(td_targets, q1)
                   + self.td_errors_loss_fn(td_targets, q2))
    valid_mask = (~time_steps.is_last()).astype(jnp.float32)
    return common.aggregate_losses(per_example_loss=per_example * valid_mask,
                                   sample_weight=weights)

  def actor_and_alpha_loss(self, actor_params, log_alpha, agent_state,
                           time_steps, key, weights=None):
    actions, log_pi = self._sample_actions(actor_params, time_steps, key)
    q1 = self._q(agent_state.critic1_params, time_steps, actions)
    q2 = self._q(agent_state.critic2_params, time_steps, actions)
    q = jnp.minimum(q1, q2)
    alpha = jnp.exp(log_alpha)
    actor_per_example = jax.lax.stop_gradient(alpha) * log_pi - q
    alpha_per_example = -log_alpha * jax.lax.stop_gradient(
        log_pi + self.target_entropy)
    actor_loss = common.aggregate_losses(
        per_example_loss=actor_per_example, sample_weight=weights)
    alpha_loss = common.aggregate_losses(
        per_example_loss=alpha_per_example, sample_weight=weights)
    return actor_loss + alpha_loss, (actor_loss, alpha_loss)

  # -- train ---------------------------------------------------------------
  def train(self, agent_state: SacAgentState, experience, weights=None,
            key: Optional[jax.Array] = None) -> Tuple[SacAgentState, LossInfo]:
    """experience: Trajectory [B, 2]. RNG for action sampling is derived
    from the train step (deterministic given state) unless `key` given."""
    if key is None:
      key = jax.random.fold_in(
          jax.random.key(17), agent_state.train_step)
    k_critic, k_actor = jax.random.split(key)

    tj.check_adjacent_transition_sequence(experience, "SacAgent")
    transition = tj.to_transition(experience)
    time_steps = jax.tree_util.tree_map(
        lambda x: x[:, 0], transition.time_step)
    actions = jax.tree_util.tree_map(
        lambda x: x[:, 0], transition.action_step.action)
    next_time_steps = jax.tree_util.tree_map(
        lambda x: x[:, 0], transition.next_time_step)

    # Critics.
    critic_params = (agent_state.critic1_params, agent_state.critic2_params)
    critic_loss, critic_grads = jax.value_and_grad(
        lambda cp: self.critic_loss_weight * self.critic_loss(
            cp, agent_state, time_steps, actions, next_time_steps,
            k_critic, weights))(critic_params)
    if self.gradient_clipping is not None:
      critic_grads = common.clip_gradient_norms(critic_grads,
                                                self.gradient_clipping)
    critic_updates, critic_opt_state = self.critic_optimizer.update(
        critic_grads, agent_state.critic_opt_state, critic_params)
    c1, c2 = optax.apply_updates(critic_params, critic_updates)

    # Actor + alpha (gradients through both args at once).
    def _aa_loss(params):
      actor_params, log_alpha = params
      return self.actor_and_alpha_loss(actor_params, log_alpha, agent_state,
                                       time_steps, k_actor, weights)

    (total_aa, (actor_loss, alpha_loss)), (actor_grads, alpha_grad) = (
        jax.value_and_grad(_aa_loss, has_aux=True)(
            (agent_state.actor_params, agent_state.log_alpha)))
    if self.gradient_clipping is not None:
      actor_grads = common.clip_gradient_norms(actor_grads,
                                               self.gradient_clipping)
      # The reference clips ALL trained variable groups, including the
      # entropy-temperature parameter (sac_agent.py _apply_gradients) —
      # an unclipped alpha step early in training can overflow
      # exp(log_alpha) and destabilize both critic targets and the
      # actor loss despite clipping being requested.
      alpha_grad = common.clip_gradient_norms(alpha_grad,
                                              self.gradient_clipping)
    actor_updates, actor_opt_state = self.actor_optimizer.update(
        actor_grads, agent_state.actor_opt_state, agent_state.actor_params)
    actor_params = optax.apply_updates(agent_state.actor_params,
                                       actor_updates)
    alpha_updates, alpha_opt_state = self.alpha_optimizer.update(
        alpha_grad, agent_state.alpha_opt_state, agent_state.log_alpha)
    log_alpha = optax.apply_updates(agent_state.log_alpha, alpha_updates)

    train_step = agent_state.train_step + 1
    t1 = common.periodic_soft_update(
        train_step, self.target_update_period, c1,
        agent_state.target_critic1_params, self.target_update_tau)
    t2 = common.periodic_soft_update(
        train_step, self.target_update_period, c2,
        agent_state.target_critic2_params, self.target_update_tau)

    new_state = SacAgentState(
        actor_params=actor_params, critic1_params=c1, critic2_params=c2,
        target_critic1_params=t1, target_critic2_params=t2,
        log_alpha=log_alpha, actor_opt_state=actor_opt_state,
        critic_opt_state=critic_opt_state, alpha_opt_state=alpha_opt_state,
        train_step=train_step)
    total = critic_loss + actor_loss + alpha_loss
    return new_state, LossInfo(
        loss=total,
        extra=SacLossExtra(critic_loss=critic_loss, actor_loss=actor_loss,
                           alpha_loss=alpha_loss))
